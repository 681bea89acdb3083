package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planner: turn a file manifest (one row per data
  * file, with its table-partition and byte size) into a deterministic
  * rewrite plan that packs consecutive files into target-sized output
  * bins. The lakehouse-maintenance twin of the write path in
  * [[Warehouse]]: at 100 TB a streaming or per-trigger batch sink
  * accumulates millions of small files whose per-file open/seek cost
  * dominates scan time, and compaction is what keeps the table readable.
  *
  * Planning runs over METADATA only (the manifest), never the data: one
  * shuffle on the partition key, then a prefix-sum window per table
  * partition — the frame is the file count of one partition, which is
  * exactly the quantity compaction exists to keep bounded. Assignment is
  * start-offset packing: a file whose exclusive running total is `pre`
  * lands in bin `pre div target`. That is single-pass, stable under
  * manifest re-ordering (the order column is part of the contract), and
  * reproducible cross-engine in pure integer arithmetic — no bin-state
  * recursion, no driver loop. Bins overshoot `target` by at most one
  * file (the classic streaming-pack guarantee); files ≥ target get a
  * bin of their own by construction.
  */
object Compaction {

  /** Plan compaction bins for `manifest`. Output: the partition column,
    * file id, size, `bin` (0-based within the partition), and the
    * bin-level rollup every rewrite task needs (`bin_files`,
    * `bin_bytes`) so one frame drives both scheduling and validation.
    * Sizes must be non-negative (a planner input contract, asserted). */
  def planBins(manifest: DataFrame, partCol: String, fileCol: String,
               sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val order = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sized = manifest.select(col(partCol), col(fileCol),
        col(sizeCol).cast("long").as("size"))
      .withColumn("__pre", coalesce(sum(col("size")).over(order), lit(0L)))
      .withColumn("bin", expr(s"__pre div ${targetBytes}L"))
    val byBin = Window.partitionBy(col(partCol), col("bin"))
    sized
      .withColumn("bin_files", count(lit(1)).over(byBin))
      .withColumn("bin_bytes", sum(col("size")).over(byBin))
      .drop("__pre")
  }

  /** The plan's executive summary, one row per (partition, bin): how many
    * input files collapse into each output file and the bytes it will
    * hold — `needs_rewrite` marks bins that actually merge (>1 input).
    * Derivable from [[planBins]] by the caller too; provided because the
    * maintenance scheduler wants the rollup WITHOUT the per-file rows. */
  def planSummary(manifest: DataFrame, partCol: String, fileCol: String,
                  sizeCol: String, targetBytes: Long): DataFrame =
    planBins(manifest, partCol, fileCol, sizeCol, targetBytes)
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("bin_files"), sum(col("size")).as("bin_bytes"))
      .withColumn("needs_rewrite", col("bin_files") > 1)
}
