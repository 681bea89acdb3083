package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group statistics over an `Array[Float]` embedding column — the
  * building blocks of centroid-based vector workflows (IVF training,
  * cluster drift monitoring, class prototypes for dataset pruning à la
  * SemDeDup/SSL-prototypes).
  *
  * Scale shape: `posexplode` multiplies rows by the dimension (64× here),
  * but the exploded frame is three narrow columns (group, pos, value) and
  * aggregates with map-side partial combine on (group, pos) — one shuffle
  * whose key space is |groups|·dim, independent of corpus size. No
  * collect, no UDF; everything stays in whole-stage codegen.
  */
object VectorStats {

  /** Element-wise FIXED-POINT sum + member count per (group, 1-based
    * position). Each value is quantized once — `floor(v · grid)` in double
    * arithmetic — and aggregated as a long. Integer addition is associative
    * and commutative, so the result is independent of partition layout and
    * merge order: bit-reproducible across runs, partitionings, AND engines
    * (floor of the same IEEE-754 product is the same long everywhere —
    * unlike float→decimal casts, whose last-digit rounding is
    * engine-specific, and unlike double sums, which are merge-order-
    * dependent). This is the reproducible-reduction trick production
    * pipelines use for auditable aggregates at cluster scale; quantization
    * error is bounded by 1/grid per element and is part of the contract.
    *
    * Output: (group, pos, qsum, n, mean) where `mean = qsum / grid / n`
    * — a fixed operation order on deterministic operands, so the double
    * mean is reproducible too. */
  def centroidSums(df: DataFrame, groupCol: String, vecCol: String,
                   grid: Double = 1e6): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("__p", "__v")))
      .select(col(groupCol), (col("__p") + 1).cast("long").as("pos"),
        floor(col("__v").cast("double") * grid).cast("long").as("__q"))
      .groupBy(col(groupCol), col("pos"))
      .agg(sum(col("__q")).as("qsum"), count(lit(1)).as("n"))
      .withColumn("mean",
        col("qsum").cast("double") / grid / col("n").cast("double"))

  /** Per-group mean vector as `Array[Double]`, assembled back into one row
    * per group (the form IVF seeding / prototype lookup consumes). Plain
    * double math — the fast in-engine path; for bit-reproducible output
    * use [[centroidSums]]. */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("centroid"))
}
