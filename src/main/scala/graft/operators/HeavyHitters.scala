package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.expr.MisraGriesAgg

/** Heavy-hitters (frequent items) over a key column in bounded memory —
  * the hot-key detector a 100-TB pipeline runs BEFORE deciding to salt a
  * join or cap a group (the count-min sketch in [[Skew]] answers "how hot
  * is this key?"; this answers "which keys are hot?" without the full
  * `groupBy(key).count` shuffle: only `capacity`-sized mergeable summaries
  * cross the wire, map-side partials included). The same aggregate runs as
  * a streaming global aggregate — the buffer is the streaming state
  * ([[graft.streaming.StreamingIngest.runStreamHotKeysBounded]]).
  *
  * Guarantees (Misra–Gries, checked in-engine by the `_verify` queries):
  * `est <= true <= est + sub` per emitted item, every item with true
  * frequency > n/(capacity+1) is emitted, and `sub*(capacity+1) <= n`.
  */
object HeavyHitters {

  /** The raw aggregate column: struct(n, sub, items[(item, est)]). */
  def summary(itemCol: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(itemCol), capacity)
        .toAggregateExpression())

  /** Explode a one-row summary frame (column `mg`) into
    * (item, est, n, sub) rows, most frequent first. */
  def itemsFromSummary(summaryDf: DataFrame): DataFrame =
    summaryDf
      .select(col("mg.n").as("n"), col("mg.sub").as("sub"),
        explode(col("mg.items")).as("it"))
      .select(col("it.item").as("item"), col("it.est").as("est"),
        col("n"), col("sub"))

  /** One row per tracked item: (item, est, n, sub), most frequent first. */
  def topItems(df: DataFrame, itemCol: String, capacity: Int): DataFrame =
    itemsFromSummary(
      df.agg(summary(col(itemCol).cast("long"), capacity).as("mg")))

  /** In-engine violation check of every MG guarantee: `sk` is a summary in
    * (item, est, n, sub) layout — from [[topItems]] or the streaming
    * runner — and `items` the EXACT item stream it summarized (nulls
    * pre-dropped). One exact groupBy — affordable at oracle scale; the
    * sketch exists so the production path never pays this. Empty relation
    * = contract honored. LEFT joins keep phantom sketch items (no exact
    * row) as violations. */
  def violationsAgainst(sk: DataFrame, items: DataFrame,
                        capacity: Int): DataFrame = {
    val exact = items.groupBy(col("item")).agg(count(lit(1)).as("cnt"))

    val perItem = sk.join(exact, Seq("item"), "left")
      .withColumn("why",
        when(col("cnt").isNull, lit("phantom_item"))
          .when(col("est") > col("cnt"), lit("overcount"))
          .when(col("cnt") > col("est") + col("sub"), lit("under_bound")))
      .filter(col("why").isNotNull)
      .select(col("why"), col("item"), col("est"), col("cnt"))

    // a single-row stats frame: n/sub as data, not a driver round-trip
    val stats = sk.groupBy().agg(max(col("n")).as("n"), max(col("sub")).as("sub"),
      count(lit(1)).as("k_emitted"))

    val missing = exact.join(stats)
      .join(sk.select(col("item")), Seq("item"), "left_anti")
      .filter(col("cnt") > col("sub"))
      .select(lit("missing_heavy_item").as("why"), col("item"),
        lit(null).cast("long").as("est"), col("cnt"))

    val global = stats.join(items.groupBy().agg(count(lit(1)).as("true_n")))
      .withColumn("why",
        when(col("n") =!= col("true_n"), lit("bad_stream_length"))
          .when(col("sub") * (capacity + 1) > col("n"), lit("sub_bound_broken")))
      .filter(col("why").isNotNull)
      .select(col("why"), lit(null).cast("long").as("item"),
        col("n").as("est"), col("true_n").as("cnt"))

    perItem.unionAll(missing).unionAll(global)
      .orderBy(col("why"), col("item"))
  }

  /** [[violationsAgainst]] for the batch sketch over `df`'s own column. */
  def violations(df: DataFrame, itemCol: String, capacity: Int): DataFrame = {
    val items = df.filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast("long").as("item"))
    violationsAgainst(topItems(df, itemCol, capacity), items, capacity)
  }

  /** Per-GROUP heavy hitters: one capacity-bounded Misra–Gries summary
    * per group — "which keys are hot WITHIN each segment" (per-tenant hot
    * users, per-event-type hot entities), the grouped dimension the other
    * sketch families already have (HLL rollup, KMV pair overlap, CMS
    * per-segment merge). Exactly one `groupBy(group)` shuffle carrying
    * capacity-sized mergeable state per group, map-side partials included
    * — never the full (group, item) count table.
    *
    * Output: (grp, item, est, n, sub) rows per group, most frequent
    * first; same per-item MG guarantees as [[topItems]], now per group
    * (checked by [[violationsByGroup]]). A group whose summary ends EMPTY
    * (possible when distinct items exceed capacity and the final
    * decrements clear the buffer) still emits one carrier row with a NULL
    * item, so its (n, sub) certificate never silently vanishes —
    * `explode` instead of `explode_outer` here would drop exactly the
    * groups where the sketch degraded most. */
  def topItemsByGroup(df: DataFrame, groupCol: String, itemCol: String,
                      capacity: Int): DataFrame =
    df.filter(col(itemCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("grp"))
      .agg(summary(col(itemCol).cast("long"), capacity).as("mg"))
      .select(col("grp"), col("mg.n").as("n"), col("mg.sub").as("sub"),
        explode_outer(col("mg.items")).as("it"))
      .select(col("grp"), col("it.item").as("item"), col("it.est").as("est"),
        col("n"), col("sub"))

  /** [[violationsAgainst]] lifted to groups: every MG guarantee re-proved
    * per (group, item) against the exact per-group counts — affordable at
    * oracle scale, which is the point of shipping the sketch. Violations
    * only; empty relation = contract honored for every group. */
  def violationsByGroup(df: DataFrame, groupCol: String, itemCol: String,
                        capacity: Int): DataFrame = {
    val items = df.filter(col(itemCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        col(itemCol).cast("long").as("item"))
    val sk = topItemsByGroup(df, groupCol, itemCol, capacity)
    val exact = items.groupBy(col("grp"), col("item"))
      .agg(count(lit(1)).as("cnt"))

    // NULL-item rows are the empty-summary carriers: they exist so the
    // stats frame below still sees the group's (n, sub) — but they are
    // not sketch items, so they must not reach the per-item check (a
    // left join would misread them as phantom_item).
    val perItem = sk.filter(col("item").isNotNull)
      .join(exact, Seq("grp", "item"), "left")
      .withColumn("why",
        when(col("cnt").isNull, lit("phantom_item"))
          .when(col("est") > col("cnt"), lit("overcount"))
          .when(col("cnt") > col("est") + col("sub"), lit("under_bound")))
      .filter(col("why").isNotNull)
      .select(col("why"), col("grp"), col("item"), col("est"), col("cnt"))

    val stats = sk.groupBy(col("grp"))
      .agg(max(col("n")).as("n"), max(col("sub")).as("sub"))

    val missing = exact.join(stats, "grp")
      .join(sk.select(col("grp"), col("item")), Seq("grp", "item"), "left_anti")
      .filter(col("cnt") > col("sub"))
      .select(lit("missing_heavy_item").as("why"), col("grp"), col("item"),
        lit(null).cast("long").as("est"), col("cnt"))

    val global = stats
      .join(items.groupBy(col("grp")).agg(count(lit(1)).as("true_n")), "grp")
      .withColumn("why",
        when(col("n") =!= col("true_n"), lit("bad_stream_length"))
          .when(col("sub") * (capacity + 1) > col("n"), lit("sub_bound_broken")))
      .filter(col("why").isNotNull)
      .select(col("why"), col("grp"), lit(null).cast("long").as("item"),
        col("n").as("est"), col("true_n").as("cnt"))

    perItem.unionAll(missing).unionAll(global)
      .orderBy(col("why"), col("grp"), col("item"))
  }
}
