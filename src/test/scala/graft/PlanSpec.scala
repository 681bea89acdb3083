package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression guards: these are the plan shapes that make the
  * engine scale (SURVEY.md §4); if one regresses, sf0.1 timings barely move
  * but a 100 TB run would fall over — so they are asserted, not eyeballed. */
class PlanSpec extends SparkSpec {

  private val dir = testDataDir("0.01")
  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.explainString(FormattedMode) + "\n" +
      df.queryExecution.executedPlan.toString
  }

  test("flagship: broadcast dims, map-side window limit, pruned pushed scan") {
    val p = plan("q_view_flagship")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "dimension joins must broadcast, not shuffle")
    assert(p.contains("WindowGroupLimit"),
      "rank<=1 must prune map-side before the shuffle")
    assert(p.contains("PushedFilters: [IsNotNull(o_custkey)]"))
    // column pruning: the orders scan must read exactly the 3 needed columns
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_orderdate:timestamp_ntz>"))
  }

  test("aggregation: partial (map-side) aggregation before one shuffle") {
    val p = plan("q_agg_pricing_summary")
    assert(p.contains("partial_sum"), "map-side combine missing")
    val exchanges = "Exchange".r.findAllIn(p.linesIterator.mkString("\n")).size
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_returnflag:string,l_linestatus:string>"),
      "lineitem scan must prune to the 5 needed columns")
  }

  test("latest-order window: single shuffle, WindowGroupLimit both sides") {
    val p = plan("q_w1_latest_order")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "expect partial + final window group limits")
  }

  test("embedding pairs: broadcast nested loop, codegen'd vector math") {
    val p = plan("q_dedup_embedding")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "one side must broadcast; a shuffled cartesian would be strictly worse")
    assert(p.contains("float_vec_dot"), "native expression missing from plan")
    // the >=threshold cut must run inside the join (pairs never materialize)
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("float_vec_dot")),
      "similarity threshold must be evaluated in the join condition")
  }

  test("join revenue: dims broadcast, fact tables shuffle-joined") {
    val p = plan("q_join_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "customer+nation must broadcast")
  }
}
