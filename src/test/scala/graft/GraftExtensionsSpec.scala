package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL surface: a session configured with
  * `spark.sql.extensions=graft.GraftExtensions` must expose every custom
  * expression to `spark.sql` with the same semantics as the Scala API. */
class GraftExtensionsSpec extends AnyFunSuite {

  // getOrCreate would silently return another suite's session, and the
  // "spark.sql.extensions" STATIC conf is read from the SparkContext (so it
  // can't activate on a context another suite already started) — use the
  // programmatic withExtensions hook on a fresh session over the shared
  // context, then restore the singletons. Never stop the shared context.
  private lazy val spark = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-spec")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }

  test("all injected functions are callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  parse_date_struct('06152022') AS d,
        |  parse_date_struct('13152022').error AS bad_month,
        |  float_vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |                array(cast(3.0 as float), cast(4.0 as float))) AS dot,
        |  float_vec_norm(array(cast(3.0 as float), cast(4.0 as float))) AS nrm,
        |  sorted_long_intersect_size(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS isz,
        |  text_profile('the cat and the dog').n_stopwords AS stops,
        |  text_profile('der hund und die katze ist da').lang AS lang
        |""".stripMargin).head()
    assert(r.getStruct(0).getAs[java.sql.Date]("value").toString == "2022-06-15")
    assert(r.getString(1) == "Invalid month: 13 (must be between 1 and 12)")
    assert(r.getDouble(2) == 11.0)
    assert(r.getDouble(3) == 5.0)
    assert(r.getInt(4) == 2)
    assert(r.getInt(5) == 3)
    assert(r.getString(6) == "de")
  }

  test("native sketch aggregates are callable from SQL") {
    spark.range(0, 10000).selectExpr("id % 250 AS item", "id % 4 AS seg")
      .createOrReplaceTempView("t_sketch_sql")
    // HLL: per-segment sketches unioned ≡ direct global, estimate near 250
    val hll = spark.sql(
      """SELECT graft_hll_estimate(graft_hll_merge(sk)).est AS merged,
        |       graft_hll_estimate(graft_hll_merge(sk)).n AS n
        |FROM (SELECT seg, graft_hll_sketch(item, 12) AS sk
        |      FROM t_sketch_sql GROUP BY seg)""".stripMargin).head()
    assert(hll.getLong(1) == 10000L)
    assert(math.abs(hll.getLong(0) - 250L) <= 13, s"est ${hll.getLong(0)}")
    val direct = spark.sql(
      "SELECT graft_hll_estimate(graft_hll_sketch(item, 12)).est FROM t_sketch_sql")
      .head().getLong(0)
    assert(hll.getLong(0) == direct, "merged must equal direct bit-exactly")
    // CMS: every item occurs 40x; estimates never undercount
    val cms = spark.sql(
      """SELECT min(graft_cms_estimate(sk, probe)) AS lo
        |FROM (SELECT graft_cms_sketch(item, 10, 2048) AS sk FROM t_sketch_sql),
        |     (SELECT DISTINCT item AS probe FROM t_sketch_sql)""".stripMargin)
      .head().getLong(0)
    assert(cms >= 40L, s"undercount: $cms")
    // MG: the summary tracks and n is exact
    val mg = spark.sql(
      "SELECT misra_gries(item, 16).n FROM t_sketch_sql").head().getLong(0)
    assert(mg == 10000L)
    // KLL: n exact, weights conserved (sum = n), summary stays bounded
    val kll = spark.sql(
      """SELECT sk.n, aggregate(sk.items, 0L, (a, it) -> a + it.weight) AS w,
        |       size(sk.items) AS sz
        |FROM (SELECT graft_kll_sketch(item, 64) AS sk FROM t_sketch_sql)"""
        .stripMargin).head()
    assert(kll.getLong(0) == 10000L)
    assert(kll.getLong(1) == 10000L, "total weight must equal n")
    assert(kll.getInt(2) <= 64 * 9, s"summary too large: ${kll.getInt(2)}")
    // KMV: 250 distinct < k=512 → the exact regime, n exact; the two
    // even/odd segments are disjoint item sets → intersection exactly 0,
    // union exactly 250
    val kmv = spark.sql(
      """SELECT graft_kmv_estimate(graft_kmv_merge(sk)).est AS est,
        |       graft_kmv_estimate(graft_kmv_merge(sk)).n AS n
        |FROM (SELECT seg, graft_kmv_sketch(item, 512) AS sk
        |      FROM t_sketch_sql GROUP BY seg)""".stripMargin).head()
    assert(kmv.getLong(0) == 250L && kmv.getLong(1) == 10000L)
    val kmvOp = spark.sql(
      """SELECT graft_kmv_set_op(a.sk, b.sk).union_est AS u,
        |       graft_kmv_set_op(a.sk, b.sk).intersect_est AS i
        |FROM (SELECT graft_kmv_sketch(item, 512) AS sk
        |      FROM t_sketch_sql WHERE item % 2 = 0) a,
        |     (SELECT graft_kmv_sketch(item, 512) AS sk
        |      FROM t_sketch_sql WHERE item % 2 = 1) b""".stripMargin).head()
    assert(kmvOp.getLong(0) == 250L && kmvOp.getLong(1) == 0L)
    // shape params must be literals, not columns
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hll_sketch(item, CAST(item AS INT)) FROM t_sketch_sql").head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("must be an integer literal")))
  }

  test("wrong arity fails analysis with the expected signature, not an index error") {
    val e = intercept[Exception] {
      spark.sql("SELECT float_vec_dot(array(cast(1.0 as float)))").head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("float_vec_dot expects 2 argument(s)")))
  }

  test("non-float array input fails analysis instead of silently reinterpreting bytes") {
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // array<double> literal: getFloat over its ArrayData would read garbage
    val eDot = intercept[Exception] {
      spark.sql("SELECT float_vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head()
    }
    assert(messages(eDot).exists(_.contains("expects array<float> inputs")))
    val eNorm = intercept[Exception] {
      spark.sql("SELECT float_vec_norm(array(1.0d, 2.0d))").head()
    }
    assert(messages(eNorm).exists(_.contains("expects array<float> input")))
  }
}
