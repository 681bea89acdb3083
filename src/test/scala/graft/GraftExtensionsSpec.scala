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

  test("wrong arity fails analysis with the expected signature, not an index error") {
    val e = intercept[Exception] {
      spark.sql("SELECT float_vec_dot(array(cast(1.0 as float)))").head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("float_vec_dot expects 2 argument(s)")))
  }
}
