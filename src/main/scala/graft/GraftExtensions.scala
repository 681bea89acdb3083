package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The library's `SparkSessionExtensions` entry point: registers every
  * custom Catalyst expression as a SQL function so a pure-SQL user gets the
  * whole surface without touching the Scala API.
  *
  * Activate per session:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * or spark-submit `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * Functions injected (all native codegen expressions, no UDF boxing):
  *  - `parse_date_struct(s)`        → struct(error, value) multi-format parse
  *  - `float_vec_dot(a, b)`         → double dot product over array<float>
  *  - `float_vec_norm(v)`           → double L2 norm over array<float>
  *  - `sorted_long_intersect_size(a, b)` → |A∩B| of sorted array<long>
  *  - `text_profile(s)`             → fused text-stats + language-ID struct
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  /** Wrong-arity SQL calls must fail analysis with the expected signature,
    * not an IndexOutOfBoundsException from the builder. */
  private def arity(name: String, n: Int)(build: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("parse_date_struct"),
      info("parse_date_struct", "multi-format date parse -> struct(error, value)"),
      arity("parse_date_struct", 1)(exprs => graft.expr.ParseDateStruct(exprs.head))))
    ext.injectFunction((FunctionIdentifier("float_vec_dot"),
      info("float_vec_dot", "sequential double dot product of two array<float>"),
      arity("float_vec_dot", 2)(exprs => graft.expr.FloatVecDot(exprs(0), exprs(1)))))
    ext.injectFunction((FunctionIdentifier("float_vec_norm"),
      info("float_vec_norm", "sequential double L2 norm of array<float>"),
      arity("float_vec_norm", 1)(exprs => graft.expr.FloatVecNorm(exprs.head))))
    ext.injectFunction((FunctionIdentifier("sorted_long_intersect_size"),
      info("sorted_long_intersect_size",
        "intersection size of two sorted duplicate-free array<long>"),
      arity("sorted_long_intersect_size", 2)(exprs =>
        graft.expr.SortedLongIntersectSize(exprs(0), exprs(1)))))
    ext.injectFunction((FunctionIdentifier("text_profile"),
      info("text_profile", "single-pass text stats + language-ID struct"),
      arity("text_profile", 1)(exprs => graft.expr.TextProfile(exprs.head))))
    ext.injectFunction((FunctionIdentifier("poly_rolling_hash"),
      info("poly_rolling_hash", "64-bit polynomial rolling hash over code points"),
      arity("poly_rolling_hash", 1)(exprs => graft.expr.PolyRollingHash(exprs.head))))
  }
}
