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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("parse_date_struct"),
      info("parse_date_struct", "multi-format date parse -> struct(error, value)"),
      (exprs: Seq[Expression]) => graft.expr.ParseDateStruct(exprs.head)))
    ext.injectFunction((FunctionIdentifier("float_vec_dot"),
      info("float_vec_dot", "sequential double dot product of two array<float>"),
      (exprs: Seq[Expression]) => graft.expr.FloatVecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("float_vec_norm"),
      info("float_vec_norm", "sequential double L2 norm of array<float>"),
      (exprs: Seq[Expression]) => graft.expr.FloatVecNorm(exprs.head)))
    ext.injectFunction((FunctionIdentifier("sorted_long_intersect_size"),
      info("sorted_long_intersect_size",
        "intersection size of two sorted duplicate-free array<long>"),
      (exprs: Seq[Expression]) =>
        graft.expr.SortedLongIntersectSize(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("text_profile"),
      info("text_profile", "single-pass text stats + language-ID struct"),
      (exprs: Seq[Expression]) => graft.expr.TextProfile(exprs.head)))
  }
}
