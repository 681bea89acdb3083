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
  *  - `poly_rolling_hash(s)`        → 64-bit polynomial rolling hash
  *
  * Native mergeable-summary AGGREGATES (TypedImperativeAggregate; shape
  * parameters must be integer literals — they size the buffer at plan time):
  *  - `misra_gries(item, capacity)`      → heavy-hitter summary struct
  *  - `graft_hll_sketch(v, lgK)`         → binary HLL sketch
  *  - `graft_hll_merge(sk)`              → unioned binary HLL sketch
  *  - `graft_hll_estimate(sk)`           → struct(n, est)
  *  - `graft_cms_sketch(v, depth, width)`→ binary Count-Min sketch
  *  - `graft_cms_merge(sk)`              → summed binary CMS sketch
  *  - `graft_cms_estimate(sk, item)`     → estimated count
  *  - `graft_cms_inner(a, b)`            → struct(n_a, n_b, est) join-size estimate
  *  - `graft_kll_sketch(v, k)`           → KLL quantile summary struct(n, err, items)
  *  - `graft_kmv_sketch(v, k)`           → binary K-Minimum-Values (theta) sketch
  *  - `graft_kmv_merge(sk)`              → set-unioned binary KMV sketch
  *  - `graft_kmv_estimate(sk)`           → struct(n, est)
  *  - `graft_kmv_set_op(a, b)`           → struct(union_est, intersect_est, diff_ab_est, jaccard_ppm)
  *  - `graft_bloom_agg(v, bits, hashes)` → binary Bloom filter
  *  - `graft_bloom_contains(bf, item)`   → possibly-present boolean
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

  /** Sketch shape parameters (capacity, lgK, depth, width) must be integer
    * LITERALS — they size the aggregation buffer at plan time. */
  private def litInt(fn: String, arg: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
      // exact, not truncating: 2^32+16 silently becoming width=16 would
      // inflate the error bound ~256000x with no diagnostic
      try Math.toIntExact(v)
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(
          s"$fn: $arg literal $v exceeds Int range") }
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Short, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${other.sql}")
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
    // Native mergeable-summary aggregates (the analyzer wraps a returned
    // AggregateFunction in its AggregateExpression automatically):
    ext.injectFunction((FunctionIdentifier("misra_gries"),
      info("misra_gries", "Misra-Gries heavy-hitter summary struct(n, sub, items)"),
      arity("misra_gries", 2)(exprs => graft.expr.MisraGriesAgg(exprs.head,
        litInt("misra_gries", "capacity", exprs(1))))))
    ext.injectFunction((FunctionIdentifier("graft_hll_sketch"),
      info("graft_hll_sketch", "HyperLogLog sketch of a BIGINT column -> binary"),
      arity("graft_hll_sketch", 2)(exprs => graft.expr.HllSketchAgg(exprs.head,
        litInt("graft_hll_sketch", "lgK", exprs(1))))))
    ext.injectFunction((FunctionIdentifier("graft_hll_merge"),
      info("graft_hll_merge", "union of binary HLL sketches -> binary"),
      arity("graft_hll_merge", 1)(exprs => graft.expr.HllMergeAgg(exprs.head))))
    ext.injectFunction((FunctionIdentifier("graft_hll_estimate"),
      info("graft_hll_estimate", "binary HLL sketch -> struct(n, est)"),
      arity("graft_hll_estimate", 1)(exprs => graft.expr.HllEstimate(exprs.head))))
    ext.injectFunction((FunctionIdentifier("graft_cms_sketch"),
      info("graft_cms_sketch", "Count-Min sketch of a BIGINT column -> binary"),
      arity("graft_cms_sketch", 3)(exprs => graft.expr.CmsSketchAgg(exprs.head,
        litInt("graft_cms_sketch", "depth", exprs(1)),
        litInt("graft_cms_sketch", "width", exprs(2))))))
    ext.injectFunction((FunctionIdentifier("graft_cms_merge"),
      info("graft_cms_merge", "elementwise sum of binary CMS sketches -> binary"),
      arity("graft_cms_merge", 1)(exprs => graft.expr.CmsMergeAgg(exprs.head))))
    ext.injectFunction((FunctionIdentifier("graft_cms_estimate"),
      info("graft_cms_estimate", "(binary CMS sketch, BIGINT item) -> estimated count"),
      arity("graft_cms_estimate", 2)(exprs =>
        graft.expr.CmsEstimate(exprs(0), exprs(1)))))
    ext.injectFunction((FunctionIdentifier("graft_cms_inner"),
      info("graft_cms_inner",
        "two same-shape binary CMS sketches -> struct(n_a, n_b, est) join-size estimate"),
      arity("graft_cms_inner", 2)(exprs =>
        graft.expr.CmsInnerProduct(exprs(0), exprs(1)))))
    ext.injectFunction((FunctionIdentifier("graft_kll_sketch"),
      info("graft_kll_sketch",
        "KLL quantile summary of a BIGINT column -> struct(n, err, items)"),
      arity("graft_kll_sketch", 2)(exprs => graft.expr.KllSketchAgg(exprs.head,
        litInt("graft_kll_sketch", "k", exprs(1))))))
    ext.injectFunction((FunctionIdentifier("graft_kmv_sketch"),
      info("graft_kmv_sketch", "K-Minimum-Values (theta) sketch of a BIGINT column -> binary"),
      arity("graft_kmv_sketch", 2)(exprs => graft.expr.KmvSketchAgg(exprs.head,
        litInt("graft_kmv_sketch", "k", exprs(1))))))
    ext.injectFunction((FunctionIdentifier("graft_kmv_merge"),
      info("graft_kmv_merge", "set union of binary KMV sketches -> binary"),
      arity("graft_kmv_merge", 1)(exprs => graft.expr.KmvMergeAgg(exprs.head))))
    ext.injectFunction((FunctionIdentifier("graft_kmv_estimate"),
      info("graft_kmv_estimate", "binary KMV sketch -> struct(n, est)"),
      arity("graft_kmv_estimate", 1)(exprs => graft.expr.KmvEstimate(exprs.head))))
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg", "Bloom filter of a BIGINT key column -> binary"),
      arity("graft_bloom_agg", 3)(exprs => graft.expr.BloomAgg(exprs.head,
        litInt("graft_bloom_agg", "numBits", exprs(1)),
        litInt("graft_bloom_agg", "numHashes", exprs(2))))))
    ext.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains",
        "(binary Bloom filter, BIGINT item) -> possibly-present boolean"),
      arity("graft_bloom_contains", 2)(exprs =>
        graft.expr.BloomMightContain(exprs(0), exprs(1)))))
    ext.injectFunction((FunctionIdentifier("graft_kmv_set_op"),
      info("graft_kmv_set_op",
        "two binary KMV sketches -> struct(union_est, intersect_est, diff_ab_est, jaccard_ppm)"),
      arity("graft_kmv_set_op", 2)(exprs =>
        graft.expr.KmvSetOp(exprs(0), exprs(1)))))
  }
}
