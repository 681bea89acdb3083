package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Native K-Minimum-Values (theta) sketch: the k smallest DISTINCT 64-bit
  * hashes of the input values, in unsigned order. The one summary in the
  * family (MG / HLL / CMS / KLL) that supports SET OPERATIONS — two
  * sketches estimate their union, intersection, difference, and Jaccard
  * similarity without rescanning rows, which neither exact distincts
  * (overlap unknown) nor HLL registers (union only) can do at 100 TB.
  *
  * Like HLL and unlike Misra–Gries/KLL, the k smallest distinct hashes are
  * a PURE FUNCTION OF THE INPUT SET — order- and partitioning-independent —
  * so any merge tree yields a bit-identical sketch and the harness can gate
  * merged-vs-direct equality and stream ≡ batch equality exactly.
  *
  * Estimator (Beyer et al., "On Synopses for Distinct-Value Estimation
  * under Multiset Operations", SIGMOD'07; the Apache DataSketches theta
  * sketch is the same construction): with hashes mapped to U(0,1), a full
  * sketch's k-th smallest value θ makes the k−1 values strictly below θ a
  * uniform density-θ sample of the distinct domain, so D ≈ (k−1)/θ; a
  * non-full sketch holds EVERY distinct hash and is exact. Set estimates
  * restrict both sketches to the pooled threshold θ* = min(θ_A, θ_B) and
  * scale the candidate counts by 1/θ*. RSE ≈ 1/sqrt(k−2).
  *
  * Hash is Spark's own XXH64 on the long value (same seed as the HLL
  * sketch), so sketches are reproducible across JVMs and sessions and the
  * stored artifacts stay mergeable forever.
  */
final class KmvBuffer(val k: Int) {
  /** Distinct hashes in ascending UNSIGNED order, at most k of them. */
  val hashes = new java.util.TreeSet[java.lang.Long](
    (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.compareUnsigned(a, b))
  var n: Long = 0L // exact non-null input row count (diagnostics, not est)

  def full: Boolean = hashes.size >= k

  def addValue(value: Long): Unit = { n += 1; addHash(XXH64.hashLong(value, HllBuffer.Seed)) }

  def addHash(h: Long): Unit =
    if (hashes.size < k) { hashes.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, hashes.last) < 0) {
      if (hashes.add(h)) { hashes.remove(hashes.last); () }
    }

  /** Set union fold — the only merge KMV needs: pool the hash sets, keep
    * the k smallest. Idempotent, associative, commutative. */
  def mergeIn(other: KmvBuffer): Unit = {
    require(other.k == k,
      s"cannot merge KMV sketches of different capacity ($k vs ${other.k})")
    n += other.n
    val it = other.hashes.iterator()
    while (it.hasNext) addHash(it.next())
  }

  /** Inclusion threshold θ in hash space: the k-th smallest hash when
    * full, else "everything" (None — the sketch is the exact set). */
  def thetaHash: Option[Long] = if (full) Some(hashes.last.longValue) else None

  def estimate: Double =
    if (!full) hashes.size.toDouble
    else (k - 1).toDouble / KmvBuffer.unit(hashes.last)

  def serialize(): Array[Byte] = {
    val m = hashes.size
    val out = java.nio.ByteBuffer.allocate(4 + 8 + 4 + 8 * m)
    out.putInt(k); out.putLong(n); out.putInt(m)
    val it = hashes.iterator()
    while (it.hasNext) out.putLong(it.next())
    out.array()
  }
}

object KmvBuffer {
  /** Unsigned 64-bit hash → (0,1]: (h + 1) / 2^64 computed in two halves
    * so the unsigned top bit cannot go negative. The +1 keeps θ strictly
    * positive for h = 0. */
  def unit(h: Long): Double =
    ((h >>> 1).toDouble * 2.0 + (h & 1L).toDouble + 1.0) *
      java.lang.Math.scalb(1.0, -64)

  def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(in.getInt)
    buf.n = in.getLong
    var m = in.getInt
    while (m > 0) { buf.hashes.add(in.getLong); m -= 1 }
    buf
  }

  /** Relative standard error of a capacity-k sketch: ~1/sqrt(k-2). */
  def rse(k: Int): Double = 1.0 / math.sqrt((k - 2).toDouble)

  /** Candidate hashes strictly below θ* (all of them when θ* is None). */
  private[expr] def below(b: KmvBuffer, theta: Option[Long]): java.util.SortedSet[java.lang.Long] =
    theta match {
      case None => b.hashes
      case Some(t) => b.hashes.headSet(t) // exclusive upper bound
    }
}

/** Sketch-building aggregate over a BIGINT column → serialized sketch
  * (BINARY). Partial aggregation applies: map tasks fold rows into one
  * ≤k-entry hash set each and only sketches cross the shuffle. The binary
  * output is the REUSABLE artifact: store one per segment, then answer any
  * segment-combination union/intersection/difference later without
  * rescanning rows. */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 8 && k <= (1 << 20), s"k must be in [8, 2^20], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_sketch needs a BIGINT value column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_sketch"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.addValue(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = buffer.serialize()
  override def serialize(buffer: KmvBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Sketch-union aggregate over a BINARY sketch column → merged sketch:
  * the rollup level that unions segment sketches into region sketches into
  * a global sketch in sketch-count time, never touching rows. */
case class KmvMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_merge needs a BINARY sketch column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_merge"
  override def dataType: DataType = BinaryType

  /** Capacity unknown until the first sketch arrives — a k=0 marker stands
    * in for "empty" and adopts the first input's capacity. (Cannot collide
    * with a real sketch: KmvSketchAgg requires k ≥ 8.) */
  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(0)

  private def fold(buffer: KmvBuffer, incoming: KmvBuffer): KmvBuffer =
    if (incoming.k == 0) buffer
    else if (buffer.k == 0) incoming
    else { buffer.mergeIn(incoming); buffer }

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v == null) buffer
    else fold(buffer, KmvBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer =
    fold(buffer, other)

  override def eval(buffer: KmvBuffer): Any = buffer.serialize()
  override def serialize(buffer: KmvBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar sketch → struct(n, est): exact input count carried by the sketch
  * and the distinct estimate (rounded). Evaluated once per SKETCH row, so
  * CodegenFallback costs nothing — the per-row hot path is the aggregates. */
case class KmvEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_estimate needs a BINARY sketch column, got ${child.dataType.sql}")
  override def prettyName: String = "graft_kmv_estimate"
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val buf = KmvBuffer.deserialize(input.asInstanceOf[Array[Byte]])
    InternalRow(buf.n, math.rint(buf.estimate).toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

/** The set-operation payoff: two sketches → struct(union_est,
  * intersect_est, diff_ab_est, jaccard_ppm), all LONG (estimates rounded,
  * Jaccard in parts-per-million) so downstream comparisons stay integer.
  *
  * Both sketches restrict to the pooled threshold θ* = min(θ_A, θ_B);
  * strictly-below-θ* hashes are a uniform density-θ* sample of the
  * combined distinct domain, so |candidates| / θ* estimates each region.
  * When NEITHER sketch is full, θ* = 1 and every figure is EXACT —
  * including the Jaccard — because both sketches hold their complete
  * distinct hash sets. Evaluated once per sketch PAIR (segment-pair
  * cardinality), hence CodegenFallback. */
case class KmvSetOp(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_set_op needs two BINARY sketch columns, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def prettyName: String = "graft_kmv_set_op"
  override def dataType: DataType = StructType(Seq(
    StructField("union_est", LongType, nullable = false),
    StructField("intersect_est", LongType, nullable = false),
    StructField("diff_ab_est", LongType, nullable = false),
    StructField("jaccard_ppm", LongType, nullable = false)))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ba = KmvBuffer.deserialize(a.asInstanceOf[Array[Byte]])
    val bb = KmvBuffer.deserialize(b.asInstanceOf[Array[Byte]])
    require(ba.k == bb.k || ba.k == 0 || bb.k == 0,
      s"cannot combine KMV sketches of different capacity (${ba.k} vs ${bb.k})")
    // θ* = unsigned-min of the full sketches' thresholds; None if neither
    // is full (both sets complete → all counts exact)
    val theta = (ba.thetaHash, bb.thetaHash) match {
      case (Some(x), Some(y)) =>
        Some(if (java.lang.Long.compareUnsigned(x, y) <= 0) x else y)
      case (x, y) => x.orElse(y)
    }
    val candA = KmvBuffer.below(ba, theta)
    val candB = KmvBuffer.below(bb, theta)
    var inter = 0L
    val it = candA.iterator()
    while (it.hasNext) if (candB.contains(it.next())) inter += 1
    val unionBelow = candA.size.toLong + candB.size.toLong - inter
    val scale = theta.map(t => 1.0 / KmvBuffer.unit(t)).getOrElse(1.0)
    val jacPpm =
      if (unionBelow == 0) 0L
      else math.rint(inter.toDouble / unionBelow.toDouble * 1e6).toLong
    InternalRow(
      math.rint(unionBelow * scale).toLong,
      math.rint(inter * scale).toLong,
      math.rint((candA.size - inter) * scale).toLong,
      jacPpm)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSetOp =
    copy(left = newLeft, right = newRight)
}
