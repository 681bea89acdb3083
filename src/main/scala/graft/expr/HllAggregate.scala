package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Native HyperLogLog state: 2^lgK one-byte registers, nothing else — the
  * sketch an exact `COUNT(DISTINCT)` can never be at 100 TB, where the
  * distinct key set itself is too large to shuffle. Register-wise `max` is
  * associative, commutative, and idempotent, so — unlike the Misra–Gries
  * summary, whose estimates are arrival-order-dependent — an HLL sketch is
  * a PURE FUNCTION OF THE INPUT SET: any partitioning, any merge tree, any
  * duplication of inputs yields bit-identical registers. The harness gates
  * exactly that (merged segment sketches ≡ one global aggregate) plus the
  * standard error bound against exact counts.
  *
  * Flajolet et al.'s HLL estimator with the small-range linear-counting
  * switch; no large-range correction (64-bit hash space — collisions are
  * negligible below ~2^57). Hash is Spark's own XXH64 on the long value, so
  * the sketch is reproducible across JVMs and sessions.
  */
final class HllBuffer(val lgK: Int) {
  val m: Int = 1 << lgK
  val registers: Array[Byte] = new Array[Byte](m)
  var n: Long = 0L // exact non-null input count (self-diagnostics, not est)

  def add(value: Long): Unit = {
    n += 1
    val h = XXH64.hashLong(value, HllBuffer.Seed)
    val idx = (h >>> (64 - lgK)).toInt
    // rank = leading zeros of the remaining 64-lgK bits, +1; the |1 bit at
    // the end of the shifted word caps the rank at 64-lgK+1 without a branch
    val w = (h << lgK) | (1L << (lgK - 1))
    val rank = (java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
    if (rank > registers(idx)) registers(idx) = rank
  }

  /** Register-wise max — the only merge HLL needs. */
  def mergeIn(other: HllBuffer): Unit = {
    require(other.lgK == lgK,
      s"cannot merge HLL sketches of different precision ($lgK vs ${other.lgK})")
    n += other.n
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
  }

  def estimate: Double = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = registers(i)
      invSum += java.lang.Math.scalb(1.0, -r) // 2^-r exactly
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha =
      if (m == 16) 0.673
      else if (m == 32) 0.697
      else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m.toDouble * m.toDouble / invSum
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }

  def serialize(): Array[Byte] = {
    val out = new Array[Byte](1 + 8 + m)
    out(0) = lgK.toByte
    var i = 0
    while (i < 8) { out(1 + i) = (n >>> (56 - 8 * i)).toByte; i += 1 }
    System.arraycopy(registers, 0, out, 9, m)
    out
  }
}

object HllBuffer {
  /** Fixed hash seed: sketches must agree across sessions to be mergeable
    * artifacts (a warehouse stores them next to the data they summarize). */
  val Seed: Long = 42L

  def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    var n = 0L
    var i = 0
    while (i < 8) { n = (n << 8) | (bytes(1 + i) & 0xffL); i += 1 }
    buf.n = n
    System.arraycopy(bytes, 9, buf.registers, 0, buf.m)
    buf
  }

  /** Relative standard error of an lgK sketch: 1.04 / sqrt(2^lgK). */
  def rse(lgK: Int): Double = 1.04 / math.sqrt((1 << lgK).toDouble)
}

/** Sketch-building aggregate over a BIGINT column → serialized sketch
  * (BINARY). Partial aggregation applies: map tasks fold rows into one
  * m-byte register array each and only sketches cross the shuffle. The
  * binary output is the REUSABLE artifact — store it per segment, then
  * roll up any segment combination with [[HllMergeAgg]] without rescanning
  * rows (exact per-segment distincts cannot combine; overlap is unknown).
  */
case class HllSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {

  require(lgK >= 4 && lgK <= 16, s"lgK must be in [4,16], got $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll_sketch needs a BIGINT value column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_sketch"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(lgK)

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: HllBuffer): Any = buffer.serialize()
  override def serialize(buffer: HllBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): HllBuffer =
    HllBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Sketch-union aggregate over a BINARY sketch column → merged sketch.
  * This is the second aggregation level that makes the sketches a rollup
  * lattice: segment sketches union into region sketches union into a
  * global sketch, each step in sketch-count time, never touching rows. */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll_merge needs a BINARY sketch column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_merge"
  override def dataType: DataType = BinaryType

  /** lgK unknown until the first sketch arrives — a 0-length marker buffer
    * stands in for "empty" and adopts the first input's precision. */
  override def createAggregationBuffer(): HllBuffer = new HllBuffer(0)

  private def fold(buffer: HllBuffer, incoming: HllBuffer): HllBuffer =
    if (incoming.lgK == 0) buffer
    else if (buffer.lgK == 0) incoming
    else { buffer.mergeIn(incoming); buffer }

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v == null) buffer
    else fold(buffer, HllBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer =
    fold(buffer, other)

  override def eval(buffer: HllBuffer): Any = buffer.serialize()
  override def serialize(buffer: HllBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): HllBuffer =
    HllBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar sketch → struct(n, est): the exact input count carried by the
  * sketch and the HLL cardinality estimate. Evaluated once per SKETCH row
  * (segment-count cardinality), so CodegenFallback costs nothing — the
  * per-row hot path is inside the aggregates above. */
case class HllEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll_estimate needs a BINARY sketch column, got ${child.dataType.sql}")
  override def prettyName: String = "graft_hll_estimate"
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val buf = HllBuffer.deserialize(input.asInstanceOf[Array[Byte]])
    val est = if (buf.lgK == 0) 0L else math.rint(buf.estimate).toLong
    InternalRow(buf.n, est)
  }

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}
