package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-memory quantile-sketch state: a KLL-style compactor stack
  * (Karnin, Lang & Liberty, FOCS'16; fixed per-level capacity à la
  * Manku–Rajagopalan–Lindsay) over LONG values. Level ℓ holds at most `k`
  * items, each standing for 2^ℓ original values; a full level sorts,
  * promotes every other item to level ℓ+1, and keeps the odd leftover —
  * so memory is k·⌈log₂(n/k)⌉ items regardless of input size, the reason
  * this works at 100 TB where exact percentiles sort the world.
  *
  * The error ledger is WORST-CASE and self-reported, not probabilistic:
  * one compaction at level ℓ perturbs any value's rank by at most
  * 2^ℓ (half the pairs shift one item of weight 2^ℓ each way), so the
  * buffer adds 2^ℓ to `err` per compaction and sums `err` across merges.
  * The deterministic invariant carried to the verify gate is
  * `|sketchRank(v) − trueRank(v)| ≤ err` for every v — no coin-flip
  * distribution assumptions, so the harness can gate it as a hard bound.
  * (The alternating per-level offset is what the randomized coin would
  * buy in expectation; determinism keeps replays reproducible.)
  *
  * Total weight is conserved exactly: compaction maps 2m items of weight
  * w to m of weight 2w and the leftover stays put, so Σ weights = n
  * always — quantile targets ⌈p·n⌉ are always reachable.
  */
final class KllBuffer(val k: Int) {
  var n: Long = 0L
  var err: Long = 0L
  val levels: ArrayBuffer[ArrayBuffer[Long]] = ArrayBuffer(ArrayBuffer.empty[Long])
  val coins: ArrayBuffer[Boolean] = ArrayBuffer(false)

  private def ensureLevel(l: Int): Unit =
    while (levels.length <= l) { levels += ArrayBuffer.empty[Long]; coins += false }

  def add(v: Long): Unit = {
    n += 1
    levels(0) += v
    if (levels(0).length >= k) compactCascade(0)
  }

  /** Compact level l once; cascade while any level is at capacity. */
  private def compactCascade(start: Int): Unit = {
    var l = start
    while (l < levels.length && levels(l).length >= k) {
      compact(l)
      l += 1
    }
  }

  private def compact(l: Int): Unit = {
    val arr = levels(l).toArray
    java.util.Arrays.sort(arr)
    val even = arr.length & ~1
    val off = if (coins(l)) 1 else 0
    coins(l) = !coins(l)
    ensureLevel(l + 1)
    val up = levels(l + 1)
    var i = off
    while (i < even) { up += arr(i); i += 2 }
    levels(l).clear()
    if (even < arr.length) levels(l) += arr(arr.length - 1) // odd leftover
    err += (1L << l)
  }

  /** Mergeable-summaries combine: concatenate level-wise (weights align),
    * sum n and the error ledgers, re-compact wherever capacity overflows.
    * A level holds < 2k items after concatenation, so one compaction per
    * level restores the invariant (the cascade handles promotions). */
  def mergeIn(other: KllBuffer): Unit = {
    n += other.n
    err += other.err
    ensureLevel(other.levels.length - 1)
    var l = 0
    while (l < other.levels.length) { levels(l) ++= other.levels(l); l += 1 }
    l = 0
    while (l < levels.length) {
      if (levels(l).length >= k) compact(l)
      l += 1
    }
  }

  /** All items as (value, weight = 2^level), sorted by (value, weight) —
    * the deterministic summary layout eval emits. */
  def items: Array[(Long, Long)] = {
    val out = ArrayBuffer.empty[(Long, Long)]
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach(v => out += ((v, w)))
      l += 1
    }
    out.sortBy(identity).toArray
  }
}

/** Native imperative aggregate (Dataset face:
  * [[graft.operators.QuantileSketch]]): KLL quantile summary over a LONG
  * value column. Partial aggregation applies — map tasks each carry one
  * k·log-sized buffer and only summaries cross the shuffle — and the same
  * buffer serializes into the state store as streaming state. Completes
  * the mergeable-summary family next to Misra–Gries (frequencies), HLL
  * (distincts) and Count-Min (point counts) with rank order statistics.
  *
  * Result: struct(n, err, items[(value, weight)]) sorted by value; item
  * content depends on arrival/partition order (like MG), so headline
  * queries are approximate-by-design and the harness gates the hard
  * invariant |sketchRank − trueRank| ≤ err via the `_verify` sibling.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] {

  require(k >= 8, s"kll k must be >= 8, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_sketch needs a BIGINT value column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_sketch"

  private val itemType = StructType(Seq(
    StructField("value", LongType, nullable = false),
    StructField("weight", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(itemType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buffer: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KllBuffer, other: KllBuffer): KllBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: KllBuffer): Any = {
    val rows = buffer.items.map { case (v, w) => InternalRow(v, w): Any }
    InternalRow(buffer.n, buffer.err, new GenericArrayData(rows))
  }

  override def serialize(buffer: KllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeLong(buffer.n)
    out.writeLong(buffer.err)
    out.writeInt(buffer.levels.length)
    buffer.levels.indices.foreach { l =>
      out.writeBoolean(buffer.coins(l))
      out.writeInt(buffer.levels(l).length)
      buffer.levels(l).foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuffer(in.readInt())
    buf.n = in.readLong()
    buf.err = in.readLong()
    val nLevels = in.readInt()
    var l = 0
    while (l < nLevels) {
      if (buf.levels.length <= l) { buf.levels += ArrayBuffer.empty[Long]; buf.coins += false }
      buf.coins(l) = in.readBoolean()
      var c = in.readInt()
      while (c > 0) { buf.levels(l) += in.readLong(); c -= 1 }
      l += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
