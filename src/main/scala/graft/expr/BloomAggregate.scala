package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Native Bloom filter state: `numBits` bits + `numHashes` probes via
  * Kirsch–Mitzenmacher double hashing (two XXH64 draws generate all k
  * probe positions — same guarantees as k independent hashes). The
  * membership summary of the family: MG says which items are heavy, HLL
  * how many distinct, CMS how often, KMV how sets overlap — Bloom says
  * "is THIS item possibly here", with no false negatives ever and a
  * false-positive rate ≈ (1 − e^(−k·n/m))^k.
  *
  * Merge is bitwise OR — associative, commutative, idempotent — so like
  * HLL and KMV the filter is a PURE FUNCTION OF THE INPUT SET: any
  * partitioning or merge tree yields byte-identical bits, and the
  * harness gates that equality exactly. The primary consumer is
  * [[graft.sink.BloomIndex]]: one filter per data file over a lookup key
  * turns point reads into file skipping on layouts where the key is NOT
  * the clustering column.
  */
final class BloomBuffer(val numBits: Int, val numHashes: Int) {
  val words: Array[Long] = new Array[Long]((numBits + 63) >>> 6)
  var n: Long = 0L // exact non-null input count (diagnostics)

  @inline private def probe(item: Long, i: Int): Int = {
    val h1 = XXH64.hashLong(item, BloomBuffer.Seed1)
    val h2 = XXH64.hashLong(item, BloomBuffer.Seed2)
    // Kirsch–Mitzenmacher: gᵢ = h1 + i·h2, mapped to [0, numBits)
    (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
  }

  def add(item: Long): Unit = {
    n += 1
    var i = 0
    while (i < numHashes) {
      val b = probe(item, i)
      words(b >>> 6) |= 1L << (b & 63)
      i += 1
    }
  }

  def mightContain(item: Long): Boolean = {
    var i = 0
    while (i < numHashes) {
      val b = probe(item, i)
      if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise OR — the only merge a Bloom filter needs. */
  def mergeIn(other: BloomBuffer): Unit = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      s"cannot merge Bloom filters of different shape ($numBits/$numHashes " +
        s"vs ${other.numBits}/${other.numHashes})")
    n += other.n
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 8 + words.length * 8)
    bb.putInt(numBits).putInt(numHashes).putLong(n)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object BloomBuffer {
  /** Fixed seeds: filters must agree across sessions to remain mergeable
    * stored artifacts (a file index outlives the writer's JVM). */
  val Seed1 = 0x51ed270b; val Seed2 = 0x6b43a9b5

  def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new BloomBuffer(bb.getInt, bb.getInt)
    buf.n = bb.getLong
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong; i += 1 }
    buf
  }

  /** Expected false-positive rate for n inserted items. */
  def fpp(numBits: Int, numHashes: Int, n: Long): Double =
    math.pow(1.0 - math.exp(-numHashes.toDouble * n / numBits), numHashes.toDouble)
}

/** Filter-building aggregate over a BIGINT column → serialized filter
  * (BINARY). Partial aggregation applies: map tasks OR bits locally and
  * only m-bit filters cross the shuffle. */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] {

  require(numBits >= 64 && numBits <= (1 << 27),
    s"numBits must be in [64, 2^27], got $numBits") // 16 MB/buffer cap
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1,16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg needs a BIGINT key column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(numBits, numHashes)

  override def update(buffer: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: BloomBuffer): Any = buffer.serialize()
  override def serialize(buffer: BloomBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): BloomBuffer =
    BloomBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** (BINARY filter, BIGINT item) → BOOLEAN possibly-present. False means
  * DEFINITELY absent — the property file skipping rests on. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains needs (BINARY filter, BIGINT item), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType

  override def nullSafeEval(filter: Any, item: Any): Any = {
    val buf = BloomBuffer.deserialize(filter.asInstanceOf[Array[Byte]])
    buf.mightContain(item.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
