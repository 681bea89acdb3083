package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-memory heavy-hitters state: at most `capacity` counters plus two
  * longs of bookkeeping, regardless of input cardinality — the reason this
  * works at 100 TB where an exact `groupBy(item).count` shuffles every
  * distinct key.
  *
  * Misra–Gries invariant carried through updates AND merges: for every item
  * x (tracked or not), `est(x) <= true(x) <= est(x) + sub`, where `est` of
  * an untracked item is 0 and `sub` is the cumulative uniform subtraction
  * this summary has performed. Each subtraction unit retires `capacity + 1`
  * units of count mass, so `sub * (capacity + 1) <= n` — every item with
  * true frequency above n/(capacity+1) is guaranteed tracked. All three
  * facts are checked IN-ENGINE against exact counts by the
  * `q_heavy_hitters_verify` harness query.
  */
final class MisraGriesBuffer(val capacity: Int) {
  var counts: scala.collection.mutable.LongMap[Long] =
    scala.collection.mutable.LongMap.empty
  var n: Long = 0L   // exact stream length (non-null items seen)
  var sub: Long = 0L // cumulative uniform subtraction (error bound)

  def add(item: Long): Unit = {
    n += 1
    if (counts.contains(item)) counts(item) += 1
    else if (counts.size < capacity) counts(item) = 1
    else {
      // decrement round: every tracked counter and the arriving item each
      // lose one unit — capacity+1 mass retired per `sub` unit. Rebuild
      // instead of mutating mid-iteration; rounds are O(capacity) but
      // amortize to O(1)/item (each round needs a full buffer to fire).
      sub += 1
      val next = scala.collection.mutable.LongMap.empty[Long]
      counts.foreach { case (k, v) => if (v > 1) next(k) = v - 1 }
      counts = next
    }
  }

  /** Mergeable-summaries combine (Agarwal et al., PODS'12): sum counts over
    * the key union, then subtract the (capacity+1)-th largest combined
    * count from everything and drop the non-positive — at most `capacity`
    * survivors, and the subtraction is uniform so the MG invariant holds
    * with `sub = sub1 + sub2 + t`. */
  def mergeIn(other: MisraGriesBuffer): Unit = {
    n += other.n
    sub += other.sub
    other.counts.foreach { case (k, v) => counts(k) = counts.getOrElse(k, 0L) + v }
    if (counts.size > capacity) {
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      val t = vals(vals.length - capacity - 1)
      sub += t
      val next = scala.collection.mutable.LongMap.empty[Long]
      counts.foreach { case (k, v) => if (v > t) next(k) = v - t }
      counts = next
    }
  }
}

/** Native imperative aggregate (the Dataset-API face is
  * [[graft.operators.HeavyHitters]]): Misra–Gries frequent-items over a
  * LONG item column. Partial aggregation applies: each map task keeps one
  * fixed-size buffer and only `capacity`-sized summaries cross the shuffle —
  * the aggregate is mergeable by construction, exactly what
  * `TypedImperativeAggregate` partial/merge modes require.
  *
  * Result: struct(n, sub, items[(item, est)]), items sorted (est desc,
  * item asc). Estimates depend on partitioning order, so queries over this
  * are approximate-by-design; the guarantee fields n/sub make the output
  * self-verifying (see the `_verify` harness query).
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesBuffer] {

  require(capacity >= 1, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries needs a BIGINT item column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  private val itemType = StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sub", LongType, nullable = false),
    StructField("items", ArrayType(itemType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): MisraGriesBuffer =
    new MisraGriesBuffer(capacity)

  override def update(buffer: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: MisraGriesBuffer, other: MisraGriesBuffer): MisraGriesBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: MisraGriesBuffer): Any = {
    val sorted = buffer.counts.toArray
      .sortBy { case (item, est) => (-est, item) }
      .map { case (item, est) => InternalRow(item, est): Any }
    InternalRow(buffer.n, buffer.sub, new GenericArrayData(sorted))
  }

  override def serialize(buffer: MisraGriesBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeLong(buffer.n)
    out.writeLong(buffer.sub)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (k, v) => out.writeLong(k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MisraGriesBuffer(in.readInt())
    buf.n = in.readLong()
    buf.sub = in.readLong()
    var k = in.readInt()
    while (k > 0) { buf.counts(in.readLong()) = in.readLong(); k -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
