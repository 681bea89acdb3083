package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Count-Min sketch state: `depth` rows of `width` long counters plus the
  * exact stream length — point-frequency estimates for ANY item over a
  * bounded state, the complement of the Misra–Gries summary (MG answers
  * "which items are heavy"; CMS answers "how often did THIS item occur"
  * for items chosen after the scan). Guarantees, checked in-engine by the
  * harness: `est(x) >= true(x)` always (counters only ever add), and
  * `est(x) <= true(x) + e·n/width` with probability `1 - exp(-depth)` per
  * item (Cormode & Muthukrishnan 2005).
  *
  * Merge is ELEMENTWISE SUM — associative and commutative — so like the
  * HLL registers (and unlike MG's lossy combine) the merged sketch is a
  * pure function of the input MULTISET: any partitioning, any merge tree
  * yields bit-identical counters, and the harness gates merged ≡ direct
  * exactly. Row hashes are Spark's XXH64 with the row index as seed.
  */
final class CmsBuffer(val depth: Int, val width: Int) {
  val counters: Array[Long] = new Array[Long](depth * width)
  var n: Long = 0L

  @inline private def slot(row: Int, item: Long): Int = {
    val h = XXH64.hashLong(item, row.toLong)
    // non-negative modulo without branching on Long.MinValue edge cases
    row * width + ((h & Long.MaxValue) % width).toInt
  }

  def add(item: Long): Unit = {
    n += 1
    var r = 0
    while (r < depth) { counters(slot(r, item)) += 1; r += 1 }
  }

  def estimate(item: Long): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counters(slot(r, item))
      if (c < min) min = c
      r += 1
    }
    if (min == Long.MaxValue) 0L else min
  }

  def mergeIn(other: CmsBuffer): Unit = {
    require(other.depth == depth && other.width == width,
      s"cannot merge CMS of different shape ($depth x $width vs " +
        s"${other.depth} x ${other.width})")
    n += other.n
    var i = 0
    while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 8 + counters.length * 8)
    bb.putInt(depth).putInt(width).putLong(n)
    counters.foreach(bb.putLong)
    bb.array()
  }

  /** AMS/CMS inner-product estimate: min over rows of Σⱼ a[r][j]·b[r][j]
    * — an upper bound on Σₖ fA(k)·fB(k), which is exactly the EQUI-JOIN
    * CARDINALITY on the sketched key (Cormode & Muthukrishnan 2005 §4.2;
    * Alon–Matias–Szegedy for the moment view). Guarantees mirror the
    * point estimate: never BELOW the true join size (colliding keys only
    * add), and within e·nA·nB/width above it w.p. 1−exp(−depth). Caller
    * ensures nA·nB < 2⁶³ (the row dot products are exact long sums). */
  def innerProduct(other: CmsBuffer): Long = {
    require(other.depth == depth && other.width == width,
      s"cannot inner-product CMS of different shape ($depth x $width vs " +
        s"${other.depth} x ${other.width})")
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      var dot = 0L
      var j = 0
      while (j < width) {
        dot += counters(r * width + j) * other.counters(r * width + j)
        j += 1
      }
      if (dot < min) min = dot
      r += 1
    }
    if (min == Long.MaxValue) 0L else min
  }
}

object CmsBuffer {
  def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CmsBuffer(bb.getInt, bb.getInt)
    buf.n = bb.getLong
    var i = 0
    while (i < buf.counters.length) { buf.counters(i) = bb.getLong; i += 1 }
    buf
  }
}

/** Sketch-building aggregate over a BIGINT column → serialized sketch
  * (BINARY). Partial aggregation applies: map tasks fold rows into one
  * depth×width counter grid each and only grids cross the shuffle. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  require(depth >= 1 && depth <= 32, s"depth must be in [1,32], got $depth")
  // upper bound for the same reason lgK is capped at 16: the grid is the
  // PER-GROUP aggregation buffer — an unbounded width overflows the Int
  // cell count (NegativeArraySizeException) or OOMs every task; 2^22
  // longs = 32 MB/buffer is already generous for ε = e/width ≈ 6.5e-7
  require(width >= 16 && width <= (1 << 22),
    s"width must be in [16, ${1 << 22}], got $width")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_sketch needs a BIGINT item column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_sketch"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width)

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: CmsBuffer): Any = buffer.serialize()
  override def serialize(buffer: CmsBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    CmsBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Sketch-union aggregate: BINARY sketches → elementwise-summed sketch.
  * Second aggregation level — per-segment sketches stored as artifacts
  * combine into any coarser rollup without rescanning rows. */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_merge needs a BINARY sketch column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_merge"
  override def dataType: DataType = BinaryType

  /** Shape unknown until the first sketch arrives — 0-depth marker. */
  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(0, 16)

  private def fold(buffer: CmsBuffer, incoming: CmsBuffer): CmsBuffer =
    if (incoming.depth == 0) buffer
    else if (buffer.depth == 0) incoming
    else { buffer.mergeIn(incoming); buffer }

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v == null) buffer
    else fold(buffer, CmsBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer =
    fold(buffer, other)

  override def eval(buffer: CmsBuffer): Any = buffer.serialize()
  override def serialize(buffer: CmsBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    CmsBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar (sketch, item) → estimated count. Evaluated per PROBED item
  * (bounded probe sets by construction), not per input row, so
  * CodegenFallback costs nothing on the hot path. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_estimate needs (BINARY sketch, BIGINT item), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def prettyName: String = "graft_cms_estimate"
  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any, item: Any): Any = {
    val buf = CmsBuffer.deserialize(sketch.asInstanceOf[Array[Byte]])
    if (buf.depth == 0) 0L else buf.estimate(item.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Two sketches of the SAME shape → struct(n_a, n_b, est): the CMS/AMS
  * inner product, i.e. the estimated EQUI-JOIN CARDINALITY on the
  * sketched key — the number an optimizer needs to pick broadcast vs
  * shuffle vs skew handling BEFORE running the join, from two already-
  * stored KB-scale sketches instead of a scan. Never underestimates;
  * overcount within e·nA·nB/width w.p. 1−exp(−depth). Evaluated once per
  * sketch pair, hence CodegenFallback. */
case class CmsInnerProduct(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_inner needs two BINARY sketch columns, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def prettyName: String = "graft_cms_inner"
  override def dataType: DataType = StructType(Seq(
    StructField("n_a", LongType, nullable = false),
    StructField("n_b", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ba = CmsBuffer.deserialize(a.asInstanceOf[Array[Byte]])
    val bb = CmsBuffer.deserialize(b.asInstanceOf[Array[Byte]])
    // the 0-depth marker (empty merge) inner-products to 0 with anything
    if (ba.depth == 0 || bb.depth == 0)
      InternalRow(ba.n, bb.n, 0L)
    else InternalRow(ba.n, bb.n, ba.innerProduct(bb))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsInnerProduct =
    copy(left = newLeft, right = newRight)
}
