package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

import graft.dedup.TextHashing.fmix64

/** Count-min sketch (Cormode & Muthukrishnan 2005): mergeable approximate
  * frequency counts — the heavy-hitter / boilerplate-detection companion
  * to the HLL cardinality sketches. `depth` independent rows of `width`
  * counters; an item increments one counter per row, its estimate is the
  * MIN across rows (always >= the true count; overestimate bounded by
  * eps = e/width with probability 1 - e^-depth).
  *
  * Row hashing is the same recomputable construction as the minhash
  * permutations: `cell_d = fmix64(h ^ k_d) mod width` (unsigned) with
  * `k_d = fmix64((seed << 32) + d)` — plain 64-bit modular arithmetic +
  * xor/shift end to end, so the DuckDB oracle rebuilds the sketch's cells
  * and replays estimates BIT-FOR-BIT (the bloom-replica treatment).
  *
  * Wire format (big-endian): width:int, depth:int, seed:int, then
  * depth*width cell longs, row-major. Merging is elementwise addition —
  * associative/commutative, so per-day sketches compose across any merge
  * tree without rescanning the base table.
  */
object CountMin {

  def key(seed: Int, d: Int): Long = fmix64((seed.toLong << 32) + d)

  def cellIndex(h: Long, seed: Int, d: Int, width: Int): Int =
    java.lang.Long.remainderUnsigned(fmix64(h ^ key(seed, d)), width.toLong).toInt

  final class Buffer(val width: Int, val depth: Int, val seed: Int) extends Serializable {
    val cells: Array[Long] = new Array[Long](width * depth)
    def add(h: Long, c: Long): Unit = {
      var d = 0
      while (d < depth) {
        cells(d * width + cellIndex(h, seed, d, width)) += c
        d += 1
      }
    }
    def mergeInPlace(other: Buffer): Unit = {
      require(other.width == width && other.depth == depth && other.seed == seed,
        s"cms merge: shape mismatch ($width x $depth seed $seed vs " +
          s"${other.width} x ${other.depth} seed ${other.seed})")
      var i = 0
      while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
    }
    def serialize(): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + cells.length * 8)
      bb.putInt(width).putInt(depth).putInt(seed)
      var i = 0
      while (i < cells.length) { bb.putLong(cells(i)); i += 1 }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Buffer(bb.getInt(), bb.getInt(), bb.getInt())
    var i = 0
    while (i < b.cells.length) { b.cells(i) = bb.getLong(); i += 1 }
    b
  }

  /** Point estimate straight off the serialized bytes — O(depth) reads,
    * no buffer materialization (the probe side runs per row).
    */
  def estimate(bytes: Array[Byte], h: Long): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val width = bb.getInt(0); val depth = bb.getInt(4); val seed = bb.getInt(8)
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val v = bb.getLong(12 + (d * width + cellIndex(h, seed, d, width)) * 8)
      if (v < est) est = v
      d += 1
    }
    est
  }
}

/** `graft_cms_agg(hash, width, depth, seed)` — build a count-min sketch
  * over a LONG item-hash column; map-side partials mean only sketch bytes
  * (width*depth*8) enter the exchange whatever the corpus size.
  */
case class GraftCmsAggregate(
    child: Expression, width: Int, depth: Int, seed: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMin.Buffer] {

  require(width > 0 && depth > 0, "graft_cms_agg: width and depth must be positive")

  override def createAggregationBuffer(): CountMin.Buffer =
    new CountMin.Buffer(width, depth, seed)
  override def update(buffer: CountMin.Buffer, input: InternalRow): CountMin.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long], 1L)
    buffer
  }
  override def merge(buffer: CountMin.Buffer, other: CountMin.Buffer): CountMin.Buffer = {
    buffer.mergeInPlace(other); buffer
  }
  override def eval(buffer: CountMin.Buffer): Any = serialize(buffer)
  override def serialize(buffer: CountMin.Buffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CountMin.Buffer =
    CountMin.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): GraftCmsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftCmsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_cms_agg"
}

/** `graft_cms_merge_agg(sketch)` — elementwise-add previously built
  * sketches (the cross-day/cross-source compose; shape checked).
  */
case class GraftCmsMergeAggregate(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CountMin.Buffer]] {

  override def createAggregationBuffer(): Option[CountMin.Buffer] = None
  override def update(buffer: Option[CountMin.Buffer],
      input: InternalRow): Option[CountMin.Buffer] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = CountMin.deserialize(v.asInstanceOf[Array[Byte]])
      buffer match {
        case Some(b) => b.mergeInPlace(in); buffer
        case None => Some(in)
      }
    }
  }
  override def merge(buffer: Option[CountMin.Buffer],
      other: Option[CountMin.Buffer]): Option[CountMin.Buffer] =
    (buffer, other) match {
      case (Some(b), Some(o)) => b.mergeInPlace(o); buffer
      case (Some(_), None) => buffer
      case _ => other
    }
  override def eval(buffer: Option[CountMin.Buffer]): Any =
    buffer.map(_.serialize()).orNull
  override def serialize(buffer: Option[CountMin.Buffer]): Array[Byte] =
    buffer.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[CountMin.Buffer] =
    if (bytes.isEmpty) None else Some(CountMin.deserialize(bytes))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): GraftCmsMergeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftCmsMergeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_cms_merge_agg"
}

/** `cms_estimate(sketch, hash)` — point frequency estimate; codegen'd
  * static probe, O(depth) byte-buffer reads per row.
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override protected def nullSafeEval(sketch: Any, h: Any): Any =
    CountMin.estimate(sketch.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, h) => s"graft.plans.CountMin.estimate($s, $h)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateExpr =
    copy(left = newLeft, right = newRight)
}
