package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) as a native
  * Catalyst [[TypedImperativeAggregate]] — the mergeable frequency
  * sketch that pairs with [[KmvDistinct]]'s cardinality sketch in the
  * §2.7 aggregate surface.
  *
  * State is a depth x width grid of counters; each input increments one
  * counter per row; a point estimate is the MIN over its depth cells —
  * an overestimate by at most the colliding mass, never an
  * underestimate. Unlike Misra-Gries/space-saving summaries (whose
  * contents depend on merge ORDER), every CMS operation is a counter
  * SUM — commutative and associative — so the distributed result is
  * bit-identical however Spark orders partial aggregation, and the
  * driver's DuckDB gate can rebuild the exact same grid from per-cell
  * sums. That order-independence is why CMS is the heavy-hitter sketch
  * here, for the same reason KMV (not HLL) is the cardinality sketch.
  *
  * The input is the precomputed per-row bucket-index array
  * (`transform(sequence(0, depth-1), r -> pmod(hash60(tok, r), width))`)
  * rather than the raw token: the hash family stays in whole-stage
  * codegen (and in the repo's cross-engine md5 family,
  * [[graft.functions.Hashing.hash60]]); only the counter updates are
  * imperative, like Spark's own sketch aggregates.
  *
  * Scale shape: state is a fixed 8 x depth x width bytes however many
  * rows flow in (the whole point — a 4 x 2^20 grid summarises any
  * corpus in 32 MB), updates are map-side partial, merges are
  * elementwise adds. Estimation downstream is plain `element_at` over
  * the evaluated grid — no second aggregate needed.
  */
case class CmsSketch(child: Expression, depth: Int, width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(depth >= 1 && width >= 1, s"cms_sketch needs depth/width >= 1")
  require(depth.toLong * width <= (1L << 24),
    s"cms_sketch grid $depth x $width exceeds 2^24 cells — " +
      "a per-group aggregation buffer this large is a config error")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == depth,
        s"cms_sketch bucket array has ${arr.numElements()} entries, " +
          s"expected depth=$depth")
      var r = 0
      while (r < depth) {
        val b = arr.getLong(r)
        require(b >= 0 && b < width,
          s"cms_sketch bucket $b out of range [0, $width)")
        buf(r * width + b.toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)

  override def prettyName: String = "cms_sketch"
}

object CmsSketch {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-level entry point over a precomputed bucket-index array. */
  def apply(c: org.apache.spark.sql.Column, depth: Int,
      width: Int): org.apache.spark.sql.Column =
    ExpressionUtils.column(
      CmsSketch(ExpressionUtils.expression(c), depth, width)
        .toAggregateExpression())
}

/** [[CmsSketch]] with a per-row weight: each input adds `weight` to one
  * counter per row instead of 1 — the grid built from a pre-aggregated
  * (key, count) relation is cell-for-cell identical to the unweighted
  * grid over the raw occurrences (counter updates are commutative
  * integer sums), which lets a consumer that ALSO needs the exact
  * per-key counts (t19's verification column) share one corpus pass
  * between the sketch and the count aggregate instead of scanning and
  * exploding the corpus twice (r17, guide §2.4 — the aggregate's
  * exchange is reused by both consumers). Null weights skip the row
  * like null bucket arrays.
  */
case class CmsSketchWeighted(left: Expression, right: Expression,
    depth: Int, width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(depth >= 1 && width >= 1, s"cms_sketch_weighted needs depth/width >= 1")
  require(depth.toLong * width <= (1L << 24),
    s"cms_sketch_weighted grid $depth x $width exceeds 2^24 cells — " +
      "a per-group aggregation buffer this large is a config error")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType, containsNull = false), LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = left.eval(input)
    val w = right.eval(input)
    if (v != null && w != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == depth,
        s"cms_sketch_weighted bucket array has ${arr.numElements()} " +
          s"entries, expected depth=$depth")
      val wl = w.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        val b = arr.getLong(r)
        require(b >= 0 && b < width,
          s"cms_sketch_weighted bucket $b out of range [0, $width)")
        buf(r * width + b.toInt) += wl
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CmsSketchWeighted =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_sketch_weighted"
}

object CmsSketchWeighted {
  import org.apache.spark.sql.classic.ExpressionUtils

  def apply(bk: org.apache.spark.sql.Column, w: org.apache.spark.sql.Column,
      depth: Int, width: Int): org.apache.spark.sql.Column =
    ExpressionUtils.column(
      CmsSketchWeighted(ExpressionUtils.expression(bk),
        ExpressionUtils.expression(w), depth, width)
        .toAggregateExpression())
}
