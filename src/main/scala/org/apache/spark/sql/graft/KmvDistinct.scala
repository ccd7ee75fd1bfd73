package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * [[TypedImperativeAggregate]] — the §2.7 aggregate-function surface.
  *
  * The classic mergeable distinct sketch (Bar-Yossef et al., RANDOM'02):
  * keep the k smallest DISTINCT hash values seen; with hashes uniform
  * on [0, 2^60), the k-th smallest h_k estimates the distinct count as
  * `(k-1) * 2^60 / h_k` (unbiased for the uniform order statistic).
  * Below k distinct values the sketch IS the exact distinct set and
  * the exact count is returned.
  *
  * Why not approx_count_distinct: Spark's HLL++ and DuckDB's HLL
  * disagree by construction, so the estimate can't be oracle-checked.
  * KMV over the repo's cross-engine md5 hash family
  * ([[graft.functions.Hashing.hash60]]) is DETERMINISTIC — both
  * engines see the same hashes, keep the same k minima, and divide the
  * same doubles — so the sketch itself is hash-compare verifiable.
  *
  * Scale shape: state is a bounded sorted set (<= k longs, 4 + 8k
  * bytes serialized), updates are partial (map-side combine keeps k
  * minima per partition before the shuffle — the whole point of a
  * sketch aggregate), merges are set-union-then-truncate. The input is
  * a pre-hashed LONG column, so the hash computation stays in
  * whole-stage codegen; only the aggregation is imperative, like every
  * sketch aggregate in Spark itself.
  */
case class KmvDistinct(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  private val twoPow60 = 1152921504606846976.0d // exact in double

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.pollLast()
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * twoPow60 / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val ts = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { ts.add(bb.getLong); i += 1 }
    ts
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)

  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-level entry point. */
  def apply(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    ExpressionUtils.column(
      KmvDistinct(ExpressionUtils.expression(c), k).toAggregateExpression())
}

/** The same bounded k-minima buffer, evaluated to the SKETCH itself —
  * the sorted array of the k smallest distinct hashes — instead of the
  * count estimate. This is the composable form: two sketches support
  * set algebra downstream with plain array functions (union = merge +
  * truncate, intersection membership on the shared theta), which is
  * how corpus-PAIR statistics (vocabulary overlap, containment) are
  * estimated without pairwise corpus scans. Same state, codec, and
  * partial-merge shape as [[KmvDistinct]].
  */
case class KmvMinima(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"kmv_minima needs k >= 1, got $k")

  private val inner = KmvDistinct(child, math.max(k, 2))

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.pollLast()
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinima =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinima =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinima =
    copy(child = newChild)

  override def prettyName: String = "kmv_minima"
}

object KmvMinima {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-level entry point. */
  def apply(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    ExpressionUtils.column(
      KmvMinima(ExpressionUtils.expression(c), k).toAggregateExpression())
}
