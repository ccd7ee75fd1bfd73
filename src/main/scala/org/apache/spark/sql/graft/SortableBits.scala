package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** IEEE-754 order-preserving bit image of a double: the raw bits with
  * the sign fold (`b >= 0 ? b : ~(b ^ MIN_VALUE)`), so SIGNED
  * comparison of the result ranks exactly like numeric comparison of
  * the input
  * (-0.0 ranks just below +0.0; NaN above everything — callers that
  * need NaN-free semantics filter first). This is the drill key of
  * [[graft.functions.Selection]]'s sort-free exact quantile: bit
  * prefixes of this image are range buckets, so a histogram over a
  * 16-bit slice is a histogram over value ranges.
  *
  * Codegen'd (stays inside whole-stage pipelines); registered SQL-side
  * as `double_sortable_bits` via [[graft.GraftExtensions]].
  */
case class DoubleSortableBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any): Any =
    DoubleSortableBits.bits(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DoubleSortableBits.bits($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleSortableBits =
    copy(child = newChild)

  override def prettyName: String = "double_sortable_bits"
}

object DoubleSortableBits {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** The scalar kernel — shared by interpreted eval, codegen, and the
    * driver-side inverse walk in Selection. Positive doubles map to
    * their raw bits (already signed-increasing); negative doubles fold
    * through ~(b ^ MIN_VALUE), which reverses their unsigned-raw order
    * into the signed-negative range just below zero (-0.0 -> -1).
    */
  def bits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    if (b >= 0L) b else ~(b ^ java.lang.Long.MIN_VALUE)
  }

  /** Inverse of [[bits]] (total on the non-NaN image). */
  def invert(s: Long): Double = {
    val b = if (s >= 0L) s else (~s) ^ java.lang.Long.MIN_VALUE
    java.lang.Double.longBitsToDouble(b)
  }

  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ExpressionUtils.column(DoubleSortableBits(ExpressionUtils.expression(c)))
}
