package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two array<double> columns
  * (SURVEY.md §4: "custom Expressions for hot array kernels ... to stay
  * codegen-friendly").
  *
  * Semantics: sequential left fold sum(a(i)*b(i)) over
  * min(len(a), len(b)) — the exact IEEE operation sequence of
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)` and
  * of DuckDB's list_dot_product, so oracle parity is preserved — but
  * generated into whole-stage Java (primitive loop, no per-element
  * boxing, no intermediate array, no UDF serialization).
  *
  * Null handling: null if either side is null; null/NaN elements
  * propagate NaN into the sum like the HOF form does (null element *
  * anything is null -> the fold result would be null; we mirror the
  * stricter HOF behavior by treating a null element as NaN, which the
  * similarity operators never feed anyway — embeddings are dense).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) Double.NaN else x.getDouble(i)
      val yv = if (y.isNullAt(i)) Double.NaN else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = $a.isNullAt($i) ? Double.NaN : $a.getDouble($i);
         |  double yv = $b.isNullAt($i) ? Double.NaN : $b.getDouble($i);
         |  $acc += xv * yv;
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-level entry point (Spark 4 classic column-node bridge). */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
