package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Natural log via the platform's `java.lang.Math.log`.
  *
  * Catalyst's `log` evaluates through `StrictMath.log` (FDLIBM), which
  * can differ from platform libm by 1 ulp (ln(3) does on this stack).
  * The DuckDB oracle — and every compiled kernel in this repo that
  * takes a log (e.g. the m2 byte-entropy) — goes through platform libm,
  * so cross-engine hash parity needs the `Math.log` flavor. Codegen'd
  * like the other graft expressions so it stays inside whole-stage
  * compilation.
  */
case class NativeLn(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)

  override def dataType: DataType = DoubleType

  override def nullSafeEval(x: Any): Any =
    java.lang.Math.log(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(newChild: Expression): NativeLn =
    copy(child = newChild)

  override def prettyName: String = "native_ln"
}

object NativeLn {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-level entry point (Spark 4 classic column-node bridge). */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ExpressionUtils.column(NativeLn(ExpressionUtils.expression(c)))
}
