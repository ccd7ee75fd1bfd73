package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Distinct-intersection size of two SORTED array<long> columns — the
  * Jaccard-verification kernel for hashed shingle sets (SURVEY.md §4:
  * custom Expressions for hot array kernels).
  *
  * Semantics: |set(a) ∩ set(b)| via a linear merge over the two sorted
  * arrays, duplicate values counted once — the same result as
  * `size(array_intersect(a, b))` but O(n1+n2) with zero allocation
  * versus array_intersect's per-row hash-set build + result array.
  * Inputs MUST be ascending-sorted (callers sort once at shingle build;
  * element order carries no other meaning there).
  *
  * Null: null if either side is null; null elements cannot occur in the
  * producing kernel (compiled shingle hasher) and are ignored.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < n1 && j < n2) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        cnt += 1
        // skip duplicates of the matched value on both sides
        val v = xv
        while (i < n1 && x.getLong(i) == v) i += 1
        while (j < n2 && y.getLong(j) == v) j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $n1 && $j < $n2) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $cnt++;
         |    while ($i < $n1 && $a.getLong($i) == $xv) { $i++; }
         |    while ($j < $n2 && $b.getLong($j) == $yv) { $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-level entry point (Spark 4 classic column-node bridge). */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
