package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** `Int8Quantize(v)` — the symmetric per-vector int8 quantization of
  * `graft.sim.Quantize.int8CodeCol` as ONE native kernel (r17, the
  * optimization round, guide §1.2 "per-task work").
  *
  * Why: the Column form is a chain of higher-order functions
  * (`array_max(transform(abs))` for the scale, `transform(greatest(
  * least(floor(...))))` for the codes). HOFs are CodegenFallback AND
  * excluded from common-subexpression elimination, so every Lloyd
  * training pass of the PQ/kmeans family paid an interpreted,
  * per-element-boxed evaluation of the whole chain per row — measured
  * as the dominant per-pass cost at the oracle scales (~90 us/row at
  * dim 64 vs ~1 us for this loop).
  *
  * Exactness: the JVM loop mirrors the Catalyst expression chain OP BY
  * OP — the DuckDB oracles mirror the same ops, so the values must stay
  * bit-identical:
  *  - scale = array_max(transform(v, abs)) / 127.0: max of |x| over
  *    non-null elements under the SQL double ordering (NaN greatest);
  *    all-null/empty array -> null scale.
  *  - `when(scale === 0.0, transform(v, _ => 0.0))`: a zero (or
  *    underflowed-to-zero) scale codes EVERY element 0.0 (null
  *    elements included — the lambda ignores its input). A NULL scale
  *    makes the `when` condition null -> the otherwise branch.
  *  - otherwise per element x: `greatest(-127.0, least(127.0,
  *    cast(floor(x/scale + 0.5) as double)))`; Spark's floor(double)
  *    returns LONG (math.floor then toLong: NaN -> 0, +-Inf ->
  *    Long.Max/Min), and least/greatest SKIP nulls — so a null x (or a
  *    null scale) propagates null INTO least, which returns 127.0, and
  *    greatest(-127.0, 127.0) = 127.0.
  *  - a null vector yields a null result (transform(null) is null).
  *
  * Output element type stays nullable to match the HOF chain's schema
  * (values are in fact never null).
  *
  * The Int8QuantizeSpec drives this against the Column form over
  * adversarial corpora (nulls, NaN, +-Inf, -0.0, zero vectors,
  * subnormal scales, empty arrays).
  */
case class Int8Quantize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "int8_quantize"

  override def nullSafeEval(a: Any): Any =
    Int8Quantize.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = Int8Quantize.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.quantize($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def apply(v: Column): Column =
    ExpressionUtils.column(Int8Quantize(ExpressionUtils.expression(v)))

  /** The kernel (static-forwarded for generated code). */
  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    // scale = array_max(transform(v, abs)) / 127.0 (nulls skipped,
    // SQL double ordering: NaN greatest)
    var m = 0.0
    var has = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val a = math.abs(v.getDouble(i))
        if (!has || SQLOrderingUtil.compareDoubles(a, m) > 0) { m = a; has = true }
      }
      i += 1
    }
    val out = new Array[Any](n)
    if (has && m / 127.0 == 0.0) {
      var j = 0
      while (j < n) { out(j) = java.lang.Double.valueOf(0.0); j += 1 }
    } else if (!has) {
      // null scale: x/null and null x both reach least() as null,
      // least skips it -> 127.0, greatest(-127, 127) = 127.0
      var j = 0
      while (j < n) { out(j) = java.lang.Double.valueOf(127.0); j += 1 }
    } else {
      val scale = m / 127.0
      var j = 0
      while (j < n) {
        out(j) = java.lang.Double.valueOf(
          if (v.isNullAt(j)) 127.0 // null x -> least skips -> clamp top
          else {
            // floor(double) is LONG-valued in Spark, then cast back
            val t = math.floor(v.getDouble(j) / scale + 0.5).toLong
            val td = t.toDouble
            val l = if (SQLOrderingUtil.compareDoubles(td, 127.0) < 0) td
              else 127.0
            if (SQLOrderingUtil.compareDoubles(l, -127.0) > 0) l else -127.0
          })
        j += 1
      }
    }
    new GenericArrayData(out)
  }
}
