package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `TokenizeSpace(text)` — `split(lower(text), " ")` as one native
  * kernel (r18, the VERDICT r17 #4 item; guide §1.2 "per-task work").
  *
  * Why two ways:
  *  - Per-row cost: Catalyst's `StringSplit` compiles its pattern as a
  *    REGEX per evaluation (`UTF8String.split` has no compiled-pattern
  *    cache), and `lower` + `split` are two passes with an intermediate
  *    copy. This kernel is one `UTF8String.toLowerCase` call (the exact
  *    function the builtin uses) plus a single byte scan that slices on
  *    0x20 — a space byte never occurs inside a multi-byte UTF-8
  *    sequence, so byte slicing equals the regex-" " split, and the
  *    output strings share the lowercased buffer (no per-token copy).
  *  - Plan shape: the `pinned = true` form reports
  *    `deterministic = false` (the function is pure — this is the
  *    signedSets/winnow convention for heavy kernels): it stops
  *    `InferFiltersFromGenerate`'s `size(toks) > 0` predicate from
  *    being substituted through the tokenize projection into the scan's
  *    data filters, which re-tokenized the whole corpus once per
  *    consumer subtree in the t8/t13/t16 plans (the r17 "inferred-filter
  *    double-tokenize"; the outer-generate cure measured worse because
  *    it breaks whole-stage codegen around the Generate). Use
  *    `pinned = true` in projections that feed an explode; use the
  *    default deterministic form in scalar contexts (tokenCount-style
  *    column kernels) where common-subexpression elimination must stay
  *    available.
  *
  * Exactness: `lower` under the default UTF8_BINARY collation is
  * `UTF8String.toLowerCase` — called verbatim here; `split(s, " ")`
  * with Spark's default limit -1 keeps leading, inner and trailing
  * empty tokens, and an empty (or all-spaces) input yields the empty
  * tokens themselves — byte-slicing on 0x20 reproduces all of it
  * (TokenizeSpaceSpec pins bit-equality against the builtin chain on
  * edge and fuzz corpora, and schema equality including element
  * nullability).
  */
case class TokenizeSpace(child: Expression, pinned: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  // mirrors StringSplit's dataType (containsNull = false: split never
  // emits null elements) so downstream schemas are unchanged
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "tokenize_space"
  // pure; `pinned` only controls optimizer visibility (scaladoc above)
  override lazy val deterministic: Boolean =
    !pinned && child.deterministic

  override def nullSafeEval(s: Any): Any =
    TokenizeSpace.tokenize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = TokenizeSpace.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.tokenize($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenizeSpace =
    copy(child = newChild)
}

object TokenizeSpace {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def apply(text: Column): Column =
    ExpressionUtils.column(TokenizeSpace(ExpressionUtils.expression(text)))

  /** The pushdown-pinned form for projections feeding an explode. */
  def pinned(text: Column): Column =
    ExpressionUtils.column(
      TokenizeSpace(ExpressionUtils.expression(text), pinned = true))

  /** The kernel (static-forwarded for generated code). */
  def tokenize(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase
    val b = lower.getBytes
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    val out = new Array[Any](n)
    var start = 0
    var k = 0
    i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        out(k) = UTF8String.fromBytes(b, start, i - start)
        k += 1
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
