package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization of a string.
  *
  * Spark ships no normalization function, yet corpus text arrives in
  * mixed composition forms (é as U+00E9 vs e+U+0301) and every
  * downstream content hash — exact dedup, minhash shingles, winnow
  * fingerprints — treats the two encodings of the same glyph as
  * different documents. Normalizing to NFC before hashing is the
  * standard corpus-curation first step; `java.text.Normalizer` applies
  * the same Unicode canonical-composition tables DuckDB's
  * `nfc_normalize` (utf8proc) implements, so the two engines agree
  * byte-for-byte. Codegen'd so it stays inside whole-stage compilation;
  * the common all-ASCII case is short-circuited via
  * `Normalizer.isNormalized` (a table-free fast scan) before paying for
  * the compose pass.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = child.dataType

  override def nullSafeEval(x: Any): Any =
    NfcNormalize.normalize(x.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  import java.text.Normalizer

  /** Runtime kernel shared by eval and codegen. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-level entry point (Spark 4 classic column-node bridge). */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))
}
