package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NfcNormalize

/** Text normalization — the canonical first stage of a corpus pipeline,
  * run BEFORE any content hash so that byte-level encoding accidents
  * (composition form, control characters, whitespace style, case) don't
  * fracture identical content across dedup/fingerprint/shingle keys.
  *
  * Steps, in order:
  *  1. Unicode NFC canonical composition ([[NfcNormalize]] — native
  *     codegen'd expression; DuckDB mirror: `nfc_normalize`).
  *  2. Control/format characters (`\p{Cc}\p{Cf}` — C0/C1 controls,
  *     zero-width joiners, BOMs, bidi marks) → space. Format chars are
  *     replaced rather than deleted so they still separate words.
  *  3. Whitespace runs collapsed to one space, ends trimmed.
  *  4. Optional lowercasing (on by default — the convention the t1/t8
  *     token pipeline and the d-family shingles already assume).
  *
  * All four steps are per-row scalar expressions: MAP-ONLY at any
  * corpus size, no shuffle, fully inside whole-stage codegen. The
  * regex classes are chosen to mean the same thing in Java regex
  * (Spark) and RE2 (DuckDB): `\p{Cc}`/`\p{Cf}` are Unicode general
  * categories in both, `\s` is the same ASCII whitespace set in both
  * defaults.
  */
object Normalize {

  /** The composed normalization column. Null text stays null (every
    * step is null-propagating), matching SQL semantics.
    */
  def normalizeText(c: Column, lowercase: Boolean = true): Column = {
    val nfc = NfcNormalize(c)
    val noCtl = regexp_replace(nfc, "[\\p{Cc}\\p{Cf}]", " ")
    val collapsed = trim(regexp_replace(noCtl, "\\s+", " "))
    if (lowercase) lower(collapsed) else collapsed
  }
}
