package graft

import org.apache.spark.sql.functions._

import graft.text.{Normalize, Redact}

/** Normalization (t14) and PII redaction (t15): unit truth on crafted
  * strings — including the unicode cases the ASCII oracle data can't
  * exercise — plus null totality and the SQL-surface registration.
  * Unicode inputs are written as explicit \\u escapes so composed vs
  * decomposed forms are unambiguous in source.
  */
class ScrubSpec extends SparkSpec {

  import spark.implicits._

  private def norm1(s: String): String =
    Seq(s).toDF("t").select(Normalize.normalizeText(col("t")))
      .as[String].head()

  test("normalizeText: NFC composes decomposed accents") {
    // e + COMBINING ACUTE (2 codepoints) -> U+00E9 (1 codepoint)
    assert(norm1("Cafe\u0301") === "caf\u00e9")
    // already-composed input is unchanged (isNormalized fast path)
    assert(norm1("café") === "café")
  }

  test("normalizeText: controls and format chars become spaces, whitespace collapses, ends trim") {
    assert(norm1("  AB\tC   D \r\n E  ") === "ab c d e")
    // zero-width joiner (Cf) separates rather than silently gluing
    assert(norm1("ab\u200dcd") === "ab cd")
  }

  test("normalizeText: lowercase optional; null stays null") {
    val kept = Seq("A  B").toDF("t")
      .select(Normalize.normalizeText(col("t"), lowercase = false))
      .as[String].head()
    assert(kept === "A B")
    val nul = Seq[Option[String]](None).toDF("t")
      .select(Normalize.normalizeText(col("t"))).collect()
    assert(nul.head.isNullAt(0))
  }

  test("normalizeText: both NFC encodings of the same text fingerprint identically") {
    val df = Seq(("composed", "r\u00e9sum\u00e9 text"),
      ("decomposed", "re\u0301sume\u0301 text")).toDF("k", "t")
      .select(col("k"), md5(Normalize.normalizeText(col("t"))).as("fp"))
    val fps = df.as[(String, String)].collect().toMap
    assert(fps("composed") === fps("decomposed"))
  }

  test("redactText: URL -> email -> IPv4 order prevents double-firing inside URLs") {
    val in = "mail bob@x.co at https://h.io/u@v.w?ip=1.2.3.4 from 10.0.0.1 done"
    val out = Seq(in).toDF("t").select(Redact.redactText(col("t")))
      .as[String].head()
    // the URL (with its embedded @ and dotted quad) collapses FIRST
    assert(out === "mail <EMAIL> at <URL> from <IP> done")
  }

  test("piiCounts: counts match the tokens the redacted text carries") {
    val in = "a@b.co c@d.io https://x.y 1.2.3.4 5.6.7.8 9.10.11.12"
    val row = Seq(in).toDF("t")
      .select(Redact.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getLong(0) === 1L) // n_url
    assert(row.getLong(1) === 2L) // n_email
    assert(row.getLong(2) === 3L) // n_ip
  }

  test("redactText: boundary guards — over-long quads and embedded digits") {
    val out = Seq("v 1.2.3.4.5 x2.3.4.5y").toDF("t")
      .select(Redact.redactText(col("t"))).as[String].head()
    // 1.2.3.4.5: the first four groups match with \b at '1' and after
    // '4' ('.' is a non-word char) — documented \b semantics, identical
    // in RE2; x2... has no word boundary before the digit so no match
    assert(out === "v <IP>.5 x2.3.4.5y")
  }

  test("nfc_normalize registers on the SQL surface") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val got = spark.sql("SELECT nfc_normalize('Cafe\u0301')").as[String].head()
    assert(got === "Caf\u00e9")
  }
}
