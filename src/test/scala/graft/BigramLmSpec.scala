package graft

import org.apache.spark.sql.functions._

import graft.text.BigramLm

/** Stupid-backoff bigram surprisal (t16): hand-computed truth on a
  * corpus crafted to hit all three scoring branches (first token,
  * seen bigram, backoff incl. OOV context and OOV token), plus
  * determinism of the position-ordered fold.
  */
class BigramLmSpec extends SparkSpec {

  import spark.implicits._

  private val ln = (x: Double) => java.lang.Math.log(x)

  test("hand-computed branches: first-token, seen-bigram, backoff, OOV") {
    // train: "a b a c" -> uni a:2 b:1 c:1, tot 4;
    // bigrams (a,b):1 (b,a):1 (a,c):1; ctx a:2 b:1
    val train = Seq((0L, "a b a c")).toDF("doc_id", "text")
    val score = Seq((0L, "a b a c"), (1L, "a b z c")).toDF("doc_id", "text")
    val got = BigramLm.surprisal(score, train, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 0 (all seen): [ln(5/3), ln(2/1), ln(1/1), ln(2/1)] / 4
    val e0 = (ln(5.0 / 3.0) + ln(2.0 / 1.0) + ln(1.0 / 1.0) + ln(2.0 / 1.0)) / 4
    // doc 1: first 'a' ln(5/3); (a,b) seen ln(2/1); (b,z) backoff with
    // OOV z: ln(5/(0.4*1)); (z,c) OOV context: ln(5/(0.4*2))
    val e1 = (ln(5.0 / 3.0) + ln(2.0 / 1.0) +
      ln(5.0 / (0.4 * 1.0)) + ln(5.0 / (0.4 * 2.0))) / 4
    assert(math.abs(got(0L) - e0) < 1e-12, s"doc0 ${got(0L)} vs $e0")
    assert(math.abs(got(1L) - e1) < 1e-12, s"doc1 ${got(1L)} vs $e1")
  }

  test("same-corpus training never backs off; held-out scoring does") {
    val docs = Tables.t(spark, sf, "documents")
    val self = BigramLm.surprisal(docs, docs, "doc_id", "text")
    // surprisal of a seen bigram is ln(cp/cb) <= ln(tot); the backoff
    // term for a frequent token would exceed any conditional — sanity:
    // scores are finite and positive-ish
    val vals = self.select("mean_surprisal").as[Double].collect()
    assert(vals.forall(v => !v.isNaN && !v.isInfinite))
    assert(vals.forall(_ >= 0.0))
  }

  test("fold is position-ordered: repartitioned input scores identically") {
    val docs = Tables.t(spark, sf, "documents").limit(50)
    val train = docs.filter(col("doc_id") % 2 === 0)
    val a = BigramLm.surprisal(docs, train, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = BigramLm.surprisal(docs.repartition(7), train.repartition(3),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a === b, "mean_surprisal must be partitioning-invariant")
  }
}
