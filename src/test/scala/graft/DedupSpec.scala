package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.t(spark, sf, "documents")

  test("exact dedup keeps one survivor per distinct text") {
    val n = docs.count()
    val d = Dedup.exact(docs, "doc_id", "text")
    assert(d.count() <= n)
    assert(d.agg(sum("n_copies")).head().getLong(0) === n)
  }

  test("ngram jaccard finds the planted near-duplicate pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5).collect()
    assert(pairs.nonEmpty, "expected planted near-dups in documents")
    assert(pairs.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0))
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("minhash LSH recovers high-jaccard pairs found exactly") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // at jaccard >= 0.9, a 4-band/3-row LSH misses with prob < 1e-4
    assert(exact == lsh, s"LSH missed ${exact.diff(lsh)} / extra ${lsh.diff(exact)}")
  }

  test("simhash of identical token multisets is identical; near-dups are close") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h", "x"),
      (2L, "a b c d e f g h", "x"),
      (3L, "q r s t u v w z", "x")).toDF("doc_id", "text", "lang")
    val sim = Dedup.simhash(df, "doc_id", "text", Seq("lang"))
      .orderBy("doc_id").collect().map(_.getLong(2))
    assert(sim(0) === sim(1))
    assert(sim(0) !== sim(2))
  }

  test("embedding near-dup pairs are symmetric-free and thresholded") {
    val emb = Tables.t(spark, sf, "embeddings")
    val pairs = Dedup.embeddingDupPairs(emb, "vec_id", "embedding", "label", 0.3).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.3))
  }
}
