package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {

  test("simhash assignment is sound against the exact pair enumeration") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.t(spark, sf, "documents")
    val sim = Dedup.simhash(docs, "doc_id", "text")
    val pairs = Dedup.simhashPairs(sim, "doc_id", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val assign = Dedup.simhashAssign(sim, "doc_id", maxHamming = 4).collect()
    assign.foreach { r =>
      val (doc, canon, ham) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(canon < doc, "canonical must be the smaller id")
      assert(ham <= 4, "assignment outside the Hamming radius")
      assert(pairs.contains((canon, doc)),
        s"($doc -> $canon) is not a true near-dup pair")
    }
    // output is linear: at most one row per non-canonical doc
    assert(assign.map(_.getLong(0)).distinct.length === assign.length)
  }

  test("simhash operators leave no cached tables behind (ADVICE r5)") {
    val docs = Tables.t(spark, sf, "documents")
    val sim = Dedup.simhash(docs, "doc_id", "text")
    spark.sharedState.cacheManager.clearCache()
    Dedup.simhashPairs(sim, "doc_id", maxHamming = 4).count()
    Dedup.simhashAssign(sim, "doc_id", maxHamming = 4).count()
    Dedup.simhashClusters(sim, "doc_id", maxHamming = 4).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "a dedup operator leaked a cached table into the session")
  }

  test("simhash clusters equal union-find over the exact pair graph") {
    val docs = Tables.t(spark, sf, "documents")
    val sim = Dedup.simhash(docs, "doc_id", "text")
    val pairs = Dedup.simhashPairs(sim, "doc_id", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = Dedup.simhashClusters(sim, "doc_id", maxHamming = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected, "cluster labels diverge from union-find")
  }

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

  test("hamming-LSH banding has recall 1.0 within the radius") {
    import spark.implicits._
    // signatures engineered around a base value at varied Hamming
    // distances, plus random far points
    val base = 0x0123456789abcdL & ((1L << 60) - 1)
    def flip(x: Long, bits: Seq[Int]): Long = bits.foldLeft(x)((v, b) => v ^ (1L << b))
    val rows = Seq(
      0L -> base,
      1L -> flip(base, Seq(3)),            // ham 1
      2L -> flip(base, Seq(7, 19, 40)),    // ham 3
      3L -> flip(base, Seq(0, 15, 30, 45)),// ham 4 (at radius)
      4L -> flip(base, Seq(1, 2, 13, 25, 59)), // ham 5 (outside)
      5L -> (~base & ((1L << 60) - 1)))    // ham 60
    val sim = rows.toDF("doc_id", "simhash")
    val got = Dedup.simhashPairs(sim, "doc_id", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over all pairs
    val expected = (for {
      (i, hi) <- rows; (j, hj) <- rows if i < j
      ham = java.lang.Long.bitCount(hi ^ hj) if ham <= 4
    } yield (i, j, ham.toLong)).toSet
    assert(got === expected)
    assert(expected.exists(_._3 == 4)) // the at-radius pair is exercised
  }

  test("nearDupPairs: both operators off one shingle materialization") {
    val docs = Tables.t(spark, sf, "documents")
    val (d2Shared, d3Shared) = Dedup.nearDupPairs(docs, "doc_id", "text")
    val d2Solo = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
    val d3Solo = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.7)
    def set(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12))).toSet
    assert(set(d2Shared) === set(d2Solo))
    assert(set(d3Shared) === set(d3Solo))
    // both shared plans read the SAME InMemoryRelation (one cache id)
    def cacheIds(df: org.apache.spark.sql.DataFrame): Set[Long] = {
      val plan = df.queryExecution.optimizedPlan
      plan.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          m.cacheBuilder.cachedPlan.id.toLong
      }.toSet
    }
    val shared = cacheIds(d2Shared) intersect cacheIds(d3Shared)
    assert(shared.nonEmpty, "d2 and d3 do not share a cached relation")
  }

  test("embedding near-dup pairs are symmetric-free, thresholded, cell-routed") {
    val emb = Tables.t(spark, sf, "embeddings")
    val pairs = Dedup.embeddingDupPairs(emb, "vec_id", "embedding", 0.3).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.3))
    // both ends of every pair share an IVF cell
    val cells = graft.sim.Similarity.assignCells(emb, "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.forall(r => cells(r.getLong(0)) == cells(r.getLong(1))))
  }
}
