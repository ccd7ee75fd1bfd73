package graft

import graft.sim.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.t(spark, sf, "embeddings")

  test("brute-force top-k is ordered and excludes the query") {
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10).collect()
    assert(top.length === 10)
    assert(!top.exists(_.getLong(0) == 0L))
    val cos = top.map(_.getDouble(1))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    assert(cos.forall(c => c >= -1.0000001 && c <= 1.0000001))
  }

  test("IVF results are a subset of cells and agree with brute force there") {
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10).collect()
    assert(ivf.length === 10)
    val cells = ivf.map(_.getLong(1)).toSet
    assert(cells.size <= 2, "nprobe=2 must limit result cells")
    // every IVF hit must appear in the full brute-force ranking with the
    // same cosine
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 1000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach { r =>
      assert(bf(r.getLong(0)) === r.getDouble(2))
    }
  }

  test("SRP candidates sit within maxHamming of the query bucket and rank by exact cosine") {
    val srp = Similarity.srpTopK(emb, "vec_id", "embedding", 0L, 10).collect()
    assert(srp.nonEmpty && srp.length <= 10)
    assert(!srp.exists(_.getLong(0) == 0L))
    // recover the query's bucket from the same pipeline
    val qb = Similarity.srpTopK(emb, "vec_id", "embedding", 0L, Int.MaxValue)
      .collect().map(_.getLong(1)).toSet
    srp.foreach { r =>
      assert(qb.contains(r.getLong(1))) // candidate buckets are the probed set
    }
    assert(qb.size <= 9, "8 planes, Hamming<=1 probes at most 9 buckets")
    val cos = srp.map(_.getDouble(2))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    // cosines must agree exactly with the brute-force ranking
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 1000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    srp.foreach(r => assert(bf(r.getLong(0)) === r.getDouble(2)))
  }

  test("SRP bucketing is deterministic across runs") {
    val a = Similarity.srpTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = Similarity.srpTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a === b)
  }

  test("cell assignment covers every vector exactly once") {
    val asg = Similarity.assignCells(emb, "vec_id", "embedding", 8)
    assert(asg.count() === emb.count())
    assert(asg.select("id").distinct().count() === emb.count())
  }
}
