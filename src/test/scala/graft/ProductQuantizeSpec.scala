package graft

import org.apache.spark.sql.functions._

import graft.sim.ProductQuantize

/** Product-quantization ANN (s8): exact recovery on separable
  * clustered data, partitioning invariance of training, the empty-seed
  * guard, and the ADC overestimate structure.
  */
class ProductQuantizeSpec extends SparkSpec {

  import spark.implicits._

  // 8 well-separated base patterns in 8 dims (one "hot" pair of dims
  // per pattern), 5 copies each: ids 0..7 are the 8 distinct patterns
  // (so the kcent=8 seed covers every pattern), ids 8..39 repeat them.
  private def clustered = (0 until 40).map { id =>
    val p = id % 8
    val v = Array.fill(8)(1.0f)
    v(p) = 100.0f
    (id.toLong, v.toSeq)
  }.toDF("vec_id", "embedding")

  test("copies of the query pattern rank first with exactly zero ADC distance") {
    val got = ProductQuantize.pqTopK(clustered, "vec_id", "embedding",
      queryId = 0L, k = 4, nsub = 4, kcent = 8, iters = 2).collect()
    // ids 8, 16, 24, 32 are the other copies of pattern 0: identical
    // vectors -> identical codes -> ADC distance 0 to the query's own
    // cell centroids (Lloyd converges each cell onto its pattern)
    assert(got.map(_.getLong(0)).toSet === Set(8L, 16L, 24L, 32L))
    got.foreach(r => assert(r.getDouble(1) === 0.0,
      s"copy ${r.getLong(0)} has nonzero ADC distance ${r.getDouble(1)}"))
  }

  test("training and encoding are partitioning-invariant") {
    val (_, codes1) = ProductQuantize.train(clustered.coalesce(1),
      "vec_id", "embedding", nsub = 4, kcent = 8, iters = 2)
    val (_, codes13) = ProductQuantize.train(clustered.repartition(13),
      "vec_id", "embedding", nsub = 4, kcent = 8, iters = 2)
    val a = codes1.orderBy("id", "sub").collect().map(_.toSeq)
    val b = codes13.orderBy("id", "sub").collect().map(_.toSeq)
    assert(a === b, "code assignment must not depend on partitioning")
  }

  test("every corpus vector encodes to nsub codes in [0, kcent)") {
    val (_, codes) = ProductQuantize.train(clustered, "vec_id", "embedding",
      nsub = 4, kcent = 8, iters = 1)
    val rows = codes.collect()
    assert(rows.length === 40 * 4)
    assert(rows.forall { r =>
      val c = r.getAs[Long]("cell"); c >= 0 && c < 8
    })
  }

  test("re-rank re-scores the ADC short list with exact distances") {
    // rerank window = whole corpus -> the result must equal brute-force
    // exact top-k on the int8-quantized representation
    val got = ProductQuantize.pqTopKRerank(clustered, "vec_id", "embedding",
      queryId = 0L, k = 4, rerank = 39, nsub = 4, kcent = 8, iters = 2)
      .collect()
    assert(got.map(_.getLong(0)).toSet === Set(8L, 16L, 24L, 32L))
    got.foreach(r => assert(r.getDouble(1) === 0.0,
      s"identical copy ${r.getLong(0)} must re-score to exact distance 0"))
    // a tight window must stay inside the ADC nomination: results of
    // rerank=k are a subset of the ADC top-k candidates
    val adc = ProductQuantize.pqTopK(clustered, "vec_id", "embedding",
      queryId = 0L, k = 6, nsub = 4, kcent = 8, iters = 2)
      .collect().map(_.getLong(0)).toSet
    val tight = ProductQuantize.pqTopKRerank(clustered, "vec_id", "embedding",
      queryId = 0L, k = 6, rerank = 6, nsub = 4, kcent = 8, iters = 2)
      .collect().map(_.getLong(0)).toSet
    assert(tight.subsetOf(adc), "re-rank may only reorder the short list")
  }

  test("re-rank plan broadcasts the candidate list, never the corpus") {
    val df = ProductQuantize.pqTopKRerank(clustered, "vec_id", "embedding",
      queryId = 0L, k = 4, rerank = 8, nsub = 4, kcent = 8, iters = 1)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin") || phys.contains("BroadcastNestedLoopJoin"),
      "candidate semi-join must be broadcast")
    // the corpus-sized relation must not sit under a broadcast exchange
    // feeding the candidate join: SortMergeJoin on id would mean a
    // corpus shuffle crept in
    assert(!phys.contains("SortMergeJoin"),
      s"corpus shuffle in the re-rank plan:\n$phys")
  }

  test("batched IVF-PQ routes each query to its pattern cell; copies score 0") {
    val queries = clustered.filter(col("vec_id") < 8)
    val got = ProductQuantize.ivfPqTopKAll(clustered, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 4, ncells = 8, nprobe = 1,
      nsub = 4, kcent = 8, iters = 2).collect()
    // each pattern query's own cell holds its 4 other copies, all at
    // ADC distance 0 (Lloyd converges each (sub, cell) onto its pattern)
    assert(got.length === 8 * 4)
    got.foreach { r =>
      assert(r.getLong(1) % 8 === r.getLong(0) % 8,
        s"query ${r.getLong(0)} matched another pattern's vector ${r.getLong(1)}")
      assert(r.getDouble(2) === 0.0)
    }
  }

  test("batched IVF-PQ: sort-merge fallback above the query gate is identical") {
    val queries = clustered.filter(col("vec_id") < 8)
    def run(maxQ: Long) = ProductQuantize.ivfPqTopKAll(clustered, "vec_id",
      "embedding", queries, "vec_id", "embedding", k = 3, ncells = 8,
      nprobe = 2, nsub = 4, kcent = 8, iters = 1,
      maxBroadcastQueries = maxQ)
      .orderBy("qid", "id").collect().map(_.toSeq)
    assert(run(1L << 16) === run(0L),
      "broadcast and merge-fallback paths must agree")
  }

  test("rerank window below k is rejected") {
    val ex = intercept[IllegalArgumentException] {
      ProductQuantize.pqTopKRerank(clustered, "vec_id", "embedding",
        queryId = 0L, k = 10, rerank = 5)
    }
    assert(ex.getMessage.contains("must be >= k"))
  }

  test("empty seed (ids not starting at 0) fails loudly") {
    val shifted = clustered.withColumn("vec_id", col("vec_id") + 1000L)
    val ex = intercept[IllegalArgumentException] {
      ProductQuantize.train(shifted, "vec_id", "embedding",
        nsub = 4, kcent = 8, iters = 1)
    }
    assert(ex.getMessage.contains("seed codebook is empty"))
  }
}
