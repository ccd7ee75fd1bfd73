package graft

import org.apache.spark.sql.functions._

import graft.text.Sampling

/** Deterministic split assignment and stratified sampling (the p2/t12
  * operators): determinism and growth-stability properties, and the
  * scale shape of the salted two-phase top-k.
  */
class SamplingSpec extends SparkSpec {

  private lazy val documents = Tables.t(spark, sf, "documents")

  test("assignSplits: partition of the corpus, weights realized at bucket resolution") {
    val out = Sampling.assignSplits(documents, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      seed = 7, granularity = 1000).cache()
    try {
      val n = documents.count()
      assert(out.count() === n, "split assignment must not drop or dup rows")
      val counts = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.keySet === Set("train", "val", "test"))
      // hash uniformity at n=500: generous band, just pins the
      // apportionment isn't wildly off (binomial sd ~ 0.013)
      val trainFrac = counts("train").toDouble / n
      assert(trainFrac > 0.8 && trainFrac < 0.97, s"train frac $trainFrac")
    } finally out.unpersist()
  }

  test("assignSplits: a document's split is stable under corpus growth") {
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val full = Sampling.assignSplits(documents, "doc_id", splits, seed = 7)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // same assignment computed over HALF the corpus: every shared doc
    // keeps its split (the anti-rand() property)
    val half = Sampling.assignSplits(
      documents.filter(col("doc_id") % 2 === 0), "doc_id", splits, seed = 7)
      .select("doc_id", "split").collect()
    assert(half.nonEmpty)
    half.foreach { r =>
      assert(full(r.getLong(0)) === r.getString(1),
        s"doc ${r.getLong(0)} changed split when the corpus shrank")
    }
  }

  test("stratifiedSample: equals the direct per-stratum top-k and is salt-invariant") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Hashing
    val direct = documents
      .select(col("lang").as("strata"), col("doc_id").as("id"))
      .withColumn("hkey", Hashing.hash60(col("id").cast("string"), 3))
      .withColumn("rk", row_number().over(
        Window.partitionBy("strata").orderBy("hkey", "id")))
      .filter(col("rk") <= 5)
      .select("strata", "id", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    for (salts <- Seq(1, 8, 32)) {
      val got = Sampling.stratifiedSample(documents, "doc_id", "lang",
        k = 5, seed = 3, salts = salts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === direct, s"salts=$salts diverged from the direct top-k")
    }
  }

  test("stratifiedSample plan: no window partitioned by the bare stratum over the full input") {
    // the scale claim: the only full-input window runs on
    // (strata, salt); the bare-strata window sees only <= k*salts
    // pre-filtered survivors. Pin it structurally: the physical plan's
    // first (bottom-most) Window operator must carry both partition
    // keys.
    // the optimized LOGICAL plan (AQE wraps the physical plan until
    // execution); collect is top-down, so the LAST window is the
    // phase-1 (full-input) one and must include the salt key
    val plan = Sampling.stratifiedSample(documents, "doc_id", "lang",
      k = 5, seed = 3, salts = 8)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.map(_.toString)
    }
    assert(windows.size === 2, s"expected 2 windows, got ${windows.size}")
    val phase1 = windows.last
    assert(phase1.size === 2,
      s"phase-1 window must partition by (strata, salt), got $phase1")
  }

  test("mixtureSample: rate-1 keeps all, rate-0 drops all, default applies, bands realized") {
    val rates = Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    val out = Sampling.mixtureSample(documents, "doc_id", "source",
      rates, defaultRate = 0.1, seed = 17).cache()
    try {
      val bySrc = out.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val totals = documents.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySrc("src0") === totals("src0"), "rate 1.0 must keep every doc")
      assert(!bySrc.contains("src2"), "rate 0.0 must drop the source entirely")
      // 25-doc strata: generous binomial bands, just pin the apportionment
      val f1 = bySrc.getOrElse("src1", 0L).toDouble / totals("src1")
      assert(f1 > 0.2 && f1 < 0.8, s"src1 realized rate $f1")
      val defKept = bySrc.filterNot(kv => rates.exists(_._1 == kv._1)).values.sum
      val defTotal = totals.filterNot(kv => rates.exists(_._1 == kv._1)).values.sum
      val fd = defKept.toDouble / defTotal
      assert(fd > 0.02 && fd < 0.25, s"default realized rate $fd")
    } finally out.unpersist()
  }

  test("mixtureSample: a document's keep decision is stable under corpus growth") {
    val rates = Seq("src0" -> 0.7, "src1" -> 0.3)
    def kept(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.mixtureSample(df, "doc_id", "source", rates,
        defaultRate = 0.2, seed = 5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val full = kept(documents)
    val halfIds = documents.filter(col("doc_id") % 2 === 0)
    val half = kept(halfIds)
    val halfSet = halfIds.select("doc_id").collect().map(_.getLong(0)).toSet
    // growing the corpus never flips an existing doc's decision
    assert(half === full.intersect(halfSet))
  }

  test("weightedSample: deterministic, partitioning-invariant, weight-biased") {
    import graft.text.Sampling
    import spark.implicits._
    // 500 heavy (w=200) + 500 light (w=2) docs
    val docs = (0L until 1000L).map(id =>
      (id, if (id < 500) 200.0 else 2.0)).toDF("doc_id", "wt")
    val a = Sampling.weightedSample(docs, "doc_id", col("wt"), 100, seed = 5)
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.weightedSample(docs.repartition(13), "doc_id",
      col("wt"), 100, seed = 5).collect().map(_.getLong(0)).toSeq
    assert(a === b, "sample must not depend on partitioning")
    // E-S guarantee: P(select) proportional to weight — with a 100:1
    // weight ratio the 100-doc sample is overwhelmingly heavy docs
    val heavy = a.count(_ < 500L)
    assert(heavy >= 90, s"only $heavy/100 heavy docs at a 100:1 weight ratio")
  }

  test("weightedSample: non-positive weights are never drawn; k caps output") {
    import graft.text.Sampling
    import spark.implicits._
    val docs = (0L until 50L).map(id =>
      (id, if (id % 2 == 0) 1.0 else 0.0)).toDF("doc_id", "wt")
    val got = Sampling.weightedSample(docs, "doc_id", col("wt"), 100)
      .collect()
    assert(got.length === 25, "only the 25 positive-weight docs are drawable")
    assert(got.forall(_.getLong(0) % 2 == 0))
    assert(Sampling.weightedSample(docs, "doc_id", col("wt"), 10)
      .count() === 10L)
  }

  test("weightedSample plan: top-k heap, never a global sort") {
    import graft.text.Sampling
    import spark.implicits._
    val docs = (0L until 100L).map(id => (id, 1.0)).toDF("doc_id", "wt")
    val phys = Sampling.weightedSample(docs, "doc_id", col("wt"), 5)
      .queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"orderBy+limit must plan as TakeOrdered:\n$phys")
  }
}
