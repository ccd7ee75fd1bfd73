package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Doc

/** Fuzz the stateful streaming operators over seeded random corpora
  * with RANDOM batch splits (the ordered-replay specs in
  * StreamingOpsSpec pin the batch==stream equality; these pin the
  * operator's contract under arbitrary arrival order against an
  * independent per-batch simulator):
  *
  *  - ingest dedup, no TTL: first-SEEN fingerprint emits with the
  *    smallest doc_id of its first-sighting batch; every later copy is
  *    suppressed.
  *  - ingest dedup, long TTL: nothing expires inside the run, so the
  *    TTL code path (lastSeenMs bookkeeping, sliding re-arm, data-path
  *    expiry check) must be output-invisible — identical to no-TTL.
  *  - ingest dedup, always-expiring TTL: a 1 ms TTL with a 50 ms
  *    inter-batch gap deterministically lapses between batches, so the
  *    expected output is per-BATCH exact dedup (every batch's first
  *    sighting re-admits).
  *  - near-dup assignment, no TTL: per-bucket first-seen
  *    representative, candidates on verified Hamming, id-sorted
  *    within a batch — the simulator mirrors the banding arithmetic.
  */
class StreamingFuzzSpec extends SparkSpec {

  /** State-store work per micro-batch scales with shuffle partitions
    * (one delta file per partition per batch), and processing-time
    * timeout queries churn empty batches continuously between
    * addData calls — at the suite's 32 partitions the fuzz sweep is
    * minutes of checkpoint IO for kilobytes of data. Corpora are tiny,
    * so pin the stream queries to 2 partitions for this suite.
    */
  private def withFewPartitions[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Runs the batches through streamingDedup one micro-batch each.
    * With a TTL the query has a processing-time timeout, so
    * processAllAvailable never settles (the engine keeps scheduling
    * empty batches to fire expirations) — synchronization is instead
    * on the SINK COUNT reaching the simulator's cumulative expected
    * count for the batch (`expectCum`, required iff `ttl` is set).
    * Each addData lands after the previous batch committed, so every
    * addData is exactly one micro-batch either way.
    */
  private def runDedupStream(batches: Seq[Seq[(Long, String)]],
      ttl: Option[String], name: String, interBatchSleepMs: Long,
      expectCum: Seq[Int] = Nil): Set[(Long, String)] = {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Doc]
    val q = StreamingOps.streamingDedup(spark, ms.toDF(), ttl)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        if (interBatchSleepMs > 0) Thread.sleep(interBatchSleepMs)
        ms.addData(b.map { case (id, fp) => Doc(id, fp) })
        if (ttl.isEmpty) q.processAllAvailable()
        else {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (spark.table(name).count() < expectCum(i) &&
              System.nanoTime() < deadline && q.isActive)
            Thread.sleep(25)
        }
      }
    } finally { q.stop(); q.awaitTermination(60000) }
    spark.table(name).collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  /** Reference simulator: per-batch grouped arrival, global (or
    * per-batch, when every TTL lapses) first-sighting state.
    */
  private def simulateDedup(batches: Seq[Seq[(Long, String)]],
      expireBetweenBatches: Boolean): Seq[Set[(Long, String)]] = {
    val seen = mutable.Set[String]()
    val out = mutable.Set[(Long, String)]()
    batches.map { b =>
      if (expireBetweenBatches) seen.clear()
      b.groupBy(_._2).foreach { case (fp, rows) =>
        if (!seen.contains(fp)) { out += ((rows.map(_._1).min, fp)); seen += fp }
      }
      out.toSet
    }
  }

  private def genCorpus(seed: Int): Seq[Seq[(Long, String)]] = {
    val rnd = new scala.util.Random(seed)
    val n = 20 + rnd.nextInt(61)
    val nFps = 3 + rnd.nextInt(10)
    val docs = rnd.shuffle((0L until n.toLong).toVector)
      .map(id => (id, s"fp${rnd.nextInt(nFps)}"))
    val nBatches = 1 + rnd.nextInt(6)
    val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(n)).sorted :+ n
    (0 +: cuts).sliding(2).map { case Seq(a, b) => docs.slice(a, b) }
      .filter(_.nonEmpty).toSeq
  }

  test("fuzz: streaming ingest dedup matches the simulator on random splits (16 corpora)") {
    withFewPartitions {
      for (seed <- 1 to 16) {
        val batches = genCorpus(seed)
        val got = runDedupStream(batches, None, s"fz_dedup_$seed", 0L)
        val want = simulateDedup(batches, expireBetweenBatches = false).last
        assert(got === want, s"seed $seed diverged (no TTL)")
      }
    }
  }

  test("fuzz: a TTL longer than the run is output-invisible (4 corpora)") {
    withFewPartitions {
      for (seed <- 101 to 104) {
        val batches = genCorpus(seed)
        val sim = simulateDedup(batches, expireBetweenBatches = false)
        val got = runDedupStream(batches, Some("1 hour"), s"fz_long_$seed", 0L,
          expectCum = sim.map(_.size))
        assert(got === sim.last, s"seed $seed diverged (long TTL)")
      }
    }
  }

  test("fuzz: an always-lapsing TTL reduces to per-batch dedup (4 corpora)") {
    withFewPartitions {
      for (seed <- 201 to 204) {
        val batches = genCorpus(seed)
        val sim = simulateDedup(batches, expireBetweenBatches = true)
        val got = runDedupStream(batches, Some("1 millisecond"),
          s"fz_exp_$seed", 50L, expectCum = sim.map(_.size))
        assert(got === sim.last, s"seed $seed diverged (expiring TTL)")
      }
    }
  }

  // ---- near-dup assignment ----

  /** The band decomposition of Dedup.bandedSimhash, re-derived
    * independently (maxHamming+1 bands over 60 bits, first 60%nBands
    * bands one bit wider).
    */
  private def bandsOf(sim: Long, maxHamming: Int): Seq[(Int, Long)] = {
    val nBands = maxHamming + 1
    val base = 60 / nBands
    val extra = 60 % nBands
    val offsets = (0 until nBands).scanLeft(0)((acc, b) =>
      acc + base + (if (b < extra) 1 else 0))
    (0 until nBands).map { b =>
      val width = base + (if (b < extra) 1 else 0)
      (b, (sim >>> offsets(b)) & ((1L << width) - 1))
    }
  }

  private def simulateAssign(batches: Seq[Seq[(Long, Long)]],
      maxHamming: Int): Set[(Long, Long, Long)] = {
    val reps = mutable.Map[(Int, Long), (Long, Long)]()
    val out = mutable.Set[(Long, Long, Long)]()
    batches.foreach { b =>
      val byBucket = mutable.Map[(Int, Long), mutable.ArrayBuffer[(Long, Long)]]()
      b.foreach { case (id, sim) =>
        bandsOf(sim, maxHamming).foreach(bb =>
          byBucket.getOrElseUpdate(bb, mutable.ArrayBuffer()) += ((id, sim)))
      }
      byBucket.foreach { case (bb, ds) =>
        ds.sortBy(_._1).foreach { case (id, sim) =>
          reps.get(bb) match {
            case None => reps(bb) = (id, sim)
            case Some((rid, rsim)) =>
              val ham = java.lang.Long.bitCount(sim ^ rsim).toLong
              if (rid < id && ham <= maxHamming) out += ((id, rid, ham))
          }
        }
      }
    }
    out.toSet
  }

  /** The composed two-stage ingest under RANDOM batch splits. Out of
    * order, the stream may pick a later-id bucket representative than
    * batch mode (the documented trade), so the pin here is SOUNDNESS
    * + admission totality rather than batch equality:
    *  - every emitted candidate names two quality-passing docs whose
    *    contents differ (an exact dup can never be a candidate — its
    *    copy was suppressed upstream), verified Hamming <= k, and
    *    canonical arrived no later than doc within the stream order;
    *  - the candidate doc set never includes a suppressed copy.
    */
  test("fuzz: chained corpus ingest emits only sound candidates on random splits (6 corpora)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    withFewPartitions { for (seed <- 401 to 406) {
      val rnd = new scala.util.Random(seed)
      val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa")
      val n = 20 + rnd.nextInt(40)
      // quality-passing base texts (>=5 tokens) with exact-dup and
      // near-dup (one-word-swap) copies mixed in
      val texts = scala.collection.mutable.ArrayBuffer[String]()
      (0 until n).foreach { i =>
        if (i > 2 && rnd.nextDouble() < 0.3) texts += texts(rnd.nextInt(i)) // exact dup
        else if (i > 2 && rnd.nextDouble() < 0.3) { // near dup: swap one word
          val base = texts(rnd.nextInt(i)).split(" ")
          base(rnd.nextInt(base.length)) = words(rnd.nextInt(words.size))
          texts += base.mkString(" ")
        } else texts += Vector.fill(5 + rnd.nextInt(8))(
          words(rnd.nextInt(words.size))).mkString(" ")
      }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val nBatches = 1 + rnd.nextInt(5)
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(n)).sorted :+ n
      val batches = (0 +: cuts).sliding(2)
        .map { case Seq(a, b) => docs.slice(a, b) }.filter(_.nonEmpty).toSeq
      val ms = MemoryStream[(Long, String)]
      val q = StreamingOps.streamingCorpusIngest(spark,
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
        maxHamming = 6, requireTerminal = false)
        .writeStream.format("memory").queryName(s"fz_ci_$seed")
        .outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally { q.stop(); q.awaitTermination(60000) }
      val got = spark.table(s"fz_ci_$seed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // reference facts
      val text = docs.toMap
      val firstSeen = scala.collection.mutable.Map[String, Long]()
      docs.foreach { case (id, t) =>
        if (!firstSeen.contains(t)) firstSeen(t) = id }
      val admitted = docs.filter { case (id, t) => firstSeen(t) == id }
        .map(_._1).toSet
      got.foreach { case (d, c, ham) =>
        assert(c < d, s"seed $seed: canonical must have the smaller id")
        assert(admitted.contains(d) && admitted.contains(c),
          s"seed $seed: candidate names a suppressed copy ($d, $c)")
        assert(text(d) != text(c), s"seed $seed: exact dup leaked to near-dup stage")
        assert(ham <= 6, s"seed $seed: unverified candidate ham=$ham")
        val hd = java.lang.Long.bitCount(
          graft.dedup.Dedup.simhashKernel(text(d)) ^
          graft.dedup.Dedup.simhashKernel(text(c)))
        assert(hd.toLong === ham, s"seed $seed: reported hamming wrong")
      }
    } }
  }

  /** Event-time corpus ingest under RANDOM shuffles and batch splits:
    * with a watermark delay wider than the corpus's whole timestamp
    * span nothing is ever late, so determinism must be EXACT — the
    * admission set equals the batch twin (smallest (event time, id)
    * copy per distinct content) for EVERY arrival order, which is the
    * auditability property the event-time variant exists for. The
    * flush row reuses a real text at a far-future timestamp: it
    * advances the watermark past all real data and, as the LATEST copy
    * of its fingerprint, can never displace the true winner.
    */
  test("fuzz: event-time corpus ingest equals the batch twin on random replays (6 corpora)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    withFewPartitions { for (seed <- 501 to 506) {
      val rnd = new scala.util.Random(seed)
      val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa")
      val n = 20 + rnd.nextInt(40)
      val texts = scala.collection.mutable.ArrayBuffer[String]()
      (0 until n).foreach { i =>
        if (i > 2 && rnd.nextDouble() < 0.4) texts += texts(rnd.nextInt(i))
        else texts += Vector.fill(5 + rnd.nextInt(8))(
          words(rnd.nextInt(words.size))).mkString(" ")
      }
      val base = 1700000000000L
      // disorder up to 10 minutes; ties on ts break by id in both twins
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, new java.sql.Timestamp(base + rnd.nextInt(600000).toLong))
      }.toSeq
      val flush = (999999L, texts.head,
        new java.sql.Timestamp(base + 86400000L))
      val want = StreamingOps.streamingCorpusIngestEventTimeBatch(
          (docs :+ flush).toDF("doc_id", "text", "ts"),
          "doc_id", "text", "ts", requireTerminal = false)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val shuffled = rnd.shuffle(docs)
      val nBatches = 1 + rnd.nextInt(5)
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(n)).sorted :+ n
      val batches = (0 +: cuts).sliding(2)
        .map { case Seq(a, b) => shuffled.slice(a, b) }.filter(_.nonEmpty).toSeq
      val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = StreamingOps.streamingCorpusIngestEventTime(spark,
        ms.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
        watermark = "1 hour", requireTerminal = false)
        .writeStream.format("memory").queryName(s"fz_evt_$seed")
        .outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        ms.addData(Seq(flush)); q.processAllAvailable()
        // emissions ride the no-data batch AFTER the watermark advance;
        // processAllAvailable doesn't wait for it — poll to the twin size
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (spark.table(s"fz_evt_$seed").count() < want.size &&
            System.nanoTime() < deadline && q.isActive)
          Thread.sleep(25)
      } finally { q.stop(); q.awaitTermination(60000) }
      val got = spark.table(s"fz_evt_$seed").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === want, s"seed $seed diverged from the batch twin")
    } }
  }

  test("fuzz: streaming near-dup assignment matches the simulator on random splits (8 corpora)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    withFewPartitions { for (seed <- 301 to 308) {
      val rnd = new scala.util.Random(seed)
      val n = 15 + rnd.nextInt(46)
      // near-dup-rich signatures: a small pool of 60-bit bases, each
      // doc flips 0-3 random bits of one base
      val nBases = 2 + rnd.nextInt(5)
      val bases = Vector.fill(nBases)(rnd.nextLong() & ((1L << 60) - 1))
      val docs = rnd.shuffle((0L until n.toLong).toVector).map { id =>
        var s = bases(rnd.nextInt(nBases))
        (0 until rnd.nextInt(4)).foreach(_ => s ^= 1L << rnd.nextInt(60))
        (id, s)
      }
      val nBatches = 1 + rnd.nextInt(5)
      val cuts = Vector.fill(nBatches - 1)(rnd.nextInt(n)).sorted :+ n
      val batches = (0 +: cuts).sliding(2)
        .map { case Seq(a, b) => docs.slice(a, b) }.filter(_.nonEmpty).toSeq
      val maxHamming = 1 + rnd.nextInt(4)
      val ms = MemoryStream[(Long, Long)]
      val q = StreamingOps.streamingNearDupAssign(spark,
        ms.toDF().toDF("doc_id", "simhash"), maxHamming)
        .writeStream.format("memory").queryName(s"fz_nd_$seed")
        .outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally { q.stop(); q.awaitTermination(60000) }
      val got = spark.table(s"fz_nd_$seed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = simulateAssign(batches, maxHamming)
      assert(got === want, s"seed $seed diverged (maxHamming=$maxHamming)")
    } }
  }

  test("fuzz: streaming stratified sample converges to batch t12 on random splits (8 corpora)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    withFewPartitions { for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(900 + seed)
      val strata = Seq("en", "fr", "de", "ja")
      val n = 40 + rnd.nextInt(60)
      // duplicates included on purpose: replayed ids must be idempotent
      val corpus = (0 until n).map { _ =>
        (strata(rnd.nextInt(strata.length)), rnd.nextInt(n / 2).toLong)
      }
      val batches = {
        val shuffled = rnd.shuffle(corpus)
        val nb = 2 + rnd.nextInt(4)
        val cuts = (Seq(0, shuffled.length) ++
          Seq.fill(nb - 1)(rnd.nextInt(shuffled.length + 1))).sorted
        cuts.zip(cuts.tail).map { case (a, b) => shuffled.slice(a, b) }
          .filter(_.nonEmpty)
      }
      val k = 1 + rnd.nextInt(5)
      val got = scala.collection.concurrent.TrieMap[String, Seq[Long]]()
      val ms = MemoryStream[(String, Long)]
      val q = StreamingOps.streamingStratifiedSample(
          spark, ms.toDS().toDF("strata", "id"), "id", "strata", k, seed = 11)
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[StreamingOps.StratumSample],
              _: Long) =>
            df.collect().foreach(s => got(s.strata) = s.ids)
        }.start()
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally { q.stop(); q.awaitTermination(60000) }
      val want = StreamingOps.streamingStratifiedSampleBatch(
          corpus.toDF("strata", "id"), "id", "strata", k, seed = 11)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got.toMap === want, s"seed $seed diverged (k=$k)")
    } }
  }

  test("fuzz: streaming KMV distinct converges to the batch aggregate on random splits (6 corpora)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    withFewPartitions { for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(7700 + seed)
      val keys = Seq("src0", "src1", "src2")
      val n = 60 + rnd.nextInt(120)
      // heavy duplication on purpose: the sketch must be replay-proof
      val rows = (0 until n).map { _ =>
        (keys(rnd.nextInt(keys.length)),
          (rnd.nextLong() & ((1L << 60) - 1)) % 40 + 1)
      }
      val batches = {
        val shuffled = rnd.shuffle(rows)
        val nb = 2 + rnd.nextInt(4)
        val cuts = (Seq(0, shuffled.length) ++
          Seq.fill(nb - 1)(rnd.nextInt(shuffled.length + 1))).sorted
        cuts.zip(cuts.tail).map { case (a, b) => shuffled.slice(a, b) }
          .filter(_.nonEmpty)
      }
      val k = 2 + rnd.nextInt(15)
      val got = scala.collection.concurrent.TrieMap[String, Double]()
      val ms = MemoryStream[(String, Long)]
      val q = StreamingOps.streamingKmvDistinct(
          spark, ms.toDS().toDF("key", "hv"), k)
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[StreamingOps.KeyEstimate],
              _: Long) =>
            df.collect().foreach(e => got(e.key) = e.est)
        }.start()
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally { q.stop(); q.awaitTermination(60000) }
      val want = StreamingOps.streamingKmvDistinctBatch(
          rows.toDF("key", "hv"), k)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.toMap === want, s"seed $seed diverged (k=$k)")
    } }
  }

  test("fuzz: streaming CMS grid converges to the batch aggregate on random splits (6 corpora)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    withFewPartitions { for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(8800 + seed)
      val keys = Seq("src0", "src1", "src2")
      val depth = 1 + rnd.nextInt(4)
      val width = 4 + rnd.nextInt(29)
      val n = 60 + rnd.nextInt(120)
      // skewed bucket draws: counter sums must be replay-proof
      val rows = (0 until n).map { _ =>
        (keys(rnd.nextInt(keys.length)),
          Seq.fill(depth)(rnd.nextInt(rnd.nextInt(width) + 1).toLong))
      }
      val batches = {
        val shuffled = rnd.shuffle(rows)
        val nb = 2 + rnd.nextInt(4)
        val cuts = (Seq(0, shuffled.length) ++
          Seq.fill(nb - 1)(rnd.nextInt(shuffled.length + 1))).sorted
        cuts.zip(cuts.tail).map { case (a, b) => shuffled.slice(a, b) }
          .filter(_.nonEmpty)
      }
      val got = scala.collection.concurrent.TrieMap[String, Seq[Long]]()
      val ms = MemoryStream[(String, Seq[Long])]
      val q = StreamingOps.streamingCmsSketch(
          spark, ms.toDS().toDF("key", "bk"), depth, width)
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[StreamingOps.KeyGrid],
              _: Long) =>
            df.collect().foreach(e => got(e.key) = e.grid)
        }.start()
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally { q.stop(); q.awaitTermination(60000) }
      val want = StreamingOps.streamingCmsSketchBatch(
          rows.toDF("key", "bk"), depth, width)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got.toMap === want,
        s"seed $seed diverged (depth=$depth width=$width)")
    } }
  }
}
