// dev scratch (VERDICT r15 next #2): Finding 9 showed the per-block
// host-speed calibration catches CPU-frequency drift but NOT
// IO/page-cache/co-tenant drift — two quiet blocks 90 minutes apart on
// near-identical code moved 10-40% per query with CPU calibrations
// within 7%. So a cross-round per-query delta is not evidence. This
// harness makes a perf claim PAIRED instead: the two variants alternate
// rep-by-rep in ONE session (A-then-B on even pairs, B-then-A on odd
// pairs, so a linear host-speed slope cancels out of the paired delta),
// cache cleared before every rep, and the claim is the median of
// per-pair deltas — host state moves both sides of each pair together.
//
// Experiments are registered by name; each takes the table dir. First
// registered claim (r16): the d17 pair-family refusal pre-flight, exact
// full-corpus census (the r15 shape, 136.6 s at sf100) vs the sampled
// 1/r probe (the r16 shape).
// Usage: runMain graft.tools.ABBench <experiment> [sfDir] [reps]
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ABBench {

  /** Interleaved paired comparison; prints per-rep times and the
    * paired-median summary line.
    */
  def paired(label: String, aName: String, bName: String, reps: Int,
      clear: () => Unit)(a: () => Unit, b: () => Unit): Unit = {
    def t(f: () => Unit): Double = {
      clear()
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    val ta = Array.ofDim[Double](reps)
    val tb = Array.ofDim[Double](reps)
    for (i <- 0 until reps) {
      if (i % 2 == 0) { ta(i) = t(a); tb(i) = t(b) }
      else { tb(i) = t(b); ta(i) = t(a) }
      println(f"[ab] $label rep$i $aName=${ta(i)}%.2f s $bName=${tb(i)}%.2f s " +
        f"delta=${ta(i) - tb(i)}%+.2f s")
    }
    def med(x: Array[Double]) = x.sorted.apply(x.length / 2)
    val deltas = Array.tabulate(reps)(i => ta(i) - tb(i))
    println(f"[ab] $label PAIRED: median($aName)=${med(ta)}%.2f s " +
      f"median($bName)=${med(tb)}%.2f s " +
      f"median-paired-delta=${med(deltas)}%+.2f s ($aName minus $bName)")
  }

  def main(args: Array[String]): Unit = {
    val exp = args.headOption.getOrElse("d17preflight")
    val dir = if (args.length > 1) args(1) else "/tmp/sf10"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val clear = () => spark.sharedState.cacheManager.clearCache()

    exp match {
      case "d17preflight" =>
        val docs = graft.Tables.t(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
        docs.count() // warm IO/footers once, outside the pairs
        import graft.dedup.Dedup
        // A: the r15 exact pre-flight sequence — full-corpus shingle +
        // explode + rarity rank + census (rebuilt inline from the same
        // public kernel the operator uses; Dedup's scaffolding is
        // private, and the point is to time the SHAPE, which the spec
        // pins equal at DedupSpec "pair-volume pre-flight")
        val exactCensus = () => {
          import org.apache.spark.sql.expressions.Window
          val sets = docs.select(col("doc_id").as("id"),
              Dedup.hashedShingles(col("text")).as("sh"))
            .filter(size(col("sh")) > 0)
            .select(col("id"), col("sh"), size(col("sh")).as("nsh"))
            .cache()
          try {
            val ex = sets.select(col("id"), col("nsh"),
              explode(col("sh")).as("g"))
            val freq = ex.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
            val pref = ex.join(freq, "g")
              .withColumn("rn", row_number().over(
                Window.partitionBy(col("id")).orderBy(col("cnt"), col("g"))))
              .filter(col("rn") <= (col("nsh") - ceil(col("nsh") * 0.5) + 1) &&
                col("cnt") >= 2)
              .select(col("id"), col("nsh"), col("g"), col("rn"))
            val est = Dedup.viralEstimateD(pref, None)
            println(f"    exact est=$est%.4g")
          } finally { sets.unpersist(); () }
        }
        // B: the r16 sampled probe at the operator's own rate
        val sampledProbe = () => {
          val r = Dedup.preflightRate(docs)
          val est = Dedup.sampledViralEstimateD(docs, "doc_id", "text",
            0.5, 3, oneSided = false, r)
          println(f"    sampled est=$est%.4g (probe rate 1/$r)")
        }
        println(s"[ab] d17preflight dir=$dir reps=$reps " +
          s"scanBytes=${graft.ScanBytes.of(docs)}")
        paired("d17preflight", "exact", "sampled", reps, clear)(
          exactCensus, sampledProbe)
      case "foreststars" =>
        // VERDICT r15 next #5: does the component-incremental star
        // kernel cut the forest stage's slope on the planted-viral
        // corpus? A = the retained all-pairs kernel, B = the r16
        // kernel, run over the SAME banded relation (band + shuffle
        // cost identical on both sides — the paired delta isolates the
        // kernel). Family sizes = args(3) CSV (sysprops do not cross
        // the forked run JVM), default 30000,100000; equality of
        // output star counts asserted per family size.
        import graft.dedup.Dedup
        val fams = args.lift(3).getOrElse("30000,100000")
          .split(",").map(_.trim.toInt).toSeq
        val docs = graft.Tables.t(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
        val seedText = docs.filter(col("doc_id") === 0L)
          .select(col("text")).head().getString(0)
        fams.foreach { fam =>
          val viral = spark.range(fam)
            .select((col("id") + 900000000L).as("doc_id"),
              lit(seedText).as("text"))
          val corpus = docs.unionByName(viral)
          val sets = Dedup.signedSets(corpus, "doc_id", "text", 12, 3)
          sets.count() // materialize the shared front-end outside the pairs
          // review r16: the plain clear() wiped the front-end cache too,
          // so every timed arm silently re-paid the signature build.
          // Per-rep hygiene here = wipe everything, then re-pin the
          // shared front-end OUTSIDE the timed window — the paired delta
          // already isolated the kernel (both arms paid equally), but
          // the per-arm absolutes now time band+kernel only.
          val clearKeepFront = () => {
            clear(); sets.cache(); sets.count(); ()
          }
          val bandKeys = (0 until 4).map { b =>
            xxhash64((lit(b) +: (0 until 3).map(r =>
              col("sig")(b * 3 + r))): _*)
          }
          val banded = sets
            .select(col("id").cast("long").as("id"), col("nsh"), col("shd"),
              explode(array(bandKeys: _*)).as("bkey"))
            .select(col("bkey"), col("id"), col("nsh"), col("shd"))
          import spark.implicits._
          def viaKernel(k: (Iterator[(Long, Long, Int, Array[Long])], Double)
              => Iterator[(Long, Long)]): Long =
            banded.as[(Long, Long, Int, Array[Long])]
              .groupByKey(_._1)
              .flatMapGroups((_: Long,
                  it: Iterator[(Long, Long, Int, Array[Long])]) => k(it, 0.7))
              .toDF("d1", "d2").distinct().count()
          var nA = -1L; var nB = -1L
          paired(s"foreststars(fam=$fam)", "allpairs", "incremental",
            reps, clearKeepFront)(
            () => { nA = viaKernel(Dedup.lshBucketStarsNaive) },
            () => { nB = viaKernel(Dedup.lshBucketStars) })
          println(s"[ab] foreststars fam=$fam stars: allpairs=$nA " +
            s"incremental=$nB ${if (nA == nB) "EXACT" else "MISMATCH"}")
          sets.unpersist()
        }
      case "cellstars" =>
        // the embedding twin of foreststars: a planted viral vector
        // family concentrates in ONE IVF cell (identical vectors share
        // a nearest centroid) — the exact case semanticDedup's star
        // forest exists for, and the kernel whose mega-cell behavior
        // has NO refusal to hide behind. A = all-pairs kernel, B =
        // component-incremental; assignment shared, star counts
        // asserted equal.
        import graft.dedup.Dedup
        val fams = args.lift(3).getOrElse("30000,100000")
          .split(",").map(_.trim.toInt).toSeq
        val emb = graft.Tables.t(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val seedVec = emb.filter(col("vec_id") === 0L)
          .select(col("embedding")).head().getSeq[Float](0).toArray
        fams.foreach { fam =>
          val viral = spark.range(fam)
            .select((col("id") + 900000000L).as("vec_id"),
              typedLit(seedVec).as("embedding"))
          val corpus = emb.unionByName(viral)
          val cells = graft.sim.Similarity.autoCells(corpus, "vec_id")
          val assigned = graft.sim.Similarity
            .assignCells(corpus, "vec_id", "embedding", cells)
            .withColumn("nrm", sqrt(graft.dedup.Vec.dot(col("v"), col("v"))))
            .filter(col("nrm") > 0.0)
            .select(col("cell"), col("id").cast("long").as("id"),
              col("v"), col("nrm"))
            .cache()
          assigned.count() // materialize the shared assignment
          // same review-r16 fix as foreststars: keep the shared
          // assignment warm outside the timed window
          val clearKeepFront = () => {
            clear(); assigned.cache(); assigned.count(); ()
          }
          import spark.implicits._
          def viaKernel(k: (Iterator[(Long, Long, Array[Double], Double)],
              Double) => Iterator[(Long, Long)]): Long =
            assigned.as[(Long, Long, Array[Double], Double)]
              .groupByKey(_._1)
              .flatMapGroups((_: Long,
                  it: Iterator[(Long, Long, Array[Double], Double)]) =>
                k(it, 0.4))
              .toDF("d1", "d2").count()
          var nA = -1L; var nB = -1L
          paired(s"cellstars(fam=$fam)", "allpairs", "incremental",
            reps, clearKeepFront)(
            () => { nA = viaKernel(Dedup.cellStarsNaive) },
            () => { nB = viaKernel(Dedup.cellStars) })
          println(s"[ab] cellstars fam=$fam cells=$cells stars: " +
            s"allpairs=$nA incremental=$nB " +
            (if (nA == nB) "EXACT" else "MISMATCH"))
          assigned.unpersist()
        }
      case "d6preflight" =>
        // r17: the embedding twin of d17preflight. A planted viral
        // vector family (identical vectors -> one IVF cell) makes the
        // exact worst-cell census pay the FULL corpus assignment
        // before refusing; the sampled stage assigns only a 1/r probe
        // under the same full-corpus seed and scales by r^2. A =
        // exact census statistic, B = the probe at the operator's own
        // rate; estimates printed so the 3x-band agreement is visible
        // at stress scale, not just in the unit spec.
        import graft.dedup.Dedup
        val fam = args.lift(3).getOrElse("300000").toInt
        val emb = graft.Tables.t(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val seedVec = emb.filter(col("vec_id") === 0L)
          .select(col("embedding")).head().getSeq[Float](0).toArray
        val viral = spark.range(fam)
          .select((col("id") + 900000000L).as("vec_id"),
            typedLit(seedVec).as("embedding"))
        val corpus = emb.unionByName(viral)
        val cells = graft.sim.Similarity.autoCells(corpus, "vec_id")
        val rate = Dedup.preflightRate(corpus)
        println(s"[ab] d6preflight dir=$dir fam=$fam cells=$cells " +
          s"rate=1/$rate scanBytes=${graft.ScanBytes.of(corpus)}")
        val clearAll = () => {
          clear(); graft.sim.Similarity.clearIdStatsCache()
          graft.sim.Similarity.clearCentroidCache()
        }
        val exactCensus = () => {
          val w = graft.sim.Similarity
            .assignCells(corpus, "vec_id", "embedding", cells)
            .groupBy(col("cell"))
            .agg(count(lit(1)).cast("double").as("n"))
            .agg(coalesce(max(col("n") * (col("n") - 1) / 2), lit(0.0d)))
            .head().getDouble(0)
          println(f"    exact worst=$w%.4g")
        }
        val sampledProbe = () => {
          val est = Dedup.sampledWorstCellD(corpus, "vec_id",
            "embedding", cells, rate)
          println(f"    probe est=$est%.4g (rate 1/$rate)")
        }
        paired("d6preflight", "exact", "sampled", reps, clearAll)(
          exactCensus, sampledProbe)
      case "scanfloor" =>
        // context for the pre-flight latency: the sampled probe's cost
        // floor is one pass over the text column (the row-hash sample
        // predicate is content-independent by design, hence not
        // parquet-pushable). Times, per rep: (a) a full text-column
        // scan (sum of lengths — no shingling), (b) scan + hash-sample
        // + count, (c) the full sampled probe at the operator's rate.
        import graft.dedup.Dedup
        val docs = graft.Tables.t(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
        val r = Dedup.preflightRate(docs)
        def t(name: String)(f: => Unit): Unit = {
          clear()
          val t0 = System.nanoTime(); f
          println(f"[ab] scanfloor $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        }
        println(s"[ab] scanfloor dir=$dir rate=1/$r " +
          s"scanBytes=${graft.ScanBytes.of(docs)}")
        for (_ <- 0 until reps) {
          t("text scan (sum length)") {
            docs.agg(sum(length(col("text")))).head(); ()
          }
          t("scan + hash-sample count") {
            docs.where(Dedup.sampleKeep("doc_id", r)).count(); ()
          }
          t("full sampled probe") {
            Dedup.sampledViralEstimateD(docs, "doc_id", "text", 0.5, 3,
              oneSided = false, r); ()
          }
        }
      case "cellassign" =>
        // r17 (commit "map-only IVF cell assignment"): A = the former
        // broadcast-join + groupBy(id) min_by shape (assignCellsJoin),
        // B = the NearestCell expression arm (assignCells). Both arms
        // are forced end-to-end by the same sum(cell) aggregate, whose
        // value doubles as an arms-equality checksum. A per-rep
        // shuffle-write meter exhibits the exchange the rewrite
        // removes (B should be ~0: map-only above the scan).
        import graft.sim.Similarity
        val emb = graft.Tables.t(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val cells = Similarity.autoCells(emb, "vec_id")
        val sw = new java.util.concurrent.atomic.AtomicLong(0)
        val lst = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            sw.addAndGet(
              s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
            ()
          }
        }
        spark.sparkContext.addSparkListener(lst)
        println(s"[ab] cellassign dir=$dir cells=$cells rows=${emb.count()}")
        val clearCell = () => {
          clear(); Similarity.clearIdStatsCache()
          Similarity.clearCentroidCache()
        }
        def force(arm: String)(
            f: => org.apache.spark.sql.DataFrame): Unit = {
          sw.set(0)
          val s = f.agg(sum(col("cell"))).head().getLong(0)
          Thread.sleep(300) // listener settle; symmetric across arms
          println(s"[ab] cellassign $arm sum(cell)=$s " +
            s"shuffleWriteBytes=${sw.get()}")
        }
        paired("cellassign", "join", "expr", reps, clearCell)(
          () => force("join")(Similarity.assignCellsJoin(
            emb, "vec_id", "embedding", cells)),
          () => force("expr")(Similarity.assignCells(
            emb, "vec_id", "embedding", cells)))
      case other =>
        System.err.println(s"unknown experiment: $other " +
          "(known: d17preflight, foreststars, scanfloor, cellassign)")
        sys.exit(2)
    }
    spark.stop()
  }
}
