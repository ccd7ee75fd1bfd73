package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.EventTimeChain

/** The chained event-time ingest (two stateful stages, one query —
  * VERDICT r10 #6 / r11 #6): admissions AND near-dup candidates must
  * be a pure function of the data under out-of-order replay.
  */
class EventTimeChainSpec extends SparkSpec {

  // transformWithState requires the RocksDB state store provider; set
  // it for this suite's queries (harmless for the shared session: the
  // conf only affects streaming state stores, and the other streaming
  // suites run fmGWS against whichever provider is configured).
  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def writeSlices(slices: Seq[org.apache.spark.sql.DataFrame],
      prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    slices.zipWithIndex.foreach { case (df, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"$prefix-s$i").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, f"$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
    }
    dir
  }

  test("chained event-time ingest: candidates are replay-deterministic and equal the batch twin") {
    withRocksDb {
      val docs = Tables.t(spark, sf, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("ts",
          timestamp_millis(lit(1700000000000L) + (col("doc_id") % 11) * 60000L))
      val (keepProbe, _) = graft.text.TextOps.qualityFilter(col("text"),
        requireTerminal = false)
      val keptText = docs.filter(keepProbe).orderBy("doc_id")
        .select("text").head().getString(0)
      import spark.implicits._
      // TWO far-future flush rows in separate trailing files: the first
      // advances the watermark past every real ts (stage 1 drains in
      // the no-data batch the engine grants that advance); the second
      // advances it once more so stage 2's chained watermark passes the
      // stage-1 emissions and ITS timers fire — the engine runs one
      // no-data batch per SOURCE watermark change, so a two-stage chain
      // needs two advances to drain fully. As the latest copies of
      // their fingerprint they can never displace a real admission.
      val flush = Seq((999999L, keptText)).toDF("doc_id", "text")
        .withColumn("ts", timestamp_millis(lit(1700000000000L + 86400000L)))
      val flush2 = Seq((999998L, keptText)).toDF("doc_id", "text")
        .withColumn("ts", timestamp_millis(lit(1700000000000L + 2 * 86400000L)))
      def slicesBy(mod: Int, rev: Boolean): Seq[org.apache.spark.sql.DataFrame] = {
        val data = (0 until mod).map(i => docs.filter(col("doc_id") % mod === i))
        (if (rev) data.reverse else data) :+ flush :+ flush2
      }
      def run(slices: Seq[org.apache.spark.sql.DataFrame], name: String)
          : Set[(Long, Long, Long)] = {
        val dir = writeSlices(slices, s"chain-$name")
        val schema = spark.read.parquet(dir).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
        val ckpt = java.nio.file.Files.createTempDirectory(s"chain-ck-$name").toString
        val q = EventTimeChain.chained(spark, stream.toDF(), "doc_id",
          "text", "ts", watermark = "2 hours", maxHamming = 4,
          requireTerminal = false)
          .writeStream
          .format("memory").queryName(name)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .filter(t => t._1 < 999998L && t._2 < 999998L).toSet
      }
      val got1 = run(slicesBy(3, rev = false), "chain_a")
      val got2 = run(slicesBy(4, rev = true), "chain_b")
      val batch = EventTimeChain.chainedBatch(docs, "doc_id", "text",
        "ts", maxHamming = 4, requireTerminal = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(t => t._1 < 999998L && t._2 < 999998L).toSet
      assert(batch.nonEmpty,
        "batch twin produced no candidates — the fixture has no near-dups")
      assert(got1 === batch, "slicing-A replay diverged from the batch twin")
      assert(got2 === batch, "slicing-B (reversed) replay diverged from the batch twin")
    }
  }

  test("chained ingest batch twin: candidates respect data order and the Hamming bound") {
    import spark.implicits._
    val t0 = 1700000000000L
    // family: three near-identical texts (small token edits) + one
    // unrelated; data order by (ts, id) — the canonical must always be
    // the EARLIEST admitted member of the bucket, never a later one
    val mk = (id: Long, ts: Long, txt: String) => (id, ts, txt)
    val rows = Seq(
      mk(5L, t0 + 3000, "the quick brown fox jumps over the lazy dog."),
      mk(2L, t0 + 1000, "the quick brown fox jumps over the lazy dog tonight."),
      mk(9L, t0 + 2000, "the quick brown fox jumps over the lazy cat."),
      mk(7L, t0 + 500, "completely different content about spark execution plans."))
      .toDF("doc_id", "ms", "text")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val got = EventTimeChain.chainedBatch(rows, "doc_id", "text", "ts",
      maxHamming = 30, requireTerminal = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 2 (t0+1000) is the family's earliest admitted member: every
    // candidate must name it (doc 7 is unrelated; with maxHamming=30
    // the family verifies, the unrelated text must not pair with all)
    assert(got.nonEmpty, "family produced no candidates")
    got.foreach { case (d, canon) =>
      assert(canon != d, "self-candidate")
      assert(Set(2L, 7L).contains(canon),
        s"candidate ($d -> $canon) names a non-earliest canonical")
    }
  }

  /** Kill-resume across the stage-1 / stage-2 seam (VERDICT r12 #8):
    * phase 1 runs the data plus ONE flush — the watermark advance
    * drains stage 1's admissions into stage 2's RocksDB pending lists,
    * but stage 2's chained watermark has not passed them, so the query
    * terminates (AvailableNow — the clean stand-in for a crash, same
    * recovery path: offsets + RocksDB state under the checkpoint)
    * holding candidates HOSTAGE in restored-state land. Phase 2 starts
    * a NEW query on the SAME checkpoint with the second flush
    * appended: it must resume from the recorded offsets, restore the
    * stage-2 representatives/pending lists from RocksDB, and drain —
    * the union of both phases' sink output must equal the batch twin
    * exactly, for random slicings. Memory-sink replay duplicates are
    * absorbed by the set compare (the sink is not fault-tolerant; the
    * STATE is what this test pins).
    */
  test("chained ingest: kill-resume across the stage-1/stage-2 seam equals the batch twin (3 corpora)") {
    withRocksDb {
      val docs = Tables.t(spark, sf, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("ts",
          timestamp_millis(lit(1700000000000L) + (col("doc_id") % 11) * 60000L))
      val (keepProbe, _) = graft.text.TextOps.qualityFilter(col("text"),
        requireTerminal = false)
      val keptText = docs.filter(keepProbe).orderBy("doc_id")
        .select("text").head().getString(0)
      import spark.implicits._
      val flush = Seq((999999L, keptText)).toDF("doc_id", "text")
        .withColumn("ts", timestamp_millis(lit(1700000000000L + 86400000L)))
      val flush2 = Seq((999998L, keptText)).toDF("doc_id", "text")
        .withColumn("ts", timestamp_millis(lit(1700000000000L + 2 * 86400000L)))
      val batch = EventTimeChain.chainedBatch(docs, "doc_id", "text",
        "ts", maxHamming = 4, requireTerminal = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(t => t._1 < 999998L && t._2 < 999998L).toSet
      assert(batch.nonEmpty, "batch twin empty — fixture has no near-dups")
      def appendSlice(dir: String, df: org.apache.spark.sql.DataFrame,
          idx: Int): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory(s"ckr-s$idx").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(dir, f"$idx%04d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + idx * 60000L)
      }
      for (seed <- 1 to 3) {
        val rnd = new scala.util.Random(7000 + seed)
        val mod = 2 + rnd.nextInt(3)
        val rev = rnd.nextBoolean()
        val data = (0 until mod).map(i => docs.filter(col("doc_id") % mod === i))
        val phase1 = (if (rev) data.reverse else data) :+ flush
        val dir = writeSlices(phase1, s"ckr-$seed")
        val schema = spark.read.parquet(dir).schema
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"ckr-ck-$seed").toString
        // the memory sink cannot recover from a checkpoint; the parquet
        // FILE sink can (its _spark_metadata commit log also makes the
        // two-phase output exactly-once, so the final read IS the union)
        val outDir = java.nio.file.Files
          .createTempDirectory(s"ckr-out-$seed").toString + "/out"
        def runPhase(): Set[(Long, Long, Long)] = {
          val stream = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(dir)
          val q = EventTimeChain.chained(spark, stream.toDF(), "doc_id",
            "text", "ts", watermark = "2 hours", maxHamming = 4,
            requireTerminal = false)
            .writeStream.format("parquet")
            .option("path", outDir)
            .option("checkpointLocation", ckpt)
            .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination(300000)
          spark.read.parquet(outDir).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            .filter(t => t._1 < 999998L && t._2 < 999998L).toSet
        }
        val got1 = runPhase()
        assert(got1 !== batch,
          s"seed $seed: phase 1 already drained everything — the kill " +
            "did not land on the stage-1/stage-2 seam")
        appendSlice(dir, flush2, phase1.size)
        val got2 = runPhase()
        assert((got2 -- got1).nonEmpty,
          s"seed $seed: the resumed query drained nothing — stage-2 " +
            "state was not restored from the checkpoint")
        assert(got2 === batch,
          s"seed $seed: kill-resume output diverged from the batch twin")
      }
    }
  }
}
