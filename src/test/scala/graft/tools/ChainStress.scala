// dev scratch (SCALE_r14, VERDICT r13 #7): the chained two-stage
// event-time ingest at a realistic decade — sf10 documents (500k)
// through the transformWithState chain with RocksDB state, measuring
// drain wall, per-stage output, checkpoint/state-store size, and
// batch-twin agreement on the candidate count.
// Usage: runMain graft.tools.ChainStress [sfDir] [slices]
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
object ChainStress {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val slices = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def du(path: String): Long = {
      val root = new java.io.File(path)
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(root)
    }
    // event time derived deterministically from doc_id: one day of
    // data, ~5.8k docs/second-bucket at sf10 — well inside the 2h
    // watermark, so admission order is data-defined, not file-defined
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        timestamp_millis(lit(1700000000000L) +
          (col("doc_id") % 86400L) * 1000L).as("ts"))
    val inDir = java.nio.file.Files.createTempDirectory("chain-sf10-in").toString
    // slice by TIME BAND (86400/slices seconds each, written in band
    // order so the file source's modification-time ordering replays
    // them in band order): within-band disorder (72 min at 20 slices)
    // stays under the 2 h watermark bound the chain is contracted
    // for — id-stripe slicing would put the whole day in every slice,
    // drop most rows as late, and diverge from the batch twin by
    // DESIGN, not by bug. The flush files below then advance the
    // two-stage watermark past the last band.
    val bandSec = 86400L / slices
    (0 until slices).foreach { i =>
      // last band open-ended: when slices does not divide 86400 the
      // truncated bandSec would strand the day's tail in a band index
      // no writer iteration matches (review catch)
      val band = floor((col("doc_id") % 86400L) / bandSec)
      docs.filter(if (i == slices - 1) band >= i else band === i)
        .coalesce(1).write.parquet(f"$inDir/s$i%03d")
    }
    // THREE flushes a day apart: each stateful stage trails the source
    // watermark by one advance AND its drain horizon by the 2 h delay,
    // so a finite AvailableNow drain of a full-day span needs flush k+1
    // for stage-2 entries stranded in the last (delay) window of flush
    // k's horizon (first run: two flushes left the [20h, 24h) original-
    // ts tail undrained — 9,879 of 121,990 pairs missing; a continuous
    // stream has no such cliff, its watermark keeps advancing)
    val keptText = "the corpus flush sentinel document is long enough ."
    Seq((999999999L, keptText, 1700000000000L + 86400000L),
        (999999998L, keptText, 1700000000000L + 2 * 86400000L),
        (999999997L, keptText, 1700000000000L + 3 * 86400000L))
      .zipWithIndex.foreach { case ((id, tx, ms), i) =>
        spark.range(1).select(lit(id).as("doc_id"), lit(tx).as("text"),
          timestamp_millis(lit(ms)).as("ts"))
          .write.parquet(s"$inDir/zz$i")
      }
    val schema = spark.read.parquet(s"$inDir/s000").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/*")
    val ckpt = java.nio.file.Files.createTempDirectory("chain-sf10-ck").toString
    val t0 = System.nanoTime()
    val q = graft.streaming.EventTimeChain.chained(spark, stream.toDF(),
        "doc_id", "text", "ts", watermark = "2 hours", maxHamming = 4,
        requireTerminal = false)
      .writeStream.format("memory").queryName("chain_sf10")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(3600000)
    val wall = (System.nanoTime() - t0) / 1e9
    q.recentProgress.foreach { p =>
      println(s"[c.batch] id=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${Option(p.eventTime).map(_.get("watermark")).orNull} " +
        s"state=${p.stateOperators.map(s =>
          s"${s.operatorName}:rows=${s.numRowsTotal},upd=${s.numRowsUpdated}").mkString(" | ")}")
    }
    println(s"[c] raw memory-sink rows = ${spark.table("chain_sf10").count()}")
    val got = spark.table("chain_sf10")
      .filter(col("doc_id") < 999999997L && col("canonical") < 999999997L)
    val nGot = got.count()
    println(f"[c] stream drain: $wall%.1f s, candidates = $nGot, " +
      s"checkpoint = ${du(ckpt) / (1 << 20)} MB (state = " +
      s"${du(s"$ckpt/state") / (1 << 20)} MB)")
    val t1 = System.nanoTime()
    val batch = graft.streaming.EventTimeChain.chainedBatch(docs,
        "doc_id", "text", "ts", maxHamming = 4, requireTerminal = false)
      .filter(col("doc_id") < 999999997L && col("canonical") < 999999997L)
    val nBatch = batch.count()
    println(f"[c] batch twin: ${(System.nanoTime() - t1) / 1e9}%.1f s, " +
      s"candidates = $nBatch")
    // SET compare (the spec's convention): the stream legitimately
    // surfaces the same pair from two band buckets; chainedBatch ends
    // in a distinct for the same reason
    val gotD = got.select("doc_id", "canonical", "ham").distinct()
    val batchD = batch.select("doc_id", "canonical", "ham").distinct()
    val so = gotD.exceptAll(batchD).count()
    val bo = batchD.exceptAll(gotD).count()
    println(s"[c] stream-only=$so batch-only=$bo")
    gotD.write.mode("overwrite").parquet("/tmp/chain_diag/stream")
    batchD.write.mode("overwrite").parquet("/tmp/chain_diag/batch")
    val diff = so + bo
    println(s"[c] stream/batch symmetric diff rows = $diff" +
      (if (diff == 0) " (EXACT AGREEMENT)" else " (MISMATCH)"))
    spark.stop()
  }
}
