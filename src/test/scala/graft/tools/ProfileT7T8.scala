// dev scratch (VERDICT r14 #3): root-cause the t7/t8 sf1 quiet
// regression left by the scan-byte floor re-denomination. Measures the
// two one-shot map-kernel text queries under three distribution
// treatments at a given scale:
//   on       — spread fires (floor 0): scan -> repartition(32) -> kernel
//   off      — spread never fires (floor MaxValue): the r13 sf1 shape
//              (single-row-group file => one map task)
//   presplit — spread structurally no-op: maxPartitionBytes shrunk so
//              the SCAN arrives >= 32 partitions (no exchange at all)
// Bench protocol: toRdd.foreach materialization, cache evicted per rep,
// median of 5.
// Usage: runMain graft.tools.ProfileT7T8 [sfDir]
package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object ProfileT7T8 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = graft.Tables.t(spark, dir, "documents")
    docs.count() // warm IO/footers

    def median5(f: => DataFrame): Double = {
      val raw = (0 until 5).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      println("    reps: " + raw.map(t => f"$t%.2f").mkString(" "))
      raw.sorted.apply(2)
    }
    def run(tag: String, floor: Long, mpb: Option[String]): Unit = {
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        mpb.getOrElse("128MB"))
      val t7 = median5(graft.text.Repetition
        .signals(docs, "doc_id", "text", floor).orderBy("doc_id"))
      val t8 = median5(graft.text.TfIdf
        .topTerm(docs, "doc_id", "text", floor).orderBy("doc_id"))
      val nparts = graft.text.TextOps.spread(
        docs.select(col("doc_id"), col("text")), floor).rdd.getNumPartitions
      println(f"[p] $tag%-10s t7=$t7%6.2f s  t8=$t8%6.2f s  mapParts=$nparts")
    }
    println(s"[p] dir=$dir scanBytes=${graft.ScanBytes.of(docs)}")
    run("on", 0L, None)
    run("off", Long.MaxValue, None)
    run("presplit", Long.MaxValue, Some("184320")) // ~5.9MB/32
    spark.stop()
  }
}
