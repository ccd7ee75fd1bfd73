package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: split d9's sf1 cost into pair-graph build vs sweeps. */
object D9Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.t(spark, dir, "documents")
    val sim = graft.dedup.Dedup.simhash(docs, "doc_id", "text")
    var t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.simhashPairs(sim, "doc_id", 4)
    val np = pairs.count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    // evict the banded cache the pair build left behind — otherwise
    // the clusters run below serves its internal pair build from the
    // warm cache and the timed split is contaminated
    spark.sharedState.cacheManager.clearCache()
    t0 = System.nanoTime()
    val clusters = graft.dedup.Dedup.simhashClusters(sim, "doc_id", 4)
    val nc = clusters.count()
    val tAll = (System.nanoTime() - t0) / 1e9
    println(f"pairs=$np%d in $tPairs%.1f s; clusters rows=$nc%d, full d9 $tAll%.1f s (incl. its own pair build)")
    spark.stop()
  }
}
