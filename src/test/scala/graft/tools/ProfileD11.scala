package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileD11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $n%-28s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    for (rep <- 1 to 3) {
      spark.sharedState.cacheManager.clearCache()
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val base = d.filter(col("doc_id") % 2 === 0)
      val inc = d.filter(col("doc_id") % 2 === 1)
      val exact = graft.dedup.Dedup.exactIndex(base, "doc_id", "text")
      val bands = graft.dedup.Dedup.bandIndex(base, "doc_id", "text", 4)
      time(s"rep$rep exactIndex count") { exact.count() }
      time(s"rep$rep bandIndex count") { bands.count() }
      time(s"rep$rep full d11") {
        graft.dedup.Dedup.incrementalDedup(inc, "doc_id", "text",
          exact, bands, 4).queryExecution.toRdd.foreach(_ => ())
      }
      spark.sharedState.cacheManager.clearCache()
      time(s"rep$rep simhash(inc) only") {
        graft.dedup.Dedup.simhash(inc, "doc_id", "text")
          .queryExecution.toRdd.foreach(_ => ())
      }
      time(s"rep$rep assign(inc) only") {
        graft.dedup.Dedup.simhashAssign(
          graft.dedup.Dedup.simhash(inc, "doc_id", "text"), "doc_id", 4)
          .queryExecution.toRdd.foreach(_ => ())
      }
    }
    spark.stop()
  }
}
