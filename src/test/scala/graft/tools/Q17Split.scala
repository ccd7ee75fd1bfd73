package graft.tools
import org.apache.spark.sql.SparkSession
object Q17Split {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { n =>
      try graft.Tables.t(spark, dir, n).count() catch { case _: Throwable => } }
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (0 until 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$tag: ${ts(1)}%.3f s")
    }
    time("panel-only") {
      graft.queries.AlertQueries.catsPanel(spark, dir)
        .queryExecution.toRdd.foreach(_ => ())
    }
    val n = graft.queries.AlertQueries.catsPanel(spark, dir).count()
    println(s"panel rows: $n")
    time("full q17") {
      graft.SparkEntry.queries("q17_cats_class")(spark, dir)
        .queryExecution.toRdd.foreach(_ => ())
    }
    spark.stop()
  }
}
