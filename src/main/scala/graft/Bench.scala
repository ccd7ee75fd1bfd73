package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // repetitions per query; the reported per-query time is the MEDIAN,
    // which keeps round-over-round regressions attributable (an n=1
    // sample conflates engine changes with machine-load noise)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // optional comma-separated subset for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: touch every table once (IO path, parquet footers, codegen
    // of the row decoders) so the first timed query isn't charged for it
    Tables.names.foreach { n =>
      try Tables.t(spark, sfDir, n).count() catch { case _: Throwable => }
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      val times = (0 until reps).map { _ =>
        // queries that .cache() intermediates would otherwise hand reps
        // 2..n warm cached data via the CacheManager's plan-keyed lookup,
        // turning the median into a warm-cache number — evict first
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        // Materialize EVERY column: count() lets Catalyst prune unreferenced
        // projections, which under-measures projection-heavy queries. toRdd
        // forces full row production through the whole plan.
        try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()) }
        catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
