package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the d15/d16/d17 summary operators —
  * dev-only (Test scope), not part of the library surface.
  */
object ProfileD15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.t(spark, dir, "documents")
    docs.count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // stage 1+2 fused: signed sets (tokenize + fingerprint + sign in
    // one kernel pass)
    val sets = graft.dedup.Dedup.signedSets(docs, "doc_id", "text")
    time("signedSets materialize") { sets.count() }
    // stage 3: the capped banded star forest
    val forest = graft.dedup.Dedup
      .minhashForestFromSets(sets, 0.7, 12, 3)
    val edges = time("forest edges") { forest.cache().count() }
    println(s"[profile] forest edges = $edges")
    // stage 4a: driver union-find closure (the d15 default path)
    time("driver union-find closure") {
      val e = forest.collect()
      graft.dedup.Dedup.driverComponentLabels(
        e.map(_.getLong(0)), e.map(_.getLong(1)))._1.length
    }
    // stage 4b: the distributed sweep loop it replaced
    time("connectedComponents sweeps") {
      graft.dedup.Dedup.connectedComponents(forest).groupBy("label")
        .count().count()
    }
    forest.unpersist()
    spark.sharedState.cacheManager.clearCache()
    // end-to-end d15 at the public entry point
    time("d15 end-to-end") {
      graft.dedup.Dedup
        .minhashLshClusterSummary(docs, "doc_id", "text", 0.7).count()
    }
    spark.sharedState.cacheManager.clearCache()
    // d3 for the beats-the-pair-report comparison
    time("d3 end-to-end") {
      graft.dedup.Dedup
        .minhashLshPairs(docs, "doc_id", "text", 0.7).count()
    }
    spark.sharedState.cacheManager.clearCache()
    // d16 decomposition: candidate generation vs verification
    time("d16 full") {
      graft.dedup.Dedup.containmentDegree(docs, "doc_id", "text", 0.7).count()
    }
    spark.stop()
  }
}
