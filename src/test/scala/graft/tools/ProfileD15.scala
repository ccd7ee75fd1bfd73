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

    // stage 1: shingle sets (string shingles + sorted hashes)
    val sets = graft.dedup.Dedup.shingleSets(docs, "doc_id", "text")
    time("shingleSets materialize") { sets.count() }
    // stage 2: minhash signatures
    val sigs = sets.withColumn("sig",
      graft.dedup.Dedup.minhashSignature(col("sh"), 12))
    time("signatures") { sigs.select(col("id"), col("sig")).count() }
    time("signatures (fused w/ agg)") {
      sigs.select(col("id"), element_at(col("sig"), 1).as("s0"))
        .agg(max("s0")).head()
    }
    // stage 3: the d15 forest (band explode + groupByKey + lazy UF)
    val forest = graft.dedup.Dedup.minhashForestFromSets(sets, 0.7, 12, 3)
    val edges = time("forest edges") { forest.cache().count() }
    println(s"[profile] forest edges = $edges")
    // stage 4: components + summary
    time("components+summary") {
      graft.dedup.Dedup.connectedComponents(forest).groupBy("label")
        .count().count()
    }
    forest.unpersist()
    spark.sharedState.cacheManager.clearCache()
    // d16 decomposition: candidate generation vs verification
    time("d16 full") {
      graft.dedup.Dedup.containmentDegree(docs, "doc_id", "text", 0.7).count()
    }
    spark.stop()
  }
}
