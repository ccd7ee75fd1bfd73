// dev scratch profiler for the simhash forest at stress scales
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileD5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.dedup.Dedup
    val docs = graft.Tables.t(spark, dir, "documents")
    def time[T](n: String)(f: => T): T = { val t0=System.nanoTime(); val r=f
      println(f"[p] $n%-34s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r }
    val sim = Dedup.simhash(docs, "doc_id", "text").cache()
    time("simhash materialize (cached)") { sim.count() }
    val banded = Dedup.bandedSimhash(sim, "doc_id", 4)
      .select(col("band"), col("bits"),
        col("doc_id").cast("long").as("id"), col("simhash"))
    time("banded count") { banded.count() }
    time("bucket-size pass") {
      banded.groupBy(col("band"), col("bits"))
        .agg(count(lit(1)).as("c")).filter(col("c") > 65536).count()
    }
    // bucket size distribution
    val dist = banded.groupBy(col("band"), col("bits"))
      .agg(count(lit(1)).as("c")).select("c").as[Long].collect().sorted
    println(s"[p] buckets=${dist.length} max=${dist.last} " +
      s"p99=${dist((dist.length * 99) / 100)} " +
      s"sum_c2=${dist.map(c => c * c).sum}")
    time("stars via groupByKey") {
      banded.as[(Int, Long, Long, Long)]
        .groupByKey { case (b, bits, _, _) => (b, bits) }
        .flatMapGroups((_: (Int, Long), it: Iterator[(Int, Long, Long, Long)]) =>
          Dedup.bucketStars(it, 4))
        .toDF("d1", "d2").count()
    }
    time("full simhashForest (incl distinct)") {
      Dedup.simhashForest(sim, "doc_id", 4).count()
    }
    spark.sharedState.cacheManager.clearCache()
    // d13 decomposition
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val pairs = time("embeddingDupPairs (cached)") {
      val p = Dedup.embeddingDupPairs(emb, "vec_id", "embedding", 0.4, 8).cache()
      println("[p] pairs = " + p.count())
      p
    }
    time("closure over pairs") {
      Dedup.closeComponents(pairs.select(col("d1"), col("d2"))).count()
    }
    spark.sharedState.cacheManager.clearCache()
    time("semanticDedup AUTO cells") {
      Dedup.semanticDedup(emb, "vec_id", "embedding", 0.4, ncells = 0).count()
    }
    spark.stop()
  }
}
