// dev scratch (r17, VERDICT r16 next #3): the EMBEDDING-side rate
// sweep at the 1000x decade — the SampledScale twin for d23 now that
// the sampled embedding survey answers where exact d6 refuses
// (SCALE_r16 §3). On the natural sf100 corpus: confirm d6 refuses and
// that the refusal message's implied rateInv actually ANSWERS, then
// record the 1/r^2 law — within-cell candidate volume and wall time
// at rateInv in {2, 8, 32} (or args) under the full corpus's pinned
// IVF (cells + centroid seed — the thinned-view contract).
// Per-rate hygiene: cacheManager AND the id-stats cache cleared, so
// every rate pays the full cold construction including the one
// full-corpus stats job.
// Usage: runMain graft.tools.EmbSampledScale [sfDir] [rates...]
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EmbSampledScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100")
    val rates = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(2, 8, 32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    def time[T](n: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f
      println(f"[e] $n%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }
    def cold(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      graft.sim.Similarity.clearIdStatsCache()
      graft.sim.Similarity.clearCentroidCache()
    }

    var impliedRate = -1
    time("d6 exact embedding pairs (expect refusal)") {
      try {
        graft.dedup.Dedup.embeddingDupPairs(emb, "vec_id", "embedding", 0.4)
        println("[e] d6 DID NOT REFUSE")
      } catch {
        case e: graft.dedup.PairVolumeException =>
          impliedRate = math.ceil(math.sqrt(
            e.estimatedPairs.toDouble / e.bound)).toInt
          println(s"[e] d6 refused: est=${e.estimatedPairs} " +
            s"bound=${e.bound} implied min rateInv ~ $impliedRate")
      }
    }
    val sweep = (rates ++ (if (impliedRate > 0 && !rates.contains(impliedRate))
      Seq(impliedRate) else Seq.empty)).sorted
    sweep.foreach { r =>
      cold()
      // untimed structure probe first: within-cell candidate volume of
      // the thinned assignment under the full-corpus index (the 1/r^2
      // quantity the law is about) + worst cell
      val cells = graft.sim.Similarity.autoCells(emb, "vec_id")
      val thin = emb.where(graft.dedup.Dedup.sampleKeep("vec_id", r))
      val cc = graft.sim.Similarity
        .assignCells(thin, "vec_id", "embedding", cells, seedFrom = emb)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2).as("vol"),
          max(col("n") * (col("n") - 1) / 2).as("worst")).head()
      println(s"[e] rateInv=$r cells=$cells candidateVolume=${cc.get(0)} " +
        s"worstCell=${cc.get(1)}")
      cold()
      try {
        val n = time(s"d23 sampled embedding rateInv=$r (cold)") {
          graft.dedup.Dedup.sampledEmbeddingDupPairs(emb, "vec_id",
            "embedding", 0.4, r).count()
        }
        println(s"[e] rateInv=$r rows=$n")
      } catch {
        case e: graft.dedup.PairVolumeException =>
          println(s"[e] rateInv=$r STILL REFUSES: est=${e.estimatedPairs}")
      }
    }
    spark.stop()
  }
}
