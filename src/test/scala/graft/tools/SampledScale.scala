// dev scratch (r15): the sampled-degree family at the 1000x decade —
// on the NATURAL sf100 corpus (no plant), confirm the exact degree
// statement refuses, find the sample rate that answers, and time it.
// The point on record: r is a per-corpus knob — the refusal message's
// estimate tells the caller how far to thin (est/2^28 ~ r^2).
// Usage: runMain graft.tools.SampledScale [sfDir] [rates...]
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SampledScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100")
    val rates = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    def time[T](n: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f
      println(f"[s] $n%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }

    time("d17 exact degree (expect refusal)") {
      try {
        graft.dedup.Dedup.ngramJaccardDegree(docs, "doc_id", "text", 0.5)
        println("[s] d17 DID NOT REFUSE (plan built eagerly?)")
      } catch {
        case e: graft.dedup.PairVolumeException =>
          println(s"[s] d17 refused: est=${e.estimatedPairs} bound=${e.bound} " +
            f"(implied min rate ~ ${math.sqrt(e.estimatedPairs.toDouble / e.bound)}%.1f)")
      }
    }
    rates.foreach { r =>
      try {
        val n = time(s"d21 sampled degree rateInv=$r") {
          graft.dedup.Dedup.sampledJaccardDegree(docs, "doc_id", "text",
            0.5, r).count()
        }
        println(s"[s] rateInv=$r rows=$n")
      } catch {
        case e: graft.dedup.PairVolumeException =>
          println(s"[s] rateInv=$r STILL REFUSES: est=${e.estimatedPairs}")
      }
    }
    spark.stop()
  }
}
