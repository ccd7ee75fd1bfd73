// dev scratch (r15): time the shared minhash front-end (signedSets:
// tokenize + shingle + fnv1a + 12-seed MD5 minhash, cached) alone at a
// stress scale — the lower bound every LSH-family query pays before
// its own statement. Usage: runMain graft.tools.FrontEndProbe [sfDir]
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object FrontEndProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    docs.count() // warm footers/pages
    val t0 = System.nanoTime()
    val sets = graft.dedup.Dedup.signedSets(docs, "doc_id", "text", 12, 3)
    val n = sets.count()
    println(f"[fe] signedSets materialized: $n rows, " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
