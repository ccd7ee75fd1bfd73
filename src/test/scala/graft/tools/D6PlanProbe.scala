// dev scratch (r17): exhibit the d6 sf1 regression's plan — the
// map-only assignment feeds the within-cell self-join from the raw
// scan partitioning; at sf1 (5 MB scan, 1 split) the cached frame is
// ONE partition and a broadcast self-join runs the whole quadratic
// kernel in one task.
// Usage: runMain graft.tools.D6PlanProbe [sfDir]
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object D6PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val pairs = graft.dedup.Dedup.embeddingDupPairs(
      emb, "vec_id", "embedding", 0.95)
    val t0 = System.nanoTime()
    val n = pairs.count()
    println(f"[d6plan] pairs=$n wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    pairs.explain("formatted")
    spark.stop()
  }
}
