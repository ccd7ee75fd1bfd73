// dev scratch: decompose d13's AUTO-cells path at stress scales
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileD13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = { val t0=System.nanoTime(); val r=f
      println(f"[p] $n%-34s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r }
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val cells = time("autoCells count") {
      graft.sim.Similarity.autoCells(emb, "vec_id") }
    println(s"[p] cells = $cells")
    val assigned = time("assignCells materialize") {
      val a = graft.sim.Similarity.assignCells(emb, "vec_id", "embedding", cells).cache()
      a.count(); a
    }
    val pairs = time("within-cell pair join + verify") {
      val p = graft.dedup.Dedup.embeddingDupPairs(emb, "vec_id", "embedding", 0.4)
        .select(col("d1"), col("d2")).cache()
      println("[p] pairs = " + p.count()); p
    }
    time("closure") { graft.dedup.Dedup.closeComponents(pairs).count() }
    assigned.unpersist(); pairs.unpersist()
    spark.stop()
  }
}
