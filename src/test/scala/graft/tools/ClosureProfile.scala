// dev scratch (r15 Finding 10 follow-up): per-stage wall split of the
// d15 closure chain at a stress scale — exact-collapse (md5 groupBy +
// join back over the text column), fused signed sets on the reps,
// banded star forest, closure+summary remainder.
// Usage: runMain graft.tools.ClosureProfile [sfDir]
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ClosureProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    docs.count() // warm
    def time[T](n: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f
      println(f"[cp] $n%-44s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r }

    // stage 1 replica: the exact-collapse shape of minhashLshClusterSummary
    val hashed = docs.select(col("doc_id").cast("long").as("id"),
      col("text").as("__text"), md5(coalesce(col("text"), lit(""))).as("__ch"))
    val groups = time("collapse: md5 groupBy (narrow shuffle)") {
      val g = hashed.groupBy(col("__ch"))
        .agg(min(col("id")).as("rid"), count(lit(1)).as("n_copies")).cache()
      val n = g.count()
      println(s"[cp]   distinct texts = $n of ${"%,d".format(5000000)}")
      g
    }
    val repDocs = time("collapse: join back (text-column shuffle)") {
      val r = hashed.select(col("id"), col("__text"))
        .join(groups.select(col("rid").as("id")), "id").cache()
      r.count(); r
    }
    val sets = time("signedSets on reps") {
      val s = graft.dedup.Dedup.signedSets(repDocs, "id", "__text", 12, 3)
      s.count(); s
    }
    val nE = time("star forest (edges)") {
      graft.dedup.Dedup.minhashForestParts(sets, 0.7, 12, 3, 1 << 16)._1.count()
    }
    println(s"[cp]   forest edges = $nE")
    time("full d15 (for the total)") {
      graft.dedup.Dedup.minhashLshClusterSummary(docs, "doc_id", "text", 0.7)
        .queryExecution.toRdd.foreach(_ => ())
    }
    spark.stop()
  }
}
