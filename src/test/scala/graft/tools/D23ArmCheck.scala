// dev scratch (r17): adjudicate the ViralStress d23 count drift
// (4,793,797 in SCALE_r16 §3 vs 4,815,863 this round). Runs the
// sampled embedding pair report on the EXACT ViralStress corpus twice
// — once with assignment on the NearestCell expression arm (the r17
// default) and once forced through the retained join arm (the r16
// shape) — and compares counts and the per-cell assignment itself.
// Usage: runMain graft.tools.D23ArmCheck [sfDir] [familySize]
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object D23ArmCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val fam = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val seedVec = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val viralEmb = spark.range(math.max(fam, 30000).toLong)
      .select((col("id") + 900000000L).as("vec_id"),
        typedLit(seedVec).as("embedding"))
    val embCorpus = emb.select(col("vec_id"), col("embedding"))
      .unionByName(viralEmb)

    val cells = graft.sim.Similarity.autoCells(embCorpus, "vec_id")
    println(s"[d23check] cells=$cells")

    // per-row assignment, both arms, on the FULL corpus
    val aExpr = graft.sim.Similarity
      .assignCells(embCorpus, "vec_id", "embedding", cells)
      .select(col("id"), col("cell").as("cell_expr"))
    val aJoin = graft.sim.Similarity
      .assignCellsJoin(embCorpus, "vec_id", "embedding", cells)
      .select(col("id"), col("cell").as("cell_join"))
    val diff = aExpr.join(aJoin, "id")
      .filter(col("cell_expr") =!= col("cell_join"))
    val nDiff = diff.count()
    println(s"[d23check] per-row assignment diffs (expr vs join) = $nDiff")
    if (nDiff > 0) diff.limit(10).collect().foreach(r =>
      println(s"[d23check]   id=${r.get(0)} expr=${r.get(1)} join=${r.get(2)}"))

    // end-to-end d23 count (expr path, the current default)
    val n = graft.dedup.Dedup.sampledEmbeddingDupPairs(embCorpus, "vec_id",
      "embedding", 0.4, 10).count()
    println(s"[d23check] d23 count (current default) = $n")
    spark.stop()
  }
}
