// dev scratch (VERDICT r15 next #3, upgraded r16): measure d23's
// fidelity against brute-force truth where the exact statement
// completes:
//   truth      = brute-force cosine >= t over the SAMPLED subset (both
//                endpoints sampled by construction)
//   same-cell  = truth pairs co-located by the FULL-corpus IVF — i.e.
//                exactly the pairs exact d6 restricted to the sample
//                would report
//   cross-cell = truth pairs the full-corpus IVF already splits (d6
//                itself never sees these; they bound the statement, not
//                the sampling)
// History: under the original re-derived-on-sample IVF this tool
// measured the caveat (and, with D23Boundary, exposed the degenerate
// `id < ncells` seed — recall 1.0 everywhere because the sample index
// was ~1 cell; honestly re-derived it read 0.80/0.36 at natural sf10).
// Under the r16 thinned-view contract (full-corpus cell count +
// centroid seed) the expected readings are EXACT: same-cell recall
// 1.0000 by construction, cross-cell recall 0.0000 by construction,
// extra 0 — this tool is now the contract's empirical witness.
// The measurement body is shared with D23Boundary.
// Usage: runMain graft.tools.D23Fidelity [sfDir] [rateInv] [threshold]
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object D23Fidelity {

  /** Sampled-vs-exact pair recall split by the FULL-corpus IVF's
    * same-cell/cross-cell classes; `emb` must carry (vec_id,
    * embedding). Returns (sameHit, sameTot, crossHit, crossTot) after
    * printing the full report.
    */
  def measure(spark: SparkSession, emb: DataFrame, r: Int, t: Double)
      : (Long, Long, Long, Long) = {
    import graft.dedup.{Dedup, Vec}
    import graft.sim.Similarity
    val n = emb.count()
    val sampled = emb.where(Dedup.sampleKeep("vec_id", r))
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Vec.dot(col("v"), col("v"))))
      .filter(col("nrm") > 0.0)
      .cache()
    val ns = sampled.count()
    println(s"[f] n=$n sampled=$ns (rateInv=$r) threshold=$t")

    // truth: all-pairs cosine over the sample (no cell routing at all)
    val truth = sampled.as("a").join(sampled.as("b"),
        col("a.id") < col("b.id"))
      .withColumn("cos",
        Vec.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= t)
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
      .cache()

    // full-corpus IVF assignment (the structure exact d6 runs under)
    val cells = Similarity.autoCells(emb, "vec_id")
    val asg = Similarity.assignCells(emb, "vec_id", "embedding", cells)
      .select(col("id"), col("cell")).cache()
    val classified = truth
      .join(asg.select(col("id").as("d1"), col("cell").as("c1")), "d1")
      .join(asg.select(col("id").as("d2"), col("cell").as("c2")), "d2")
      .withColumn("same", col("c1") === col("c2"))
      .cache()

    val got = Dedup.sampledEmbeddingDupPairs(emb, "vec_id", "embedding", t, r)
      .select(col("d1"), col("d2")).cache()
    val nGot = got.count()

    def stats(same: Boolean): (Long, Long) = {
      val cls = classified.filter(col("same") === same)
      val tot = cls.count()
      val hit = cls.join(got, Seq("d1", "d2"), "left_semi").count()
      (hit, tot)
    }
    val (sHit, sTot) = stats(same = true)
    val (xHit, xTot) = stats(same = false)
    // sanity: the sampled run can only emit true pairs of the sample
    val extra = got.join(truth, Seq("d1", "d2"), "left_anti").count()
    println(f"[f] fullIVF cells=$cells  sampled-run pairs=$nGot  extra(non-truth)=$extra")
    println(f"[f] same-cell (== exact-d6-restricted): recall ${sHit.toDouble / math.max(1, sTot)}%.4f ($sHit/$sTot)")
    println(f"[f] cross-cell (invisible to exact d6 too): recall ${xHit.toDouble / math.max(1, xTot)}%.4f ($xHit/$xTot)")
    sampled.unpersist(); truth.unpersist(); asg.unpersist()
    classified.unpersist(); got.unpersist()
    (sHit, sTot, xHit, xTot)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val r = if (args.length > 1) args(1).toInt else 10
    val t = if (args.length > 2) args(2).toDouble else 0.4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    println(s"[f] dir=$dir")
    measure(spark, emb, r, t)
    spark.stop()
  }
}
