package graft

import org.apache.spark.sql.functions._

import graft.sim.{Quantize, Similarity}

/** Structural pins for the Lloyd-trained IVF cells (s7): assignment
  * totality, the Lloyd descent property, and determinism. The oracle
  * query does the value-level cross-engine verification.
  */
class KmeansSpec extends SparkSpec {

  private lazy val emb = Tables.t(spark, sf, "embeddings")

  private def wcss(iters: Int): Double = {
    val codes = Quantize.int8Codes(emb, "vec_id", "embedding")
    val asg = Similarity.kmeansCells(emb, "vec_id", "embedding", 8, iters)
      .join(codes, "id")
    // centroids implied by the FINAL assignment (the cost Lloyd's
    // update step minimizes for that assignment)
    val cent = asg.select(col("cell"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg((sum(col("x").cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        p => p.getField("m")).as("cv"))
    asg.join(cent, "cell")
      .select(graft.dedup.Vec.sqDist(col("q"), col("cv")).as("d"))
      .agg(sum("d")).collect()(0).getDouble(0)
  }

  test("every vector is assigned to exactly one of the ncells cells") {
    val out = Similarity.kmeansCells(emb, "vec_id", "embedding", 8, 3)
    assert(out.count() === emb.count())
    assert(out.select("id").distinct().count() === emb.count())
    assert(out.filter(col("cell") < 0 || col("cell") >= 8).count() === 0L)
  }

  test("Lloyd descends: training strictly reduces (or holds) the within-cell cost") {
    val c0 = wcss(0)
    val c3 = wcss(3)
    assert(c3 <= c0, s"training increased cost: $c0 -> $c3")
    assert(c3 < c0, "three iterations moved nothing — seed centroids " +
      "were already stationary on this corpus, which the synthetic " +
      "embeddings should not produce")
  }

  test("deterministic: two runs agree row for row") {
    val a = Similarity.kmeansCells(emb, "vec_id", "embedding", 8, 2)
    val b = Similarity.kmeansCells(emb, "vec_id", "embedding", 8, 2)
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }

  test("Reliable and Table sweep media produce the Local assignment") {
    import graft.dedup.SweepCheckpoint
    def run(s: SweepCheckpoint): Set[(Long, Long)] =
      Similarity.kmeansCells(emb, "vec_id", "embedding", 8, 2, sweep = s)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = run(SweepCheckpoint.Local)
    val relDir = java.nio.file.Files.createTempDirectory("km_rel").toString
    val tblDir = java.nio.file.Files.createTempDirectory("km_tbl").toString
    assert(run(SweepCheckpoint.Reliable(relDir)) === local)
    assert(run(SweepCheckpoint.Table(tblDir)) === local)
  }

  test("an id-offset corpus fails loudly instead of assigning nothing") {
    val shifted = emb.withColumn("vec_id", col("vec_id") + lit(1000000L))
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansCells(shifted, "vec_id", "embedding", 8, 1)
    }
    assert(e.getMessage.contains("seed centroid table is empty"))
  }
}
