package graft

import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.CmsSketch
import graft.text.HeavyHitters

/** Count-min sketch aggregate (t19): hand-computed grids, the
  * never-underestimates guarantee, partial-merge invariance, codec
  * round-trip, the SQL surface, and the heavy-hitter operator's
  * exact-vs-estimate contract.
  */
class CmsSketchSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed grid: depth 1 counts exactly into buckets") {
    // depth=1, width=4, buckets given directly: values 0,1,1,3
    val df = Seq(Seq(0L), Seq(1L), Seq(1L), Seq(3L)).toDF("bk")
    val got = df.agg(CmsSketch(col("bk"), 1, 4)).head().getSeq[Long](0)
    assert(got === Seq(1L, 2L, 0L, 1L))
  }

  test("depth 2 grid rows are independent counters") {
    val df = Seq(Seq(0L, 2L), Seq(0L, 1L)).toDF("bk")
    val got = df.agg(CmsSketch(col("bk"), 2, 3)).head().getSeq[Long](0)
    // row 0: bucket 0 twice; row 1: buckets 2 and 1 once each
    assert(got === Seq(2L, 0L, 0L, 0L, 1L, 1L))
  }

  test("partial merges across partitions give the identical grid") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(5000)(Seq(rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
    val one = rows.toDF("bk").coalesce(1)
      .agg(CmsSketch(col("bk"), 2, 64)).head().getSeq[Long](0)
    val many = rows.toDF("bk").repartition(13)
      .agg(CmsSketch(col("bk"), 2, 64)).head().getSeq[Long](0)
    assert(one === many, "grid must be partitioning-invariant")
    assert(one.sum === 2L * 5000, "each input increments one cell per row")
  }

  test("estimate never underestimates and is exact without collisions") {
    // tokens with known counts; width large enough that estimates are
    // CMS-bounded overestimates of the true counts
    val toks = (Seq.fill(30)("alpha") ++ Seq.fill(10)("beta") ++
      Seq.fill(3)("gamma") ++ Seq("delta")).toDF("tok")
    val depth = 4; val width = 128
    val sketch = toks
      .select(HeavyHitters.bucketIndices(col("tok"), depth, width).as("bk"))
      .agg(CmsSketch(col("bk"), depth, width).as("cms"))
    val est = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .join(broadcast(sketch))
      .withColumn("est", HeavyHitters.estimate(col("cms"), col("tok"), depth, width))
      .select("tok", "n", "est").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    est.foreach { case (tok, (n, e)) =>
      assert(e >= n, s"$tok: estimate $e underestimates exact $n")
    }
    // with 4 distinct tokens in a 4x128 grid a collision of all four
    // rows is (4/128)^... ~ impossible: estimates are exact here
    assert(est("alpha")._2 === 30L)
    assert(est("delta")._2 === 1L)
  }

  test("serialize/deserialize round-trips the grid") {
    val agg = org.apache.spark.sql.graft.CmsSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(null), 2, 8)
    val buf = agg.createAggregationBuffer()
    buf(3) = 42L; buf(9) = 7L
    val back = agg.deserialize(agg.serialize(buf))
    assert(back === buf)
  }

  test("heavyHitters keeps exactly the tokens above the mass ratio") {
    // 100 tokens total: "hot" 50, "warm" 30, 20 singletons
    val docs = (Seq.fill(50)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 20).map(i => s"rare$i")).mkString(" ")
    val df = Seq((1L, docs)).toDF("doc_id", "text")
    val got = HeavyHitters.heavyHitters(df, "text", depth = 4,
      width = 256, ratio = 5).orderBy("tok").collect()
    // threshold: est*5 >= 100 -> est >= 20; hot and warm qualify,
    // singletons (est ~ 1 at width 256) cannot reach 20 unless 19+
    // singleton tokens collide in all 4 rows — not at these sizes
    assert(got.map(_.getString(0)).toSeq === Seq("hot", "warm"))
    val byTok = got.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byTok("hot")._2 === 50L && byTok("warm")._2 === 30L)
    assert(byTok("hot")._1 >= 50L && byTok("warm")._1 >= 30L)
  }

  test("cms_sketch registers on the SQL surface") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    Seq(Seq(0L), Seq(1L), Seq(1L)).toDF("bk").createOrReplaceTempView("cms_in")
    val got = spark.sql("SELECT cms_sketch(bk, 1, 4) FROM cms_in")
      .head().getSeq[Long](0)
    assert(got === Seq(1L, 2L, 0L, 0L))
  }
}
