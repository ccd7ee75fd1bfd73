package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Selection
import org.apache.spark.sql.graft.DoubleSortableBits

/** The sort-free exact order-statistics drill: bit-image ordering,
  * ground-truth equality on random data (negatives, -0.0, duplicates),
  * tie resolution by id, stratified simultaneity, the carve's
  * window-equivalence, and partitioning invariance.
  */
class SelectionSpec extends SparkSpec {

  test("double bit image is order-isomorphic and invertible") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(500)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)) ++
      Array(0.0, -0.0, 1e-300, -1e-300, 1e300, -1e300,
        Double.MinPositiveValue, -Double.MinPositiveValue)
    val sortedByBits = xs.sortBy(DoubleSortableBits.bits)
    val sortedNumeric = xs.sorted // -0.0 < 0.0 under Ordering.Double.TotalOrdering
    assert(sortedByBits.map(DoubleSortableBits.bits).toSeq ===
      sortedNumeric.map(DoubleSortableBits.bits).toSeq,
      "bit order diverged from numeric order")
    xs.foreach { x =>
      assert(DoubleSortableBits.invert(DoubleSortableBits.bits(x)) == x ||
        (x.isNaN && DoubleSortableBits.invert(DoubleSortableBits.bits(x)).isNaN))
    }
  }

  test("kthSmallest equals the sorted ground truth (negatives, dups, extremes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 2000L).map { id =>
      val v = rnd.nextInt(6) match {
        case 0 => rnd.nextGaussian()
        case 1 => -math.abs(rnd.nextGaussian()) * 1e6
        case 2 => rnd.nextInt(5).toDouble // heavy ties
        case 3 => 0.0
        case 4 => -0.0
        case _ => rnd.nextGaussian() * 1e-9
      }
      (id, v)
    }
    val df = rows.toDF("id", "v").repartition(7)
    val truth = rows.map { case (id, v) =>
      (DoubleSortableBits.bits(v), id, v)
    }.sorted
    for (k <- Seq(1L, 2L, 37L, 1000L, 1999L, 2000L)) {
      val got = Selection.kthSmallest(df, "v", "id", k).get
      val (tb, tid, tv) = truth((k - 1).toInt)
      assert(DoubleSortableBits.bits(got._1) === tb, s"k=$k value ${got._1} vs $tv")
      assert(got._2 === tid, s"k=$k id")
    }
    // out-of-range ks resolve to None
    assert(Selection.kthSmallest(df, "v", "id", 0L).isEmpty)
    assert(Selection.kthSmallest(df, "v", "id", 2001L).isEmpty)
  }

  test("all-equal values: selection is pure id rank") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, 42.0)).toDF("id", "v").repartition(5)
    assert(Selection.kthSmallest(df, "v", "id", 1L).get === ((42.0, 0L)))
    assert(Selection.kthSmallest(df, "v", "id", 73L).get === ((42.0, 72L)))
  }

  test("stratified drill matches per-stratum ground truth in one pass set") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val strata = Seq("en", "fr", "de")
    val rows = (0L until 1500L).map { id =>
      (strata(rnd.nextInt(3)), id, rnd.nextGaussian()) }
    val df = rows.toDF("s", "id", "v").repartition(9)
    val ks = Map("en" -> 10L, "fr" -> 200L, "de" -> 1L)
    val got = Selection.stratifiedKthSmallest(df, "s", "v", "id", ks)
    ks.foreach { case (s, k) =>
      val sortedS = rows.filter(_._1 == s)
        .map(r => (DoubleSortableBits.bits(r._3), r._2)).sorted
      assert(k <= sortedS.length, "test setup: k in range")
      val (tb, tid) = sortedS((k - 1).toInt)
      val (gv, gid) = got(s)
      assert(DoubleSortableBits.bits(gv) === tb, s"stratum $s value")
      assert(gid === tid, s"stratum $s id")
    }
  }

  test("null values are excluded from ranking, not silently bucketed") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(1.0)),
      (4L, None), (5L, Some(3.0))).toDF("id", "v")
    // k is relative to the 3 rankable rows; the 2nd smallest is 3.0
    assert(Selection.kthSmallest(df, "v", "id", 2L).get === ((3.0, 5L)))
    assert(Selection.kthSmallest(df, "v", "id", 4L).isEmpty,
      "k beyond the non-null population must resolve to None")
    val kept = Selection.carveLowest(
        df.withColumn("s", lit("x")), "s", "v", "id", 2.0 / 3.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 5L), s"ceil(2/3 * 3) = 2 non-null keeps: $kept")
  }

  test("a null-id row at a unique threshold value stays excluded (ADVICE r17)") {
    import spark.implicits._
    // rankable rows 1.0#1 < 2.0#2 < 3.0#3: k = ceil(2/3 * 3) = 2 lands
    // the threshold on the UNIQUE value 2.0 (null __tid, degenerate id
    // clause). The null-id row sharing that value is outside the
    // drill's base; the pre-r17 non-degenerate clause's SQL-NULL
    // comparison dropped it, and the degenerate clause must too.
    val df = Seq((Option(1L), 1.0), (Option(2L), 2.0), (Option(3L), 3.0),
      (Option.empty[Long], 2.0)).toDF("id", "v").withColumn("s", lit("x"))
    val kept = Selection.carveLowest(df, "s", "v", "id", 2.0 / 3.0)
      .select("id").collect().map(r => Option(r.get(0))).toSet
    assert(kept === Set(Option(1L), Option(2L)),
      s"null-id threshold row leaked: $kept")
  }

  test("null strata are excluded, not a drill crash") {
    import spark.implicits._
    // the null-stratum rows must neither crash the per-round broadcast
    // join (=== never matches null) nor shift any stratum's counts
    val df = Seq((Option("a"), 1L, 3.0), (None, 2L, 1.0),
      (Option("a"), 3L, 1.0), (None, 4L, 2.0), (Option("a"), 5L, 2.0))
      .toDF("s", "id", "v")
    val got = Selection.stratifiedKthSmallest(df, "s", "v", "id",
      Map("a" -> 2L))
    assert(got === Map("a" -> ((2.0, 5L))))
    val kept = Selection.carveLowest(df, "s", "v", "id", 2.0 / 3.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 5L), s"null-stratum rows leaked: $kept")
  }

  test("non-string strata are rejected explicitly") {
    import spark.implicits._
    val df = Seq((1, 1L, 1.0)).toDF("s", "id", "v")
    val e = intercept[IllegalArgumentException] {
      Selection.stratifiedKthSmallest(df, "s", "v", "id", Map("1" -> 1L))
    }
    assert(e.getMessage.contains("must be STRING"))
  }

  test("a signed-zero threshold carves by the bit-image order, not SQL =") {
    import spark.implicits._
    // ordered by (image, id): -1.0#1, -0.0#2, -0.0#4, 0.0#3, 0.0#5,
    // 1.0#6 — k = ceil(0.5*6) = 3 lands the threshold ON (-0.0, 4).
    // A raw-double filter would also admit the +0.0 row with id 3
    // (SQL -0.0 = +0.0), breaking exact-k
    val df = Seq((1L, -1.0), (2L, -0.0), (3L, 0.0), (4L, -0.0),
      (5L, 0.0), (6L, 1.0)).toDF("id", "v").withColumn("s", lit("x"))
    val kept = Selection.carveLowest(df, "s", "v", "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 4L), s"signed-zero carve diverged: $kept")
  }

  test("the drill leaves no cached tables behind") {
    import spark.implicits._
    val df = (0L until 200L).map(i => ("s", i, (i % 17).toDouble))
      .toDF("s", "id", "v")
    spark.sharedState.cacheManager.clearCache()
    Selection.carveLowest(df, "s", "v", "id", 0.5).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "the drill's base cache leaked into the session")
  }

  test("carveLowest equals the window rank selection, partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0L until 900L).map { id =>
      (Seq("a", "b", "c", "d")(rnd.nextInt(4)), id,
        rnd.nextInt(40).toDouble) } // heavy value ties across strata
    val df = rows.toDF("s", "id", "v")
    val got = Selection.carveLowest(df.repartition(8), "s", "v", "id", 2.0 / 3.0)
      .select("s", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("s")).orderBy(col("v").asc, col("id").asc)
    val want = df
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("rk") <= ceil(col("n") * 2.0 / 3.0))
      .select("s", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    assert(got === want, "carve diverged from the window formulation")
    val got2 = Selection.carveLowest(df.repartition(3), "s", "v", "id", 2.0 / 3.0)
      .select("s", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got2 === got, "carve depends on partitioning")
  }

  test("mixed unique- and tied-threshold strata in one carve (r17 id-drill skip)") {
    // stratum u: all values distinct -> the k-th value is UNIQUE and
    // the r17 drill skips the 4-round id phase (null __tid, value-only
    // filter); stratum t: all values equal -> selection is pure id
    // rank through the id drill. Both must equal the window ground
    // truth in the same call.
    import spark.implicits._
    val rows =
      (0L until 100L).map(id => ("u", id, id.toDouble * 1.5 + 0.25)) ++
        (0L until 90L).map(id => ("t", id, 7.0))
    val df = rows.toDF("s", "id", "v")
    val got = Selection.carveLowest(df.repartition(5), "s", "v", "id", 0.5)
      .select("s", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("s")).orderBy(col("v").asc, col("id").asc)
    val want = df
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("rk") <= ceil(col("n") * 0.5))
      .select("s", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want, "mixed unique/tied carve diverged")
    // the public API still returns exact (value, id) on both shapes
    val ks = Selection.stratifiedKthSmallest(df, "s", "v", "id",
      Map("u" -> 50L, "t" -> 45L))
    assert(ks("u") === ((49.0 * 1.5 + 0.25, 49L)))
    assert(ks("t") === ((7.0, 44L)))
  }
}
