package graft

import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.KmvDistinct

/** KMV distinct sketch (t17): exact-below-k, the order-statistic
  * estimate on crafted hashes, duplicate-insensitivity, partial-merge
  * invariance, codec round-trip, and the SQL surface.
  */
class KmvDistinctSpec extends SparkSpec {

  import spark.implicits._

  private val twoPow60 = 1152921504606846976.0d

  test("below k distinct values the sketch returns the exact count") {
    val df = Seq(1L, 2L, 3L, 2L, 1L).toDF("h")
    val got = df.agg(KmvDistinct(col("h"), 16)).as[Double].head()
    assert(got === 3.0)
  }

  test("at or above k: the (k-1) * 2^60 / h_k order-statistic estimate") {
    // distinct hashes 1..100 -> h_16 = 16
    val df = (1L to 100L).toDF("h")
    val got = df.agg(KmvDistinct(col("h"), 16)).as[Double].head()
    assert(got === 15.0 * twoPow60 / 16.0)
    // duplicates are invisible to the sketch
    val dup = ((1L to 100L) ++ (1L to 50L)).toDF("h")
    assert(dup.agg(KmvDistinct(col("h"), 16)).as[Double].head() === got)
  }

  test("partial merges across partitions give the identical estimate") {
    val rnd = new scala.util.Random(42)
    val hs = Seq.fill(5000)(rnd.nextLong() & ((1L << 60) - 1))
    val one = hs.toDF("h").coalesce(1)
      .agg(KmvDistinct(col("h"), 32)).as[Double].head()
    val many = hs.toDF("h").repartition(13)
      .agg(KmvDistinct(col("h"), 32)).as[Double].head()
    assert(one === many, "sketch must be partitioning-invariant")
    // and the estimate is in the right ballpark for ~5000 distinct
    assert(one > 2500 && one < 10000, s"estimate $one implausible")
  }

  test("serialize/deserialize round-trips the bounded buffer") {
    val agg = org.apache.spark.sql.graft.KmvDistinct(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 8)
    val buf = agg.createAggregationBuffer()
    Seq(9L, 3L, 7L, 3L, 1L).foreach(buf.add(_))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back === buf)
    assert(agg.deserialize(agg.serialize(
      agg.createAggregationBuffer())).isEmpty)
  }

  test("KmvMinima: sorted k smallest distinct values, partitioning-invariant") {
    import org.apache.spark.sql.graft.KmvMinima
    val hs = ((1L to 50L) ++ (1L to 20L)).toDF("h")
    val got = hs.agg(KmvMinima(col("h"), 8)).head().getSeq[Long](0)
    assert(got === (1L to 8L))
    val shuffled = hs.repartition(7).agg(KmvMinima(col("h"), 8))
      .head().getSeq[Long](0)
    assert(shuffled === (1L to 8L))
    // below k: the whole distinct set, sorted
    val small = Seq(9L, 3L, 9L).toDF("h").agg(KmvMinima(col("h"), 8))
      .head().getSeq[Long](0)
    assert(small === Seq(3L, 9L))
  }

  test("KMV set algebra: union-truncate + shared membership estimates Jaccard") {
    import org.apache.spark.sql.graft.KmvMinima
    // A = {1..40}, B = {21..60}: jaccard = 20/60 = 1/3; with k=8 the
    // union minima are 1..8 (all A-only) -> est 0/8; with k large
    // enough to see the overlap the estimate approaches the truth —
    // hand-check the arithmetic, not the statistics, at k=30:
    // u = 1..30, shared = 21..30 -> est 10/30 = 1/3 exactly
    val a = (1L to 40L).toDF("h").agg(KmvMinima(col("h"), 30))
      .head().getSeq[Long](0)
    val b = (21L to 60L).toDF("h").agg(KmvMinima(col("h"), 30))
      .head().getSeq[Long](0)
    val u = (a ++ b).distinct.sorted.take(30)
    val m = u.count(x => a.contains(x) && b.contains(x))
    assert(m.toDouble / u.length === 1.0 / 3.0)
  }

  test("kmv_distinct registers on the SQL surface") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    (1L to 100L).toDF("h").createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT kmv_distinct(h, 16) FROM kmv_in")
      .as[Double].head()
    assert(got === 15.0 * twoPow60 / 16.0)
  }
}
