package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.{ProductQuantize, Quantize, Similarity}

/** r17 map-only rewrites: the expression arms (broadcast Codebook /
  * PqCodebooks / AdcTables, weighted CMS) must equal the retained
  * join+aggregate arms bit-for-bit — the NearestCell equivalence
  * discipline applied to the PQ family, kmeansCells, SRP bucketing and
  * the heavy-hitter sketch. Corpora are built to stress the seams: a
  * coarse value grid (EXACT distance ties -> lowest-cell tie-break),
  * duplicated vectors (duplicate centroids in the seed), a zero
  * vector, and ragged dimensionalities (subspace boundary math).
  */
class MapOnlyKernelsSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new scala.util.Random(4242)
  private def gv(dim: Int) =
    Array.fill(dim)(math.rint(rnd.nextDouble() * 4) / 2.0)

  /** Tie-heavy fixed-dim corpus with a zero vector. */
  private def corpus(n: Int, dim: Int): DataFrame =
    (0L until n.toLong).map(i =>
      (i, if (i == 7L) Array.fill(dim)(0.0) else gv(dim)))
      .toDF("vec_id", "embedding")

  /** Ragged-dim corpus (dims 4..8 at nsub=4 exercises every floor
    * boundary split).
    */
  private def ragged(n: Int): DataFrame =
    (0L until n.toLong).map(i => (i, gv(4 + (i % 5).toInt)))
      .toDF("vec_id", "embedding")

  private def codeRows(t: (DataFrame, DataFrame)): Map[(Long, Int), Long] =
    t._2.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

  private def centRows(t: (DataFrame, DataFrame)): Set[(Int, Long, Seq[Double])] =
    t._1.collect().map(r => (r.getInt(0), r.getLong(1),
      r.getSeq[Double](2))).toSet

  test("PQ train: codebook arm equals the join arm (codes and centroids)") {
    for (df <- Seq(corpus(600, 8), ragged(600)); iters <- Seq(1, 2)) {
      val a = ProductQuantize.train(df, "vec_id", "embedding",
        nsub = 4, kcent = 8, iters = iters)
      val b = ProductQuantize.trainJoin(df, "vec_id", "embedding",
        nsub = 4, kcent = 8, iters = iters)
      assert(codeRows(a) === codeRows(b), s"iters=$iters: code tables diverge")
      assert(centRows(a) === centRows(b), s"iters=$iters: centroids diverge")
    }
  }

  test("pqTopK: map-only ADC equals the join+aggregate plan") {
    for (df <- Seq(corpus(600, 8), ragged(600)); qid <- Seq(0L, 13L)) {
      val a = ProductQuantize.pqTopK(df, "vec_id", "embedding", qid, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = ProductQuantize.pqTopKJoin(df, "vec_id", "embedding", qid, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a === b, s"qid=$qid: ADC arms diverge")
    }
  }

  test("ivfPqTopKAll: map-only arm equals the join arm (gate forces it)") {
    // maxBroadcastQueries=0 routes to the former join plan (and its
    // merge-hinted joins); the default routes to the expression arm —
    // identical result sets on tie-heavy and ragged corpora
    for (df <- Seq(corpus(600, 8), ragged(600))) {
      val q = df.filter(col("vec_id") % 50 === 0)
      def run(maxQ: Long) = ProductQuantize.ivfPqTopKAll(df, "vec_id",
        "embedding", q, "vec_id", "embedding", k = 5, ncells = 8,
        nprobe = 2, maxBroadcastQueries = maxQ)
        .orderBy("qid", "id").collect().map(_.toSeq)
      assert(run(1L << 16) === run(0L), "expression vs join arm diverge")
    }
  }

  test("kmeansCells: codebook arm equals the join arm") {
    for (df <- Seq(corpus(600, 8), ragged(600)); iters <- Seq(1, 3)) {
      val a = Similarity.kmeansCells(df, "vec_id", "embedding", 8, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val b = Similarity.kmeansCellsJoin(df, "vec_id", "embedding", 8, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(a.size === 600)
      assert(a === b, s"iters=$iters: kmeans arms diverge")
    }
  }

  test("srp bucketing: map-only fold equals the former join+aggregate buckets") {
    import graft.functions.Hashing
    import graft.dedup.Vec
    val df = corpus(500, 6)
    val e0 = df.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val nPlanes = 8
    // the former shape, inline: nPlanes-row join + groupBy(id) sum
    val dim = e0.agg(max(size(col("v"))).as("dim"))
    val planes = dim
      .select(explode(sequence(lit(0), lit(nPlanes - 1))).as("p"), col("dim"))
      .select(col("p"),
        transform(sequence(lit(0), col("dim") - 1),
          i => when(Hashing.hash60(i.cast("string"), col("p"))
            .bitwiseAND(lit(1L)) === 1L, lit(1.0)).otherwise(lit(-1.0))).as("w"))
    val oldBuckets = e0.join(broadcast(planes))
      .select(col("id"), col("v"),
        when(Vec.dot(col("v"), col("w")) > lit(0.0),
          expr("shiftleft(1L, cast(p as int))")).otherwise(lit(0L)).as("bit"))
      .groupBy(col("id"))
      .agg(sum(col("bit")).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the new shape, via the public operator: srpTopKAll emits the
    // bucket per candidate; self-pairs at Hamming 0 cover every id
    // that shares a bucket with a query. Compare on the full query
    // set = corpus (bucket column must match the old map exactly).
    val got = Similarity.srpTopKAll(df, "vec_id", "embedding",
        df, "vec_id", "embedding", k = 1, nPlanes = nPlanes, maxHamming = 0)
      .select(col("id"), col("bucket"))
      .distinct().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, b) =>
      assert(oldBuckets(id) === b, s"id=$id bucket diverges")
    }
    assert(got.nonEmpty)
  }

  test("weighted CMS grid from the count aggregate equals the per-occurrence grid") {
    import org.apache.spark.sql.graft.{CmsSketch, CmsSketchWeighted}
    val docs = Tables.t(spark, sf, "documents")
    val toks = docs.select(
      explode(split(lower(coalesce(col("text"), lit(""))), " ")).as("tok"))
    val depth = 4; val width = 256
    val bk = graft.text.HeavyHitters.bucketIndices(col("tok"), depth, width)
    val old = toks.select(bk.as("bk"))
      .agg(CmsSketch(col("bk"), depth, width)).collect()(0).getSeq[Long](0)
    val nw = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .select(bk.as("bk"), col("n"))
      .agg(CmsSketchWeighted(col("bk"), col("n"), depth, width))
      .collect()(0).getSeq[Long](0)
    assert(old === nw, "weighted grid diverges from per-occurrence grid")
  }
}
