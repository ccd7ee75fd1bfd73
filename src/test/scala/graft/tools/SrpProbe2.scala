package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Vec
import graft.functions.Hashing

/** Scratch probe (r17): s6 cost attribution — full-new vs hybrid
  * (new corpus side + OLD aggregate query side) vs full-old, one
  * session, interleaved. All arms replicate the official probeFits
  * gate job so arms differ only in the bucketing shapes.
  */
object SrpProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    emb.count()
    val nPlanes = 8; val maxHamming = 1; val k = 5

    def nonZero(v: Column) = Vec.dot(v, v) > 0.0

    def planesOf(e: DataFrame): DataFrame = {
      val dim = e.agg(max(size(col("v"))).as("dim"))
      dim.select(explode(sequence(lit(0), lit(nPlanes - 1))).as("p"), col("dim"))
        .select(col("p"),
          transform(sequence(lit(0), col("dim") - 1),
            i => when(Hashing.hash60(i.cast("string"), col("p"))
              .bitwiseAND(lit(1L)) === 1L, lit(1.0)).otherwise(lit(-1.0))).as("w"))
    }

    def oldBucketOf(planes: DataFrame, df: DataFrame, idc: String,
        vc: String): DataFrame =
      df.join(broadcast(planes))
        .select(col(idc), col(vc),
          when(Vec.dot(col(vc), col("w")) > lit(0.0),
            expr("shiftleft(1L, cast(p as int))")).otherwise(lit(0L)).as("bit"))
        .groupBy(col(idc))
        .agg(sum(col("bit")).as("bucket"), first(col(vc)).as(vc))

    def newBucketOf(planes: DataFrame, df: DataFrame, idc: String,
        vc: String): DataFrame = {
      val planes1 = planes
        .agg(sort_array(collect_list(struct(col("p"), col("w")))).as("pws"))
      val bucket = (0 until nPlanes).map { p =>
        when(Vec.dot(col(vc),
            element_at(col("pws"), p + 1).getField("w")) > lit(0.0),
          lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      df.join(broadcast(planes1))
        .select(col(idc), col(vc), bucket.as("bucket"))
    }

    def run(corpusNew: Boolean, queryNew: Boolean): DataFrame = {
      val e = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      val queries = emb.filter(col("vec_id") % 50 === 0)
      // the official gate job
      queries.agg(count(lit(1)), coalesce(max(size(col("embedding"))),
        lit(0))).head()
      val planes = planesOf(e)
      val spread = if (e.rdd.getNumPartitions <
          spark.sparkContext.defaultParallelism) e.repartition(32) else e
      val bucketed = (if (corpusNew) newBucketOf(planes, spread, "id", "v")
        else oldBucketOf(planes, spread, "id", "v"))
        .filter(nonZero(col("v")))
      val qin = queries.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
        .filter(nonZero(col("qv")))
      val q = if (queryNew) newBucketOf(planes, qin, "qid", "qv")
        else oldBucketOf(planes, qin, "qid", "qv")
      val ball = (0L until (1L << nPlanes))
        .filter(m => java.lang.Long.bitCount(m) <= maxHamming)
      val probes = q.select(col("qid"), col("qv"), col("bucket").as("qb"),
        explode(lit(ball.toArray)).as("mask"))
        .select(col("qid"), col("qv"),
          col("mask").bitwiseXOR(col("qb")).as("bucket"))
      val cand = bucketed
        .join(broadcast(probes), "bucket")
        .filter(col("id") =!= col("qid"))
        .withColumn("cos", Vec.cosine(col("v"), col("qv")))
        .select(col("qid"), col("id"), col("bucket"), col("cos"))
      org.apache.spark.sql.graft.TopKPerGroup(cand, k, Seq(col("qid")),
        Seq(col("cos").desc, col("id").asc))
    }

    for (rep <- 0 until 3) {
      for ((tag, cn, qn) <- Seq(("newC+newQ", true, true),
          ("newC+oldQ", true, false), ("oldC+newQ", false, true),
          ("oldC+oldQ", false, false))) {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        run(cn, qn).queryExecution.toRdd.foreach(_ => ())
        println(f"== $tag rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
