package graft

import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.{BloomAgg, BloomMightContain, GraftBloom}
import graft.text.Decontaminate

/** Bloom filter aggregate + probe (d12): the no-false-negatives
  * guarantee, fpp sanity, partition-invariance of the distributed
  * build, sizing math, the SQL surface, and the bloom-pruned
  * decontamination path's exactness + plan shape.
  */
class BloomFilterSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new scala.util.Random(41)
  private val members = Seq.fill(5000)(rnd.nextLong()).distinct
  private val memberSet = members.toSet
  private val nonMembers =
    Iterator.continually(rnd.nextLong()).filterNot(memberSet).take(5000).toSeq

  private def build(df: org.apache.spark.sql.DataFrame, numBits: Long,
      numHashes: Int): Array[Byte] =
    df.agg(BloomAgg(col("v"), numBits, numHashes).as("bf"))
      .head().getAs[Array[Byte]](0)

  test("no false negatives: every inserted value probes true") {
    val (m, k) = GraftBloom.size(members.size, 0.01, 32L << 20)
    val bf = build(members.toDF("v"), m, k)
    val misses = members.toDF("v")
      .filter(!BloomMightContain(lit(bf), col("v"))).count()
    assert(misses === 0L, "a Bloom filter can never miss an inserted value")
  }

  test("false-positive rate lands near the sizing target") {
    val (m, k) = GraftBloom.size(members.size, 0.01, 32L << 20)
    val bf = build(members.toDF("v"), m, k)
    val fp = nonMembers.toDF("v")
      .filter(BloomMightContain(lit(bf), col("v"))).count()
    // target 1% over 5000 probes ~ 50; 5x headroom for hash variance
    assert(fp <= 250L, s"observed fpp ${fp / 5000.0} far above the 1% target")
  }

  test("distributed build is partitioning-invariant (merges are ORs)") {
    val (m, k) = GraftBloom.size(members.size, 0.01, 32L << 20)
    val one = build(members.toDF("v").coalesce(1), m, k)
    val many = build(members.toDF("v").repartition(13), m, k)
    assert(java.util.Arrays.equals(one, many),
      "bit-identical filter however partial aggregation is ordered")
  }

  test("sizing math: optimal bits/hashes at the textbook values") {
    // n=1e6 at 1%: m = -n ln(.01)/ln(2)^2 ~ 9.585e6 bits, k ~ 7
    val m = GraftBloom.optimalBits(1000000L, 0.01)
    assert(m > 9500000L && m < 9700000L, s"unexpected m=$m")
    assert(GraftBloom.optimalHashes(m, 1000000L) === 7)
    // the byte cap clamps m and re-optimizes k downward
    val (mc, kc) = GraftBloom.size(1000000L, 0.01, 100000L)
    assert(mc === 800000L && kc < 7 && kc >= 1)
  }

  test("empty build: zero-row aggregate yields the always-false filter") {
    val bf = build(members.toDF("v").filter(lit(false)), 1L << 10, 3)
    val hits = members.take(100).toDF("v")
      .filter(BloomMightContain(lit(bf), col("v"))).count()
    assert(hits === 0L)
  }

  test("SQL surface: bloom_agg and bloom_might_contain are registered") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    members.take(50).toDF("v").createOrReplaceTempView("bloom_in")
    // the probe's filter side must be a literal (the collected one-row
    // bloom_agg result) — from SQL that is a binary X'..' literal
    val bf = spark.sql("SELECT bloom_agg(v, 4096, 3) AS filt FROM bloom_in")
      .head().getAs[Array[Byte]](0)
    val hex = bf.map(b => f"$b%02X").mkString
    val row = spark.sql(
      s"""SELECT count(*) AS n FROM bloom_in
         |WHERE bloom_might_contain(X'$hex', v)""".stripMargin).head()
    assert(row.getLong(0) === 50L)
  }

  test("d12 bloom-pruned decontamination equals the exact d7 report") {
    val docs = Tables.t(spark, sf, "documents")
    val exact = Decontaminate.flags(docs, "doc_id", "text",
      col("doc_id") % 97 === 0, 4).orderBy("doc_id").collect()
    val pruned = Decontaminate.flagsBloomPruned(docs, "doc_id", "text",
      col("doc_id") % 97 === 0, 4).orderBy("doc_id").collect()
    assert(exact.length > 0)
    assert(pruned.toSeq === exact.toSeq,
      "the bloom filter may only prune, never change the report")
  }

  test("bloom-pruned plan probes map-side, below the verify join") {
    val docs = Tables.t(spark, sf, "documents")
    val df = Decontaminate.flagsBloomPruned(docs, "doc_id", "text",
      col("doc_id") % 97 === 0, 4)
    val plan = df.queryExecution.optimizedPlan
    // the probe must sit in a Filter on the corpus side (strictly below
    // the join), so non-candidate grams die before any exchange
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    val probeFilters = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.exists(_.isInstanceOf[
          org.apache.spark.sql.graft.BloomMightContain]) => f }
    assert(probeFilters.nonEmpty, "bloom_might_contain filter missing")
    assert(joins.exists(j =>
        j.left.exists(n => probeFilters.exists(_ eq n)) ||
        j.right.exists(n => probeFilters.exists(_ eq n))),
      "the probe filter must be under a join input, not above the join")
  }

  test("probe requires a foldable filter argument") {
    val df = Seq((Array[Byte](0, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0, 0), 1L))
      .toDF("bf", "v")
    val err = intercept[Exception] {
      df.select(BloomMightContain(col("bf"), col("v"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"))
  }
}
