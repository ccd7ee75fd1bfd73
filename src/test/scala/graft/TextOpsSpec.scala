package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

class TextOpsSpec extends SparkSpec {

  test("fingerprint is invariant under case and extra whitespace") {
    import spark.implicits._
    val df = Seq(
      ("Hello  World foo", "hello world FOO"),
      ("  a b ", "A  B")).toDF("x", "y")
    val r = df.select(
      (TextOps.fingerprint(col("x")) === TextOps.fingerprint(col("y"))).as("eq"))
      .collect()
    assert(r.forall(_.getBoolean(0)))
  }

  test("quality score lies in [0,1] over the corpus") {
    val docs = Tables.t(spark, sf, "documents")
    val mm = docs.select(
      min(TextOps.qualityScore(col("text"))).as("lo"),
      max(TextOps.qualityScore(col("text"))).as("hi")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("langId picks the language with most stopword hits") {
    import spark.implicits._
    val df = Seq(
      "the cat and the dog is in a house",
      "der hund und die katze ist ein tier",
      "xyzzy plugh").toDF("text")
    val got = df.select(TextOps.langId(col("text")).as("l")).collect().map(_.getString(0))
    assert(got(0) === "en")
    assert(got(1) === "de")
    assert(got(2) === "und")
  }

  test("token counts match a manual count") {
    import spark.implicits._
    val df = Seq("a b a c").toDF("text")
    val r = df.select(
      TextOps.tokenCount(col("text")),
      TextOps.distinctTokenCount(col("text"))).head()
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 3L)
  }

  test("bucketed shard packing: dense global ids, local prefix intact, buckets bound the span") {
    val docs = Tables.t(spark, sf, "documents")
    val n = docs.count()
    val out = graft.text.ShardPack.packBucketed(
      docs, "doc_id", "text", "source", budgetTokens = 500L, nBuckets = 4)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length.toLong === n, "every doc packed exactly once")
    // global shard ids are dense 0..K-1 (the renumber leaves no gaps)
    val shards = out.map(_._6).toSet
    assert(shards === (0L until shards.size.toLong).toSet,
      "global shard ids must be dense from 0")
    // within each (source, bucket): shard - shard_local is one constant
    // offset, and local shards are a contiguous 0..max run
    out.groupBy(t => (t._2, t._3)).foreach { case ((src, b), rows) =>
      val offs = rows.map(t => t._6 - t._5).toSet
      assert(offs.size === 1, s"($src,$b) has mixed offsets $offs")
      val locals = rows.map(_._5).toSet
      assert(locals === (0L to rows.map(_._5).max).toSet,
        s"($src,$b) local shards not contiguous")
      // the local prefix-sum semantics match the single-level pack:
      // in doc_id order, a shard closes only once the budget is filled
      val ordered = rows.sortBy(_._1)
      var cum = 0L
      ordered.foreach { t =>
        assert(t._5 === cum / 500L, s"($src,$b) doc ${t._1} shard drifted")
        cum += t._4
      }
    }
    // offsets follow (source, bucket) order: the first shard of each
    // span continues where the previous span ended
    val spanOrder = out.groupBy(t => (t._2, t._3)).toSeq.sortBy(_._1)
    val ends = spanOrder.map(_._2.map(_._6).max)
    val starts = spanOrder.map(_._2.map(_._6).min)
    starts.zip(-1L +: ends.dropRight(1)).foreach { case (s, prevEnd) =>
      assert(s === prevEnd + 1, "global spans must be contiguous in (source,bucket) order")
    }
  }
}
