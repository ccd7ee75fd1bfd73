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
}
