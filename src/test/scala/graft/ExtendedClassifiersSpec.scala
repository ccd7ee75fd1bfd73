package graft

import org.apache.spark.sql.functions._

import graft.alerts.AlertCols
import graft.operators.{ExtendedClassifiers, Rubin, TransientFeatures}

class ExtendedClassifiersSpec extends SparkSpec {

  test("superluminous: -1 sentinel outside the gate, probability inside") {
    val alerts = spark.read.parquet("/root/reference/fink_science/data/alerts/datatest")
    val df = ExtendedClassifiers.superluminous(spark,
      AlertCols.withHistory(TransientFeatures(alerts), Seq("jd", "magpsf", "sigmapsf")))
    assert(df.count() === 124)
    val bad = df.filter(col("superluminous_score") =!= -1.0 &&
      (col("superluminous_score") < 0 || col("superluminous_score") > 1)).count()
    assert(bad === 0)
    // this fixture is dominated by variable stars: most rows are gated out
    assert(df.filter(col("superluminous_score") === -1.0).count() > 60)
  }

  test("transient filter golden: exactly 2 of 57 alerts in part-00003 pass") {
    val df = spark.read.parquet("/root/reference/fink_science/data/alerts/datatest/" +
      "part-00003-bdab8e46-89c4-4ac1-8603-facd71833e8a-c000.snappy.parquet")
    val out = TransientFeatures(df)
      .withColumn("is_transient", ExtendedClassifiers.isTransient)
    assert(out.count() === 57)
    assert(out.filter(col("is_transient")).count() === 2)
  }

  test("rubin orphan + slsn scores respect sentinels and bounds") {
    val alerts = spark.read.parquet("/root/reference/fink_science/data/alerts/or4_lsst7.1")
    val series = Rubin.withHistory(alerts,
      Seq("psfFlux", "psfFluxErr", "midpointMjdTai", "band"))
    val out = ExtendedClassifiers.slsnRubin(spark,
      ExtendedClassifiers.orphanGrb(spark, series))
    assert(out.count() === 50)
    Seq("p_orphan", "slsn_score").foreach { c =>
      val bad = out.filter(col(c) =!= -1.0 && (col(c) < 0 || col(c) > 1)).count()
      assert(bad === 0, c)
      assert(out.filter(col(c) =!= -1.0).count() > 0, s"$c never computed")
    }
  }
}
