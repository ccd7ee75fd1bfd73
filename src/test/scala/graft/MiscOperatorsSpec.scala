package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnomalyFilters, Ssoft}
import graft.xmatch.CrossMatch

class MiscOperatorsSpec extends SparkSpec {

  test("anomaly custom SQL filters select the documented subsets") {
    import spark.implicits._
    val df = Seq(
      ("ZTF21aaa", 192.85948, 27.12825), // at the pole -> |cos sep| = 1
      ("ZTF19bbb", 282.85948, 0.0))      // 90 degrees away -> cos sep = 0
      .toDF("objectId", "ra", "dec")
    assert(AnomalyFilters(df, "_beta").collect().map(_.getString(0)).toSeq === Seq("ZTF21aaa"))
    assert(AnomalyFilters(df, "_varvara").count() === 1)
    assert(AnomalyFilters(df, "_unknown").count() === 2)
  }

  test("ssoft noise columns are deterministic and partitioning-independent") {
    import spark.implicits._
    val df = Seq(("obj1", Seq(1.0, 2.0, 3.0)), ("obj2", Seq(4.0, 5.0)))
      .toDF("ssnamenr", "cra")
    val a = Ssoft.withNoiseColumns(df).select("ssnamenr", "cdx", "cdy")
      .collect().map(r => r.getString(0) -> (r.getSeq[Double](1), r.getSeq[Double](2))).toMap
    val b = Ssoft.withNoiseColumns(df.repartition(7)).select("ssnamenr", "cdx", "cdy")
      .collect().map(r => r.getString(0) -> (r.getSeq[Double](1), r.getSeq[Double](2))).toMap
    assert(a === b)
    assert(a("obj1")._1.length === 3)
    assert(a("obj1")._1 !== a("obj1")._2) // cdx and cdy independent
  }

  test("crossmatch carries struct/map payloads with defaults (mangrove shape)") {
    import spark.implicits._
    val alerts = Seq(("A", 10.0, 20.0), ("B", 120.0, 5.0)).toDF("id", "ra", "dec")
    val cat = Seq((10.0, 20.0 + 0.5 / 3600.0,
      Map("HyperLEDA_name" -> "NGC1", "lum_dist" -> "12.3")))
      .toDF("cra", "cdec", "payload")
    val out = CrossMatch.closestWithin(alerts, cat, 1.5, "id", "ra", "dec",
      "cra", "cdec", Seq("payload"),
      Map("payload" -> map(lit("HyperLEDA_name"), lit("None"), lit("lum_dist"), lit("-1"))))
    val got = out.select("id", "payload").collect()
      .map(r => r.getString(0) -> r.getMap[String, String](1)).toMap
    assert(got("A")("HyperLEDA_name") === "NGC1")
    assert(got("B")("HyperLEDA_name") === "None")
    assert(got("B")("lum_dist") === "-1")
  }
}
