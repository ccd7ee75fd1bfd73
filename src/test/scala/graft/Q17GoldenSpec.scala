package graft

import org.apache.spark.sql.functions._

import graft.queries.AlertQueries

/** End-to-end pin of the q17_cats_class pipeline against the committed
  * tools/cats_golden.py fixture: an independent NumPy implementation of
  * the panel construction, the reference preprocessing, and the full
  * CATS forward (architecture rebuilt from the archive's config.json)
  * over the sf0.01 events table. Every user's full probability vector,
  * broad class and p_max must agree — this covers the band mapping,
  * struct-array sort order, <2-point gate, tensor assembly and argmax
  * that CatsModelSpec's model-level pins cannot see.
  */
class Q17GoldenSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private lazy val (golden, expectedMd5): (Map[Long, (Int, Double, Array[Double])], String) = {
    val url = getClass.getResource("/cats_q17_expected.json")
    val txt = scala.io.Source.fromURL(url, "UTF-8").mkString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(txt)
    val it = root.fields()
    val out = Map.newBuilder[Long, (Int, Double, Array[Double])]
    var md5 = ""
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey == "_events_md5") md5 = e.getValue.asText()
      else {
        val v = e.getValue
        val preds = (0 until v.get("preds").size())
          .map(i => v.get("preds").get(i).asDouble()).toArray
        out += e.getKey.toLong ->
          ((v.get("broad_class").asInt(), v.get("p_max").asDouble(), preds))
      }
    }
    (out.result(), md5)
  }

  /** Skip (not fail) when the driver has regenerated the testdata with
    * a different seed than the committed golden was built from —
    * regenerate via tools/cats_golden.py in that case.
    */
  private def dataMatchesGolden: Boolean = {
    val f = new java.io.File(s"$sf001/events.parquet")
    f.isFile && {
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      d.map("%02x".format(_)).mkString == expectedMd5
    }
  }

  test("q17 output matches the independent NumPy golden user-for-user") {
    assume(graft.models.RefModels.cats.isDefined, "model bundle absent")
    assume(dataMatchesGolden, "testdata regenerated since golden was built")
    val rows = SparkEntry.queries("q17_cats_class")(spark, sf001).collect()
    assert(rows.length === golden.size)
    rows.foreach { r =>
      val uid = r.getLong(0)
      val (gCls, gMax, _) = golden(uid)
      assert(r.getLong(1) === gCls.toLong, s"user $uid broad_class")
      assert(math.abs(r.getDouble(2) - gMax) < 1e-9, s"user $uid p_max")
    }
  }

  test("full probability vectors agree (saturation included)") {
    assume(graft.models.RefModels.cats.isDefined, "model bundle absent")
    assume(dataMatchesGolden, "testdata regenerated since golden was built")
    val panel = AlertQueries.catsPanel(spark, sf001)
    val preds = graft.operators.Rubin.catsBroadClass(spark, panel)
      .select(col("user_id"), col("cats_preds"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(preds.keySet === golden.keySet)
    preds.foreach { case (uid, p) =>
      val g = golden(uid)._3
      assert(p.length === g.length)
      p.indices.foreach { i =>
        // float64 saturation means components are 1.0 or ~0; anything
        // near the underflow boundary is allowed denormal slack
        assert(math.abs(p(i) - g(i)) < 1e-9, s"user $uid class $i: ${p(i)} vs ${g(i)}")
      }
    }
  }
}
