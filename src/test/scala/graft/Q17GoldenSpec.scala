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

  // golden loading + md5 gating shared with Verify's driver-side gate
  // (GoldenCheck is the single parser of cats_q17_expected.json); skip
  // (not fail) when the driver has regenerated the testdata with a
  // different seed — regenerate via tools/cats_golden.py in that case
  private lazy val golden = GoldenCheck.golden._1
  private def dataMatchesGolden: Boolean =
    GoldenCheck.dataMatchesGolden(sf001)

  test("q17 output matches the independent NumPy golden user-for-user") {
    assume(graft.models.RefModels.cats.isDefined, "model bundle absent")
    assume(dataMatchesGolden, "testdata regenerated since golden was built")
    val rows = SparkEntry.queries("q17_cats_class")(spark, sf001).collect()
    assert(rows.length === golden.size)
    rows.foreach { r =>
      val uid = r.getLong(0)
      val g = golden(uid)
      assert(r.getLong(1) === g.broadClass, s"user $uid broad_class")
      assert(math.abs(r.getDouble(2) - g.pMax) < 1e-9, s"user $uid p_max")
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
      val g = golden(uid).preds
      assert(p.length === g.length)
      p.indices.foreach { i =>
        // float64 saturation means components are 1.0 or ~0; anything
        // near the underflow boundary is allowed denormal slack
        assert(math.abs(p(i) - g(i)) < 1e-9, s"user $uid class $i: ${p(i)} vs ${g(i)}")
      }
    }
  }
}
