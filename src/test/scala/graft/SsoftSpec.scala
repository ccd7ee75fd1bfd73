package graft

import org.apache.spark.sql.functions._

import graft.kernels.PhaseCurve
import graft.operators.Ssoft

class SsoftSpec extends SparkSpec {

  val fixture =
    "/root/reference/fink_science/data/alerts/sso_ztf_lc_aggregated_202504_three_obj.parquet"

  test("HG fit recovers synthetic phase-curve parameters") {
    val h = 14.2; val g = 0.18
    val alpha = (1 to 60).map(i => math.toRadians(i * 0.4)).toArray
    val mag = alpha.map(a => PhaseCurve.hgMag(h, g, a))
    val sigma = Array.fill(alpha.length)(0.02)
    val r = PhaseCurve.fitHG(alpha, mag, sigma)
    assert(math.abs(r.params(0) - h) < 0.01, s"H: ${r.params(0)}")
    assert(math.abs(r.params(1) - g) < 0.02, s"G: ${r.params(1)}")
    assert(r.chi2red < 1e-6)
  }

  test("HG1G2 fit runs and respects bounds") {
    val alpha = (1 to 60).map(i => math.toRadians(i * 0.4)).toArray
    val mag = alpha.map(a => PhaseCurve.hg1g2Mag(14.0, 0.3, 0.2, a))
    val r = PhaseCurve.fitHG1G2(alpha, mag, Array.fill(alpha.length)(0.02))
    assert(math.abs(r.params(0) - 14.0) < 0.05)
    assert(r.params(1) >= 0 && r.params(1) <= 1)
    assert(r.params(2) >= 0 && r.params(2) <= 1)
  }

  test("SSOFT build on the 3-object fixture yields per-band parameters") {
    val agg = spark.read.parquet(fixture)
    val out = Ssoft.build(spark, agg, nmin = 50)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 3)
    out.select("ssnamenr", "fit_g.h", "fit_g.g", "fit_r.h", "fit_r.chi2red",
      "n_days", "n_measurements").collect().foreach { r =>
      val hG = r.getDouble(1)
      val hR = r.getDouble(3)
      // absolute magnitudes of ZTF asteroids land in a sane range
      assert(hG.isNaN || (hG > 5 && hG < 30), s"H_g=$hG")
      assert(hR.isNaN || (hR > 5 && hR < 30), s"H_r=$hR")
      assert(r.getDouble(5) > 0)
      assert(r.getInt(6) >= 50)
    }
    // schema is typed structs, not strings
    assert(out.schema("fit_g").dataType.typeName === "struct")
  }
}
