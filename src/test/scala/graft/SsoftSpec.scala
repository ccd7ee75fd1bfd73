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

  test("sHG1G2 spin fit recovers synthetic spin parameters") {
    val rng = new java.util.Random(5L)
    val n = 120
    val phase = Array.fill(n)(math.toRadians(rng.nextDouble() * 25))
    val ra = Array.fill(n)(rng.nextDouble() * 2 * math.Pi)
    val dec = Array.fill(n)(math.toRadians(rng.nextDouble() * 60 - 30))
    val band = Array.tabulate(n)(i => 1 + i % 2)
    val truth = Array(14.0, 14.4, 0.25, 0.2, 0.6, 2.0, 0.3)
    val mag = Array.tabulate(n) { i =>
      PhaseCurve.shg1g2Mag(if (band(i) == 1) truth(0) else truth(1),
        truth(2), truth(3), truth(4), truth(5), truth(6),
        phase(i), ra(i), dec(i))
    }
    val sigma = Array.fill(n)(0.02)
    val r = PhaseCurve.fitSHG1G2(phase, ra, dec, band, mag, sigma)
    assert(math.abs(r.params(0) - truth(0)) < 0.1, s"H_g: ${r.params(0)}")
    assert(math.abs(r.params(1) - truth(1)) < 0.1, s"H_r: ${r.params(1)}")
    assert(r.params(4) >= 0.1 && r.params(4) <= 1.0)
    assert(r.chi2red < 1.0, s"chi2red: ${r.chi2red}")
  }

  test("SSOFT spin build runs on the 3-object fixture") {
    val agg = spark.read.parquet(fixture)
    val out = Ssoft.buildWithSpin(spark, agg, nmin = 50)
    val rows = out.select("ssnamenr", "spin.h_g", "spin.oblateness",
      "spin.chi2red", "spin.n_obs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ob = r.getDouble(2)
      assert(ob.isNaN || (ob >= 0.1 && ob <= 1.0))
      assert(r.getInt(4) >= 10)
    }
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
