package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{RainbowFit, SlsnFeatures}

class SlsnFeaturesSpec extends AnyFunSuite {

  // synthetic two-band curve: bazin-rainbow model, 30 points over 80 d
  private def synthetic(): (Array[Double], Array[Int], Array[Double], Array[Double]) = {
    val truth = Array(20.0, 0.0, 6.0, 40.0, 6000.0, 14000.0, 12.0)
    val n = 30
    val jd = Array.tabulate(n)(i => 2460000.0 + i * 80.0 / (n - 1))
    val fid = Array.tabulate(n)(i => 1 + (i % 2))
    val c = 2.99792458e8
    val flux = Array.tabulate(n) { i =>
      val nu = c / (SlsnFeatures.BandWaveAA(fid(i)) * 1e-10)
      // scale amplitude so fluxes land in a SNANA-plausible range
      truth(1) = 1e6
      RainbowFit.bazinModelFlux(
        Array(jd(i) - 2460020.0 - truth(0) + 20.0, truth(1), truth(2),
          truth(3), truth(4), truth(5), truth(6)), jd(i) - 2460000.0, nu) * 1e28
    }
    val mag = flux.map(f => 27.5 - 2.5 * math.log10(math.max(f, 1e-3)))
    val sigma = Array.fill(n)(0.02)
    (jd, fid, mag, sigma)
  }

  test("gates: too few per-band points / short span return None") {
    val (jd, fid, mag, sigma) = synthetic()
    // all points in band 1 -> band 2 has 0 < 3 points
    assert(SlsnFeatures.features(jd, fid.map(_ => 1), mag, sigma, 1.0).isEmpty)
    // 6 points total (<= 7)
    assert(SlsnFeatures.features(jd.take(6), fid.take(6), mag.take(6),
      sigma.take(6), 1.0).isEmpty)
    // compressed to a 10-day span (< 30d min duration)
    val shortJd = jd.map(t => 2460000.0 + (t - 2460000.0) / 8.0)
    assert(SlsnFeatures.features(shortJd, fid, mag, sigma, 1.0).isEmpty)
  }

  test("feature map covers the model's 27 training features, NaN-free") {
    val (jd, fid, mag, sigma) = synthetic()
    val feats = SlsnFeatures.features(jd, fid, mag, sigma, 1.5)
    assert(feats.isDefined)
    val m = feats.get
    graft.models.XgbUbjson.TrainingFeatureOrder.foreach { k =>
      assert(m.contains(k), s"missing feature $k")
      assert(!m(k).isNaN, s"NaN feature $k")
    }
    assert(m("duration") > 30.0)
    assert(m("distnr") === 1.5)
    // flux stats: amplitude positive, normed std in (0, 1), q15 < q85
    assert(m("flux_amplitude") > 0)
    assert(m("std_flux") > 0 && m("std_flux") < 1)
    assert(m("q15") < m("q85"))
  }

  test("fitBazin recovers a synthetic bazin-rainbow curve") {
    val n = 40
    val t = Array.tabulate(n)(i => -30.0 + i * 100.0 / (n - 1))
    val band = Array.tabulate(n)(i => (1 + i % 2).toDouble)
    val c = 2.99792458e8
    val truth = Array(0.0, 1e30, 8.0, 35.0, 6000.0, 13000.0, 10.0)
    val flux = Array.tabulate(n) { i =>
      val nu = c / (SlsnFeatures.BandWaveAA(band(i).toInt) * 1e-10)
      RainbowFit.bazinModelFlux(truth, t(i), nu)
    }
    val err = flux.map(f => math.max(math.abs(f) * 0.01, 1e-6))
    val r = RainbowFit.fitBazin(t, band, flux, err, SlsnFeatures.BandWaveAA)
    // noiseless curve: fit must land close on the time/shape parameters
    assert(math.abs(r.params(0) - truth(0)) < 2.0, s"t0 ${r.params(0)}")
    assert(math.abs(r.params(2) - truth(2)) / truth(2) < 0.3, s"rise ${r.params(2)}")
    assert(math.abs(r.params(3) - truth(3)) / truth(3) < 0.3, s"fall ${r.params(3)}")
    // LM with numeric Jacobian plateaus ~0.5σ residuals on this stiff
    // 7-param problem (documented solver-level deviation vs iminuit)
    assert(r.reducedChi2 < 50.0, s"chi2 ${r.reducedChi2}")
    assert(r.errors.forall(e => e > 0 && !e.isNaN))
    // features layout: 7 values ++ 7 snrs ++ chi2
    assert(r.features.length === 15)
  }

  test("fitBazin under 8 points yields NaN params") {
    val t = Array.tabulate(7)(_.toDouble)
    val band = Array.fill(7)(1.0)
    val r = RainbowFit.fitBazin(t, band, t.map(_ + 1), Array.fill(7)(0.1),
      SlsnFeatures.BandWaveAA)
    assert(r.params.forall(_.isNaN))
  }
}
