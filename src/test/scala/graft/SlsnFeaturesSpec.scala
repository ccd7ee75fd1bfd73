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

  // the slsn-rubin wavelengths (rubin/slsn/feature_extraction.py:178)
  private val slsnWave = Map("u" -> 3751.0, "g" -> 4742.0, "r" -> 6173.0,
    "i" -> 7502.0, "z" -> 8679.0, "y" -> 9711.0)

  test("linexp bolometric shape: zero before t0, peak amplitude at t0+rise") {
    // p = (t0, A, rise, Tmin, Tmax, t_color)
    val p = Array(-20.0, 1e28, 15.0, 6000.0, 12000.0, 10.0)
    val nu = 2.99792458e8 / (slsnWave("r") * 1e-10)
    assert(RainbowFit.linexpModelFlux(p, -25.0, nu) === 0.0,
      "flux before the reference time must be exactly zero")
    // s(t) peaks (=1) at dt=rise: flux at t0+rise must beat neighbors
    val atPeak = RainbowFit.linexpModelFlux(p, -5.0, nu)
    assert(atPeak > RainbowFit.linexpModelFlux(p, -12.0, nu))
    assert(atPeak > RainbowFit.linexpModelFlux(p, 5.0, nu))
    // long after peak the exponential term dominates: monotone decay
    assert(RainbowFit.linexpModelFlux(p, 30.0, nu) >
      RainbowFit.linexpModelFlux(p, 60.0, nu))
  }

  test("fitLinexp recovers a synthetic linexp-rainbow curve") {
    val n = 48
    val bands = Array("g", "r", "i")
    val t = Array.tabulate(n)(i => -35.0 + i * 120.0 / (n - 1))
    val band = Array.tabulate(n)(i => bands(i % 3))
    val c = 2.99792458e8
    val truth = Array(-25.0, 1e28, 20.0, 6000.0, 13000.0, 10.0)
    val flux = Array.tabulate(n) { i =>
      val nu = c / (slsnWave(band(i)) * 1e-10)
      RainbowFit.linexpModelFlux(truth, t(i), nu)
    }
    val err = flux.map(f => math.max(math.abs(f) * 0.01, 1e-6))
    val r = RainbowFit.fitLinexp(t, band, flux, err, slsnWave)
    // feature order: reference_time, rise_time, amplitude, Tmin, Tmax,
    // t_color, fit_error
    assert(r.length === 7)
    assert(math.abs(r(0) - truth(0)) < 2.0, s"reference_time ${r(0)}")
    assert(math.abs(r(1) - truth(2)) / truth(2) < 0.3, s"rise_time ${r(1)}")
    assert(r(2) > 0, s"amplitude ${r(2)}")
    assert(r(6) < 50.0, s"fit_error ${r(6)}")
  }

  test("fitLinexp failure sentinel is the reference's -9.0 septet") {
    // 6 points < 7 required: apply_rainbow's RuntimeError convention
    val t = Array.tabulate(6)(_.toDouble)
    val r = RainbowFit.fitLinexp(t, Array.fill(6)("g"), t.map(_ + 1),
      Array.fill(6)(0.1), slsnWave)
    assert(r.toSeq === Seq.fill(7)(-9.0))
  }
}
