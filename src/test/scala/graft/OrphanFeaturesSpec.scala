package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.OrphanFeatures

/** Pins the orphan feature kernels row-for-row against values computed
  * by executing the reference's own numpy implementation
  * (rubin/orphans/features_extraction.py + fit.py rescale_filters) on
  * the same deterministic synthetic curve.
  */
class OrphanFeaturesSpec extends AnyFunSuite {

  // ((i*2654435761) mod 1000)/1000 — shared with the Python golden run
  private val rng = Array.tabulate(60)(i => ((i * 2654435761L) % 1000) / 1000.0)
  private val t = rng.take(20).map(_ * 30.0).sorted
  private val m = rng.slice(20, 40).map(20.0 + _ * 3.0)
  private val bands = Array("u", "g", "r", "i", "z", "y")
  private val f = rng.slice(40, 60).map(v => bands((v * 6).toInt % 6))
  private val e = rng.slice(40, 60).map(0.05 + _ * 0.1)

  test("duration matches the reference kernel") {
    assert(math.abs(OrphanFeatures.duration(t, m) - 8.489999999999998) < 1e-12)
  }

  test("rates match the reference kernel (zeros-in-mean quirk included)") {
    val (inc, d1, d3) = OrphanFeatures.rates(t, m, f)
    assert(math.abs(inc - -0.07196631996037649) < 1e-12, s"inc $inc")
    assert(math.abs(d1 - 0.003760683760683701) < 1e-12, s"d1 $d1")
    assert(math.abs(d3 - 0.003760683760683801) < 1e-12, s"d3 $d3")
  }

  test("colours match the reference kernel") {
    val (gr, ri) = OrphanFeatures.colours(t, m, f)
    assert(math.abs(gr - 0.906) < 1e-12, s"gr $gr")
    assert(math.abs(ri - -0.4710044576523025) < 1e-12, s"ri $ri")
  }

  test("rescale_filters matches: y-band drop, beta pick, band ordering") {
    val (tt, mr, err) = OrphanFeatures.rescaleFilters(t, m, e, f)
    assert(tt.length === 17) // 3 lowercase-y points dropped by the "Y" spelling
    assert(math.abs(tt.sum - 234.11999999999998) < 1e-10)
    assert(math.abs(mr.sum - 362.704203688293) < 1e-9)
    assert(math.abs(err.sum - 1.5174000000000003) < 1e-12)
    val expT = Seq(9.81, 15.66, 20.939999999999998, 26.79, 1.3199999999999998)
    val expM = Seq(21.996840624701797, 22.128840624701787, 22.260840624701807,
      22.392840624701783, 22.770206028424077)
    for (i <- 0 until 5) {
      assert(math.abs(tt(i) - expT(i)) < 1e-12, s"t($i)")
      assert(math.abs(mr(i) - expM(i)) < 1e-9, s"m($i)")
    }
  }

  test("fit reaches a valid weighted least-squares optimum") {
    val (a, b, c, d, chi2) = OrphanFeatures.fitLightCurve(t, m, e, f)
    assert(!a.isNaN && !b.isNaN && !c.isNaN)
    assert(d >= -0.03 && d <= 10.0)
    assert(chi2 >= 0.0)
    // the linear trend of the synthetic curve is weak; fitted slope small
    assert(math.abs(a) < 1.0)
  }

  test("preprocess: inf->1000, NaN->0, row-max normalization") {
    val out = OrphanFeatures.preprocess(
      Array(Double.PositiveInfinity, Double.NaN, -500.0, 250.0))
    assert(out.toSeq === Seq(1.0, 0.0, -0.5, 0.25))
  }
}
