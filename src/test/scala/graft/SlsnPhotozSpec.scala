package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.SlsnPhotoz

/** Pins the photo-z veto kernels against the reference's own doctest
  * values (ztf/superluminous/slsn_classifier.py:113-185).
  */
class SlsnPhotozSpec extends AnyFunSuite {

  test("compute_milky_way_extinction doctest: 0.5 mag E(B-V) at 6000A") {
    assert(math.abs(SlsnPhotoz.milkyWayExtinction(0.5, 6000.0) - 1.34) < 5e-3)
  }

  test("abs_peak doctest vectors") {
    val a = SlsnPhotoz.absPeak(Array(19.0), Array(4000.0), 0.2, 0.05, 0.1)
    val expA = Array(-20.92638971, -21.66227902, -22.25186059)
    a.indices.foreach(i =>
      assert(math.abs(a(i) - expA(i)) < 3e-4, s"a($i)=${a(i)}"))

    // negative ebv clamps to zero extinction
    val b = SlsnPhotoz.absPeak(Array(19.0), Array(4000.0), 0.2, 0.05, -1.0)
    val expB = Array(-20.48512533, -21.22101463, -21.81059621)
    b.indices.foreach(i =>
      assert(math.abs(b(i) - expB(i)) < 3e-4, s"b($i)=${b(i)}"))

    // two bands: the brightest band (argmin of central M) is returned
    val c = SlsnPhotoz.absPeak(Array(18.0, 18.0), Array(4400.0, 6600.0),
      0.12, 0.01, 0.5)
    val expC = Array(-22.74727368, -22.96008329, -23.15747603)
    c.indices.foreach(i =>
      assert(math.abs(c(i) - expC(i)) < 3e-3, s"c($i)=${c(i)}"))

    // NaN z or zerr -> NaN triple (doctest rows 3-4)
    assert(SlsnPhotoz.absPeak(Array(19.0), Array(4000.0), 0.2, Double.NaN, 0.1)
      .forall(_.isNaN))
    assert(SlsnPhotoz.absPeak(Array(19.0), Array(4000.0), Double.NaN, 0.05, 0.1)
      .forall(_.isNaN))
  }

  test("veto semantics around not_sl_threshold") {
    // a faint nearby source: peak 19 mag at z=0.01 -> M ~ -14, far above
    // (fainter than) -19.75 -> would be vetoed
    val faint = SlsnPhotoz.absPeak(Array(19.0, 19.0), Array(4770.0, 6231.0),
      0.01, 0.001, 0.0)(2)
    assert(faint > -19.75)
    // a luminous distant source: peak 19 mag at z=0.5 -> M ~ -23 -> kept
    val lum = SlsnPhotoz.absPeak(Array(19.0, 19.0), Array(4770.0, 6231.0),
      0.5, 0.01, 0.0)(2)
    assert(lum < -19.75)
  }
}
