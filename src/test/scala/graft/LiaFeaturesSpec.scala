package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.LiaFeatures

/** Structural checks on the 47-feature LIA reconstruction: domains,
  * ranges and the artifact-confirmed layout properties (the bundled
  * pca.sav training means put counts/fractions/binaries/near-zeros at
  * specific indices — see LiaFeatures' scaladoc).
  */
class LiaFeaturesSpec extends AnyFunSuite {

  private def synth(n: Int, seed: Long, bump: Double = 0.0): (Array[Double], Array[Double]) = {
    val rnd = new java.util.Random(seed)
    val mag = Array.tabulate(n) { i =>
      val base = 18.0 + 0.05 * rnd.nextGaussian()
      // optional microlensing-like brightening bump mid-curve
      val amp = bump * math.exp(-math.pow((i - n / 2.0) / (n / 10.0), 2))
      base - amp
    }
    val err = Array.fill(n)(0.05 + 0.01 * rnd.nextDouble())
    (mag, err)
  }

  test("feature vector shape, finiteness, and index domains") {
    val (mag, err) = synth(40, 1L)
    val f = LiaFeatures.extractAll(mag, err)
    assert(f.length === LiaFeatures.Count)
    assert(f.forall(x => !x.isNaN && !x.isInfinite))
    // counts at 0-2 / 7-9 are integers within [0, n]
    Seq(0, 1, 2, 7, 8, 9).foreach { i =>
      assert(f(i) >= 0 && f(i) <= 40 && f(i) == f(i).floor, s"idx $i: ${f(i)}")
    }
    // 5-sigma outliers do not exist in a quiet curve (pca.mean_ ~ 0)
    assert(f(2) === 0.0 && f(9) === 0.0)
    // binaries at 11-13
    Seq(11, 12, 13).foreach(i => assert(f(i) == 0.0 || f(i) == 1.0, s"idx $i"))
    // fractional locations at 14-15 / 21-22 in [0, 1)
    Seq(14, 15, 21, 22).foreach(i => assert(f(i) >= 0 && f(i) < 1, s"idx $i"))
    // con/con2 ~ 0 on a quiet Gaussian curve (never split on by rf.sav)
    assert(f(17) === 0.0 && f(18) === 0.0)
    // count_above + count_below = n for a continuous curve
    assert(f(19) + f(20) === 40.0)
    // normalized-flux rms in (0, 1]
    assert(f(35) > 0 && f(35) <= 1.0)
    // Stetson K in (0, 1]
    assert(f(42) > 0 && f(42) <= 1.0)
    // meanMag on the magnitude scale
    assert(f(44) > 17 && f(44) < 19)
    // trend ~ 0 for a flat curve
    assert(math.abs(f(45)) < 0.01)
  }

  test("a brightening bump moves the discriminative features") {
    val (flatM, flatE) = synth(60, 2L)
    val (bumpM, bumpE) = synth(60, 2L, bump = 2.0)
    val flat = LiaFeatures.extractAll(flatM, flatE)
    val bumped = LiaFeatures.extractAll(bumpM, bumpE)
    // amplitude (raw flux) explodes with a 2-mag brightening
    assert(bumped(5) > flat(5) * 3)
    // std_over_mean rises
    assert(bumped(39) > flat(39))
    // skewness goes strongly positive (bright outliers in flux)
    assert(bumped(38) > flat(38) + 1)
    // the bump peaks mid-curve: first_loc_max near 0.5
    assert(math.abs(bumped(21) - 0.5) < 0.1)
  }

  test("deterministic: same curve, same vector") {
    val (mag, err) = synth(33, 7L)
    val a = LiaFeatures.extractAll(mag, err)
    val b = LiaFeatures.extractAll(mag.clone(), err.clone())
    assert(a.sameElements(b))
  }
}
