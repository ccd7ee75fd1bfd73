package graft.kernels

import java.util.Random

/** Fast-transient magnitude-rate kernel — reference:
  * ztf/fast_transient_rate/processor.py:33-300 and utils.py:18-32.
  *
  * Per-row, fully deterministic given (inputs, seed): the per-row RNG is
  * seeded from (seed, row content), so results are independent of
  * partitioning and batch composition. This deliberately diverges from
  * the reference, whose "distribution fix" shifts samples by the global
  * minimum over the whole pandas batch
  * (processor.py:246-262) — making its MC outputs depend on how rows
  * were batched. Deterministic fields (jd_first_real_det,
  * jdstarthist_dt, delta_time, from_upper) match the reference exactly;
  * MC fields (mag_rate, sigma_rate, lower/upper_rate) are the same
  * estimator without the batch-global shift: negative/zero flux samples
  * are clamped per-sample to machine epsilon instead.
  */
object FastTransientKernel {

  /** FLUXCAL conversions (utils.py:18-24). */
  def toFlux(mag: Double): Double = math.pow(10.0, 0.4 * (27.5 - mag))
  def toFluxErr(magErr: Double, flux: Double): Double =
    magErr * flux * math.log(10.0) / 2.5

  final case class LastAlert(mag: Double, sigma: Double, upper: Double,
      jd: Double, jdFirstRealDet: Double)

  final case class FtRate(
      jd_first_real_det: Double, jdstarthist_dt: Double,
      mag_rate: Double, sigma_rate: Double,
      lower_rate: Double, upper_rate: Double,
      delta_time: Double, from_upper: Boolean)

  /** Backward scan for the last same-band measurement
    * (processor.py:33-101): walks history from the most recent entry,
    * stops at the first same-fid epoch (detection or upper limit) or at
    * any fid>2 epoch (neither g nor r).
    */
  def lastAlert(fid: Int, cfid: Array[Int], cmagpsf: Array[Double],
      csigmapsf: Array[Double], cdiffmaglim: Array[Double],
      cjd: Array[Double]): LastAlert = {
    var first = Double.NaN
    var i = 0
    while (i < cmagpsf.length && first.isNaN) {
      // float32 cast before the NaN test, as the reference does
      if (!java.lang.Float.isNaN(cmagpsf(i).toFloat)) first = cjd(i)
      i += 1
    }
    var idx = cfid.length - 2
    while (idx >= 0) {
      if (cfid(idx) > 2)
        return LastAlert(Double.NaN, Double.NaN, Double.NaN, Double.NaN, first)
      if (cfid(idx) == fid) {
        return if (cmagpsf(idx).isNaN)
          LastAlert(Double.NaN, Double.NaN, cdiffmaglim(idx), cjd(idx), first)
        else
          LastAlert(cmagpsf(idx), csigmapsf(idx), cdiffmaglim(idx), cjd(idx), first)
      }
      idx -= 1
    }
    LastAlert(Double.NaN, Double.NaN, Double.NaN, Double.NaN, first)
  }

  private val Eps = java.lang.Math.ulp(1.0) // np.finfo(float).eps

  /** SplitMix64 mix for the per-row seed. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Full rate computation for one row. */
  def rate(fid: Int, cfid: Array[Int], cmagpsf: Array[Double],
      csigmapsf: Array[Double], cdiffmaglim: Array[Double], cjd: Array[Double],
      jd: Double, jdstarthist: Double, magpsf: Double, sigmapsf: Double,
      n: Int, seed: Long): FtRate = {
    val last = lastAlert(fid, cfid, cmagpsf, csigmapsf, cdiffmaglim, cjd)
    val dt = jd - last.jd
    val jdstarthistDt = last.jdFirstRealDet - jdstarthist
    val fromUpper = last.mag.isNaN && !last.upper.isNaN

    val haveMag = !last.mag.isNaN
    if (!haveMag && !fromUpper)
      return FtRate(last.jdFirstRealDet, jdstarthistDt, Double.NaN,
        Double.NaN, Double.NaN, Double.NaN, dt, false)

    val rng = new Random(mix(seed ^
      java.lang.Double.doubleToLongBits(jd) * 31 +
      java.lang.Double.doubleToLongBits(magpsf)))

    val curFlux = toFlux(magpsf)
    val curErr = toFluxErr(sigmapsf, curFlux)
    val samples = new Array[Double](n)
    var i = 0
    if (haveMag) {
      val lastFlux = toFlux(last.mag)
      val lastErr = toFluxErr(last.sigma, lastFlux)
      while (i < n) {
        val c = math.max(curFlux + rng.nextGaussian() * curErr, Eps)
        val l = math.max(lastFlux + rng.nextGaussian() * lastErr, Eps)
        samples(i) = -2.5 * math.log10(c / l) / dt
        i += 1
      }
    } else {
      val upperFlux = toFlux(last.upper)
      while (i < n) {
        val c = math.max(curFlux + rng.nextGaussian() * curErr, Eps)
        val l = math.max(rng.nextDouble() * upperFlux, Eps)
        samples(i) = -2.5 * math.log10(c / l) / dt
        i += 1
      }
    }

    var sum = 0.0
    i = 0
    while (i < n) { sum += samples(i); i += 1 }
    val mean = sum / n
    var ss = 0.0
    i = 0
    while (i < n) { val d = samples(i) - mean; ss += d * d; i += 1 }
    val std = math.sqrt(ss / n) // population std, np.std default

    java.util.Arrays.sort(samples)
    FtRate(last.jdFirstRealDet, jdstarthistDt, mean, std,
      percentileSorted(samples, 5.0), percentileSorted(samples, 95.0),
      dt, fromUpper)
  }

  /** np.percentile linear interpolation on a pre-sorted array. */
  def percentileSorted(sorted: Array[Double], q: Double): Double = {
    val pos = (sorted.length - 1) * q / 100.0
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }
}
