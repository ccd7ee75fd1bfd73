package graft.kernels

/** Per-band sigmoid-rise light-curve fit — the feature kernel behind the
  * early-SN-Ia random forest (reference: actsnfink features consumed at
  * ztf/random_forest_snia/processor.py:77-216; the rise of a young SN in
  * flux space is modeled as f(t) = c / (1 + exp(-a (t - b)))).
  *
  * Deterministic Gauss-Newton with analytic Jacobian and fixed
  * iteration budget (no RNG), so results are partition-independent.
  */
object SigmoidFit {

  /** (a, b, c, snratio, chisq, mse, nrise) for one band's
    * (t, flux, sigma); NaNs when fewer than 3 points. `chisq` is the
    * sigma-weighted mean squared residual, `mse` the plain one
    * (sklearn mean_squared_error, the "mse" feature of the bundled
    * early-SN-Ia forests — feature_names_in_ lists a,b,c,snratio,mse,
    * nrise per band).
    */
  final case class Result(a: Double, b: Double, c: Double,
      snratio: Double, chisq: Double, mse: Double, nrise: Int)

  def fit(t0: Array[Double], flux: Array[Double], sigma: Array[Double]): Result = {
    val n = flux.length
    if (n < 3)
      return Result(Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
        Double.NaN, countRising(flux))

    // shift time origin for conditioning
    val tMin = t0.min
    val t = t0.map(_ - tMin)

    // initial guesses: c ~ max flux, b ~ mid-time, a ~ 1/span
    val span = math.max(t.max - t.min, 1e-6)
    var a = 4.0 / span
    var b = t.sum / n
    var c = flux.max

    var iter = 0
    while (iter < 50) {
      // residuals and Jacobian
      var jtj00 = 0.0; var jtj01 = 0.0; var jtj02 = 0.0
      var jtj11 = 0.0; var jtj12 = 0.0; var jtj22 = 0.0
      var jtr0 = 0.0; var jtr1 = 0.0; var jtr2 = 0.0
      var i = 0
      while (i < n) {
        val e = math.exp(-a * (t(i) - b))
        val den = 1.0 + e
        val f = c / den
        val w = 1.0 / (sigma(i) * sigma(i))
        val r = flux(i) - f
        // df/da = c (t-b) e / den^2 ; df/db = -c a e / den^2 ; df/dc = 1/den
        val g = c * e / (den * den)
        val ja = g * (t(i) - b)
        val jb = -g * a
        val jc = 1.0 / den
        jtj00 += w * ja * ja; jtj01 += w * ja * jb; jtj02 += w * ja * jc
        jtj11 += w * jb * jb; jtj12 += w * jb * jc; jtj22 += w * jc * jc
        jtr0 += w * ja * r; jtr1 += w * jb * r; jtr2 += w * jc * r
        i += 1
      }
      // solve 3x3 (JtWJ + λI) d = JtWr with a small fixed damping
      val lm = 1e-8
      val m = Array(
        Array(jtj00 + lm, jtj01, jtj02),
        Array(jtj01, jtj11 + lm, jtj12),
        Array(jtj02, jtj12, jtj22 + lm))
      val rhs = Array(jtr0, jtr1, jtr2)
      val d = solve3(m, rhs)
      if (d == null) iter = 50
      else {
        a += d(0); b += d(1); c += d(2)
        if (math.abs(d(0)) < 1e-12 && math.abs(d(1)) < 1e-10 &&
          math.abs(d(2)) < 1e-10) iter = 50
        else iter += 1
      }
    }

    var chisq = 0.0
    var mse = 0.0
    var i = 0
    while (i < n) {
      val f = c / (1.0 + math.exp(-a * (t(i) - b)))
      val raw = flux(i) - f
      val r = raw / sigma(i)
      chisq += r * r
      mse += raw * raw
      i += 1
    }
    val meanFlux = flux.sum / n
    val meanSig = sigma.sum / n
    Result(a, b, c, if (meanSig > 0) meanFlux / meanSig else Double.NaN,
      chisq / n, mse / n, countRising(flux))
  }

  /** Number of consecutive rising flux steps from the start. */
  def countRising(flux: Array[Double]): Int = {
    var i = 1
    var nr = 0
    while (i < flux.length && flux(i) >= flux(i - 1)) { nr += 1; i += 1 }
    nr
  }

  /** Gaussian elimination for a 3x3 system; null if singular. */
  private def solve3(m: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val a = Array(m(0).clone(), m(1).clone(), m(2).clone())
    val x = b.clone()
    var col = 0
    while (col < 3) {
      var piv = col
      var r = col + 1
      while (r < 3) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (math.abs(a(piv)(col)) < 1e-300) return null
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t
        val tb = x(piv); x(piv) = x(col); x(col) = tb }
      r = col + 1
      while (r < 3) {
        val f = a(r)(col) / a(col)(col)
        var k = col
        while (k < 3) { a(r)(k) -= f * a(col)(k); k += 1 }
        x(r) -= f * x(col)
        r += 1
      }
      col += 1
    }
    val out = new Array[Double](3)
    var row = 2
    while (row >= 0) {
      var s = x(row)
      var k = row + 1
      while (k < 3) { s -= a(row)(k) * out(k); k += 1 }
      out(row) = s / a(row)(row)
      row -= 1
    }
    out
  }
}
