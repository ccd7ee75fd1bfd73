package graft.kernels

/** Asteroid phase-curve models and weighted nonlinear fits — reference:
  * ztf/ssoft/processor.py:436-671 (which delegates to fink-utils'
  * estimate_sso_params; the models themselves are the published IAU
  * ones: HG Bowell et al. 1989, HG1G2 Muinonen et al. 2010).
  *
  * Fits are weighted Gauss-Newton with analytic-free numeric Jacobians,
  * fixed iteration budgets and parameter clamping to the reference's
  * bounds — fully deterministic.
  */
object PhaseCurve {

  /** phi_1/phi_2 of the HG system (Bowell et al. 1989 approximation). */
  def hgPhi(alpha: Double): (Double, Double) = {
    val t = math.tan(alpha / 2.0)
    (math.exp(-3.33 * math.pow(t, 0.63)), math.exp(-1.87 * math.pow(t, 1.22)))
  }

  /** HG reduced magnitude model. alpha in radians. */
  def hgMag(h: Double, g: Double, alpha: Double): Double = {
    val (p1, p2) = hgPhi(alpha)
    h - 2.5 * math.log10((1 - g) * p1 + g * p2)
  }

  // ---- Muinonen et al. (2010) HG1G2 basis -------------------------
  //
  // The published system: phi1/phi2 are linear in [0, 7.5 deg]
  // (1 - 6a/pi and 1 - 9a/(5 pi)) and cubic splines through tabulated
  // knots out to 150 deg; phi3 is a spline through 9 knots in
  // [0, 30 deg] and zero beyond. Knot VALUES and the linear parts below
  // are the exact published constants (also used by sbpy's HG1G2, which
  // fink-utils' estimate_sso_params calls); between knots we use a
  // monotone (Fritsch-Carlson) cubic Hermite rather than the reference
  // end-derivative spline — knot-exact, C1, non-overshooting, with
  // sub-1e-3 deviation at these knot densities.

  private val D2R = math.Pi / 180.0
  private val phi12Knots = Array(7.5, 30.0, 60.0, 90.0, 120.0, 150.0).map(_ * D2R)
  private val phi1Vals = Array(7.5e-1, 3.3486016e-1, 1.3410560e-1,
    5.1104756e-2, 2.1465687e-2, 3.6396989e-3)
  private val phi2Vals = Array(9.25e-1, 6.2884169e-1, 3.1755495e-1,
    1.2716367e-1, 2.2373903e-2, 1.6505689e-4)
  private val phi3Knots = Array(0.0, 0.3, 1.0, 2.0, 4.0, 8.0, 12.0, 20.0, 30.0).map(_ * D2R)
  private val phi3Vals = Array(1.0, 8.3381185e-1, 5.7735424e-1, 4.2144772e-1,
    2.3174230e-1, 1.0348178e-1, 6.1733473e-2, 1.6107006e-2, 0.0)

  /** Fritsch-Carlson monotone Hermite slopes for tabulated (x, y). */
  private def monotoneSlopes(x: Array[Double], y: Array[Double]): Array[Double] = {
    val n = x.length
    val d = Array.tabulate(n - 1)(i => (y(i + 1) - y(i)) / (x(i + 1) - x(i)))
    val m = new Array[Double](n)
    m(0) = d(0); m(n - 1) = d(n - 2)
    var i = 1
    while (i < n - 1) {
      m(i) = if (d(i - 1) * d(i) <= 0) 0.0 else (d(i - 1) + d(i)) / 2.0
      i += 1
    }
    i = 0
    while (i < n - 1) {
      if (d(i) == 0.0) { m(i) = 0.0; m(i + 1) = 0.0 }
      else {
        val a = m(i) / d(i); val b = m(i + 1) / d(i)
        val s = a * a + b * b
        if (s > 9.0) { val tau = 3.0 / math.sqrt(s); m(i) = tau * a * d(i); m(i + 1) = tau * b * d(i) }
      }
      i += 1
    }
    m
  }

  private final class Hermite(x: Array[Double], y: Array[Double],
      firstSlope: Option[Double]) {
    private val m = {
      val s = monotoneSlopes(x, y)
      firstSlope.foreach(s(0) = _) // clamp to the exactly-known derivative
      s
    }
    def apply(v: Double): Double = {
      var i = java.util.Arrays.binarySearch(x, v)
      if (i >= 0) return y(i)
      i = -i - 2
      if (i < 0) i = 0
      if (i > x.length - 2) i = x.length - 2
      val h = x(i + 1) - x(i)
      val t = (v - x(i)) / h
      val t2 = t * t; val t3 = t2 * t
      (2 * t3 - 3 * t2 + 1) * y(i) + (t3 - 2 * t2 + t) * h * m(i) +
        (-2 * t3 + 3 * t2) * y(i + 1) + (t3 - t2) * h * m(i + 1)
    }
  }

  // clamp the first spline slope to the linear part's exact derivative
  // so the basis is C1 at 7.5 deg, as the published splines are
  private val phi1Spline = new Hermite(phi12Knots, phi1Vals, Some(-6.0 / math.Pi))
  private val phi2Spline = new Hermite(phi12Knots, phi2Vals, Some(-9.0 / (5.0 * math.Pi)))
  private val phi3Spline = new Hermite(phi3Knots, phi3Vals, None)

  /** HG1G2 basis functions at phase angle alpha (radians). */
  def hg1g2Basis(alpha: Double): (Double, Double, Double) = {
    val a = math.abs(alpha)
    val p1 =
      if (a <= phi12Knots(0)) 1.0 - 6.0 * a / math.Pi
      else if (a >= phi12Knots.last) 0.0
      else phi1Spline(a)
    val p2 =
      if (a <= phi12Knots(0)) 1.0 - 9.0 * a / (5.0 * math.Pi)
      else if (a >= phi12Knots.last) 0.0
      else phi2Spline(a)
    val p3 =
      if (a >= phi3Knots.last) 0.0
      else phi3Spline(a)
    (p1, p2, p3)
  }

  def hg1g2Mag(h: Double, g1: Double, g2: Double, alpha: Double): Double = {
    val (p1, p2, p3) = hg1g2Basis(alpha)
    val f = g1 * p1 + g2 * p2 + (1 - g1 - g2) * p3
    h - 2.5 * math.log10(math.max(f, 1e-12))
  }

  final case class FitResult(params: Array[Double], errors: Array[Double],
      chi2red: Double, status: Int)

  /** Weighted Gauss-Newton over a general model with box bounds.
    * model(params, alpha) -> predicted reduced magnitude.
    */
  def fit(model: (Array[Double], Double) => Double, p0: Array[Double],
      lo: Array[Double], hi: Array[Double],
      alpha: Array[Double], mag: Array[Double], sigma: Array[Double]): FitResult = {
    val np = p0.length
    val n = alpha.length
    if (n < np + 1)
      return FitResult(Array.fill(np)(Double.NaN), Array.fill(np)(Double.NaN),
        Double.NaN, -1)
    val p = p0.clone()
    val eps = 1e-6
    var iter = 0
    while (iter < 60) {
      val jtj = Array.ofDim[Double](np, np)
      val jtr = new Array[Double](np)
      var i = 0
      while (i < n) {
        val w = 1.0 / (sigma(i) * sigma(i))
        val f0 = model(p, alpha(i))
        val r = mag(i) - f0
        val grad = new Array[Double](np)
        var k = 0
        while (k < np) {
          val saved = p(k)
          p(k) = saved + eps
          grad(k) = (model(p, alpha(i)) - f0) / eps
          p(k) = saved
          k += 1
        }
        k = 0
        while (k < np) {
          jtr(k) += w * grad(k) * r
          var l = 0
          while (l < np) { jtj(k)(l) += w * grad(k) * grad(l); l += 1 }
          k += 1
        }
        i += 1
      }
      var k = 0
      while (k < np) { jtj(k)(k) += 1e-9; k += 1 }
      val d = solve(jtj, jtr)
      if (d == null) iter = 60
      else {
        var moved = false
        k = 0
        while (k < np) {
          val nv = math.min(math.max(p(k) + d(k), lo(k)), hi(k))
          if (math.abs(nv - p(k)) > 1e-12) moved = true
          p(k) = nv
          k += 1
        }
        if (!moved) iter = 60 else iter += 1
      }
    }
    // chi2 and parameter errors from the final JtWJ inverse diagonal
    var chi2 = 0.0
    val jtj = Array.ofDim[Double](np, np)
    var i = 0
    while (i < n) {
      val w = 1.0 / (sigma(i) * sigma(i))
      val f0 = model(p, alpha(i))
      val r = mag(i) - f0
      chi2 += w * r * r
      val grad = new Array[Double](np)
      var k = 0
      while (k < np) {
        val saved = p(k); p(k) = saved + eps
        grad(k) = (model(p, alpha(i)) - f0) / eps
        p(k) = saved; k += 1
      }
      k = 0
      while (k < np) {
        var l = 0
        while (l < np) { jtj(k)(l) += w * grad(k) * grad(l); l += 1 }
        k += 1
      }
      i += 1
    }
    val errors = invertDiagonal(jtj).map(math.sqrt)
    FitResult(p, errors, chi2 / math.max(n - np, 1), 0)
  }

  def fitHG(alpha: Array[Double], mag: Array[Double], sigma: Array[Double]): FitResult =
    fit((p, a) => hgMag(p(0), p(1), a), Array(15.0, 0.15),
      Array(-3.0, 0.0), Array(30.0, 1.0), alpha, mag, sigma)

  def fitHG1G2(alpha: Array[Double], mag: Array[Double], sigma: Array[Double]): FitResult =
    fit((p, a) => hg1g2Mag(p(0), p(1), p(2), a), Array(15.0, 0.15, 0.15),
      Array(-3.0, 0.0, 0.0), Array(30.0, 1.0, 1.0), alpha, mag, sigma)

  /** Cosine of the aspect angle between the line of sight (ra, dec) and
    * a spin axis (alpha0, delta0); all radians (the sHG1G2 geometry,
    * after fink-utils' spin_angle).
    */
  def spinAspect(ra: Double, dec: Double, alpha0: Double, delta0: Double): Double =
    math.cos(dec) * math.cos(delta0) * math.cos(ra - alpha0) +
      math.sin(dec) * math.sin(delta0)

  /** sHG1G2 reduced magnitude: HG1G2 plus the spin-modulation term
    * -2.5 log10(1 - (1-R)|cos aspect|) (oblateness R in (0,1], spin axis
    * (alpha0, delta0)) — the SHG1G2 model of ztf/ssoft
    * (processor.py:500-506 MODELS entry; published sHG1G2 form).
    */
  def shg1g2Mag(h: Double, g1: Double, g2: Double, r: Double,
      alpha0: Double, delta0: Double,
      phase: Double, ra: Double, dec: Double): Double = {
    val geo = spinAspect(ra, dec, alpha0, delta0)
    hg1g2Mag(h, g1, g2, phase) -
      2.5 * math.log10(math.max(1.0 - (1.0 - r) * math.abs(geo), 1e-12))
  }

  /** Joint multi-band sHG1G2 fit: per-band H (g, r) + shared
    * (G1, G2, R, alpha0, delta0) — 7 parameters over all measurements,
    * as the reference fits spin parameters across bands. Params:
    * [H_g, H_r, G1, G2, R, alpha0, delta0].
    */
  def fitSHG1G2(phase: Array[Double], ra: Array[Double], dec: Array[Double],
      band: Array[Int], mag: Array[Double], sigma: Array[Double]): FitResult = {
    val idx = Array.tabulate(phase.length)(_.toDouble)
    def model(p: Array[Double], xi: Double): Double = {
      val i = xi.toInt
      val h = if (band(i) == 1) p(0) else p(1)
      shg1g2Mag(h, p(2), p(3), p(4), p(5), p(6), phase(i), ra(i), dec(i))
    }
    fit(model,
      Array(15.0, 15.0, 0.15, 0.15, 0.8, math.Pi, 0.0),
      Array(-3.0, -3.0, 0.0, 0.0, 0.1, 0.0, -math.Pi / 2),
      Array(30.0, 30.0, 1.0, 1.0, 1.0, 2 * math.Pi, math.Pi / 2),
      idx, mag, sigma)
  }

  // ---- SOCCA: per-band HG1G2 phase functions + rotating triaxial
  // ellipsoid, period-blind (ztf/ssoft/processor.py:505-506, 525-596;
  // the reference delegates to the external asteroid_spinprops package,
  // so this is a published-math reconstruction: Kaasalainen-style
  // ellipsoid photometry — brightness proportional to the projected
  // cross-section of a rotating triaxial ellipsoid — on top of the
  // same HG1G2 basis the other models share. Parameter surface mirrors
  // COLUMNS_SOCCA: per-band G1/G2 (unlike sHG1G2's shared pair),
  // a/b >= 1, a/c >= 1, phi0, spin pole, sidereal period.)

  /** Speed of light in AU/day (IAU); light-travel correction
    * jd_lt = jd - Dobs/c (processor.py compute_light_travel_correction).
    */
  val CAuPerDay = 173.144632674240

  /** Line of sight in the rotating body frame. Pole (alpha0, delta0)
    * defines body +z; the body x-y axes rotate by `phi`; the azimuth
    * reference is the celestial-north tangent direction at the pole
    * (convention choice — degenerate with phi0, which absorbs any
    * fixed azimuth offset). All angles radians.
    */
  def bodyFrameLos(ra: Double, dec: Double, alpha0: Double, delta0: Double,
      phi: Double): (Double, Double, Double) = {
    val ex = math.cos(dec) * math.cos(ra)
    val ey = math.cos(dec) * math.sin(ra)
    val ez = math.sin(dec)
    val px = math.cos(delta0) * math.cos(alpha0)
    val py = math.cos(delta0) * math.sin(alpha0)
    val pz = math.sin(delta0)
    val cosL = ex * px + ey * py + ez * pz
    // azimuth reference: projection of celestial north onto the plane
    // normal to the pole; fall back to x-hat when the pole is polar
    var bx = -pz * px; var by = -pz * py; var bz = 1.0 - pz * pz
    val bn = math.sqrt(bx * bx + by * by + bz * bz)
    if (bn < 1e-9) { bx = 1.0 - px * px; by = -px * py; bz = -px * pz }
    val b1n = math.sqrt(bx * bx + by * by + bz * bz)
    bx /= b1n; by /= b1n; bz /= b1n
    val cx = py * bz - pz * by
    val cy = pz * bx - px * bz
    val cz = px * by - py * bx
    val psi = math.atan2(ex * cx + ey * cy + ez * cz,
      ex * bx + ey * by + ez * bz)
    val sinL = math.sqrt(math.max(0.0, 1.0 - cosL * cosL))
    (sinL * math.cos(psi - phi), sinL * math.sin(psi - phi), cosL)
  }

  /** Magnitude modulation of a triaxial ellipsoid a >= b >= c (in
    * units a=1: b=1/aB, c=1/aC) viewed along body-frame direction u:
    * projected area S(u) = sqrt((bc ux)^2 + (c uy)^2 + (b uz)^2),
    * normalized to the pole-on maximum (S=b), so the term is >= 0 and
    * H stays the pole-on zero-phase magnitude.
    */
  def ellipsoidDimming(aB: Double, aC: Double,
      ux: Double, uy: Double, uz: Double): Double = {
    val b = 1.0 / aB
    val c = 1.0 / aC
    val s = math.sqrt((b * c * ux) * (b * c * ux) + (c * uy) * (c * uy) +
      (b * uz) * (b * uz))
    // S/Smax <= 1, so the term is a non-negative magnitude dimming
    -2.5 * math.log10(math.max(s / b, 1e-12))
  }

  /** SOCCA reduced magnitude. Params (12):
    * [H_g, H_r, G1_g, G1_r, G2_g, G2_r, a_b, bc_ratio, phi0, alpha0,
    * delta0, period_h] — the shape is parameterized as a_b = a/b >= 1
    * and bc_ratio = b/c >= 1, so a_c = a_b * bc_ratio and the physical
    * ordering a >= b >= c holds for ANY in-bounds parameter vector
    * (independent a_b/a_c bounds would let the optimizer cross them).
    * Rotation phase phi(t) = phi0 + 2 pi (jdLt - t0) * 24 / period_h.
    */
  def soccaMag(p: Array[Double], band: Int, phase: Double, ra: Double,
      dec: Double, jdLt: Double, t0: Double): Double = {
    val h = if (band == 1) p(0) else p(1)
    val g1 = if (band == 1) p(2) else p(3)
    val g2 = if (band == 1) p(4) else p(5)
    val phi = p(8) + 2.0 * math.Pi * (jdLt - t0) * 24.0 / p(11)
    val (ux, uy, uz) = bodyFrameLos(ra, dec, p(9), p(10), phi)
    hg1g2Mag(h, g1, g2, phase) +
      ellipsoidDimming(p(6), p(6) * p(7), ux, uy, uz)
  }

  /** Lomb-Scargle normalized periodogram peaks of (t, y): top `k`
    * local maxima over the frequency grid [fMin, fMax] cycles/day with
    * `perDay` oversampled spacing 1/(ovs * span). Returns frequencies.
    */
  def lombScarglePeaks(t: Array[Double], y: Array[Double],
      fMin: Double, fMax: Double, k: Int, ovs: Double = 4.0): Array[Double] = {
    val n = t.length
    if (n < 4) return Array.empty
    val span = t.max - t.min
    if (span <= 0) return Array.empty
    val my = y.sum / n
    val yc = y.map(_ - my)
    val df = 1.0 / (ovs * span)
    val nf = math.max(2, math.min(200000, ((fMax - fMin) / df).toInt))
    val power = new Array[Double](nf)
    val freqs = Array.tabulate(nf)(i => fMin + i * (fMax - fMin) / (nf - 1))
    var fi = 0
    while (fi < nf) {
      val w = 2.0 * math.Pi * freqs(fi)
      var s2 = 0.0; var c2 = 0.0
      var i = 0
      while (i < n) { s2 += math.sin(2 * w * t(i)); c2 += math.cos(2 * w * t(i)); i += 1 }
      val tau = math.atan2(s2, c2) / (2 * w)
      var cs = 0.0; var cc = 0.0; var ss = 0.0; var sc = 0.0
      i = 0
      while (i < n) {
        val a = w * (t(i) - tau)
        val co = math.cos(a); val si = math.sin(a)
        cs += yc(i) * co; cc += co * co
        sc += yc(i) * si; ss += si * si
        i += 1
      }
      power(fi) = 0.5 * (cs * cs / math.max(cc, 1e-12) +
        sc * sc / math.max(ss, 1e-12))
      fi += 1
    }
    // top-k local maxima with a minimum separation of 5 grid cells
    val idx = (1 until nf - 1).filter(i =>
      power(i) > power(i - 1) && power(i) >= power(i + 1))
      .sortBy(i => -power(i))
    val keep = scala.collection.mutable.ArrayBuffer[Int]()
    idx.foreach { i =>
      if (keep.length < k && keep.forall(j => math.abs(j - i) > 5)) keep += i
    }
    keep.map(freqs).toArray
  }

  /** Levenberg-damped variant of [[fit]] for the 12-parameter SOCCA
    * surface: same numeric Jacobian and box clamping, but steps are
    * accepted only when chi2 improves, with adaptive lambda — plain
    * Gauss-Newton diverges from distant pole seeds on this model.
    * Kept SEPARATE from [[fit]] so the numerically-pinned HG family
    * results stay bit-stable.
    */
  def fitLM(model: (Array[Double], Double) => Double, p0: Array[Double],
      lo: Array[Double], hi: Array[Double],
      alpha: Array[Double], mag: Array[Double], sigma: Array[Double]): FitResult = {
    val np = p0.length
    val n = alpha.length
    if (n < np + 1)
      return FitResult(Array.fill(np)(Double.NaN), Array.fill(np)(Double.NaN),
        Double.NaN, -1)
    val p = p0.clone()
    def chi2Of(q: Array[Double]): Double = {
      var c = 0.0; var i = 0
      while (i < n) {
        val r = (mag(i) - model(q, alpha(i))) / sigma(i)
        c += r * r; i += 1
      }
      c
    }
    var chi = chi2Of(p)
    var lambda = 1e-3
    var iter = 0
    var jtjLast: Array[Array[Double]] = null
    while (iter < 120) {
      val jtj = Array.ofDim[Double](np, np)
      val jtr = new Array[Double](np)
      var i = 0
      while (i < n) {
        val w = 1.0 / (sigma(i) * sigma(i))
        val f0 = model(p, alpha(i))
        val r = mag(i) - f0
        val grad = new Array[Double](np)
        var k = 0
        while (k < np) {
          // RELATIVE step: a fixed 1e-6 vanishes against a 1e28-scale
          // bolometric amplitude (p + eps == p in double) and silently
          // zeroes that gradient direction
          val eps = math.max(math.abs(p(k)) * 1e-6, 1e-9)
          val saved = p(k); p(k) = saved + eps
          grad(k) = (model(p, alpha(i)) - f0) / eps
          p(k) = saved; k += 1
        }
        k = 0
        while (k < np) {
          jtr(k) += w * grad(k) * r
          var l = 0
          while (l < np) { jtj(k)(l) += w * grad(k) * grad(l); l += 1 }
          k += 1
        }
        i += 1
      }
      jtjLast = jtj.map(_.clone())
      var k = 0
      while (k < np) { jtj(k)(k) *= (1.0 + lambda); jtj(k)(k) += 1e-12; k += 1 }
      val d = solve(jtj, jtr)
      if (d == null) iter = 120
      else {
        val trial = Array.tabulate(np)(k =>
          math.min(math.max(p(k) + d(k), lo(k)), hi(k)))
        val trialChi = chi2Of(trial)
        if (trialChi < chi) {
          System.arraycopy(trial, 0, p, 0, np)
          if (chi - trialChi < 1e-12 * (1.0 + chi)) iter = 120
          chi = trialChi
          lambda = math.max(lambda / 3.0, 1e-9)
        } else {
          lambda *= 10.0
          if (lambda > 1e10) iter = 120
        }
      }
      iter += 1
    }
    val errors =
      if (jtjLast == null) Array.fill(np)(Double.NaN)
      else invertDiagonal(jtjLast).map(math.sqrt)
    FitResult(p, errors, chi / math.max(n - np, 1), 0)
  }

  final case class SoccaResult(result: FitResult, periodH: Double,
      minCosL: Double, meanCosL: Double, maxCosL: Double)

  /** Period-blind SOCCA fit: sHG1G2 base fit -> Lomb-Scargle over its
    * residuals (photometric period; the double-peaked ellipsoid curve
    * makes the sidereal period twice the strongest photometric one, so
    * both P and 2P are tried per peak) -> full 12-parameter refinement
    * at each candidate, best reduced chi2 wins. Angles in radians,
    * jdLt light-time-corrected days.
    */
  def fitSOCCA(phase: Array[Double], ra: Array[Double], dec: Array[Double],
      band: Array[Int], mag: Array[Double], sigma: Array[Double],
      jdLt: Array[Double]): SoccaResult = {
    val n = mag.length
    val np = 12
    val nan = FitResult(Array.fill(np)(Double.NaN), Array.fill(np)(Double.NaN),
      Double.NaN, -1)
    if (n < np + 2) return SoccaResult(nan, Double.NaN, Double.NaN,
      Double.NaN, Double.NaN)
    val base = fitSHG1G2(phase, ra, dec, band, mag, sigma)
    val t0 = jdLt.min
    val resid = Array.tabulate(n) { i =>
      val h = if (band(i) == 1) base.params(0) else base.params(1)
      mag(i) - shg1g2Mag(h, base.params(2), base.params(3), base.params(4),
        base.params(5), base.params(6), phase(i), ra(i), dec(i))
    }
    // photometric periods 0.5 h .. 120 h -> frequencies in cycles/day;
    // the sidereal period is NOT P/2-degenerate (a model at half the
    // period sweeps the pi-periodic ellipsoid curve twice as fast), so
    // both the doubled and plain photometric periods are candidates
    val peaks = lombScarglePeaks(jdLt, resid, 24.0 / 120.0, 24.0 / 0.5, 2)
    val candidates =
      (if (peaks.isEmpty) Array(8.0) // fallback: a typical rotation period
       else peaks.flatMap(f => Array(2.0 * 24.0 / f, 24.0 / f))).distinct
    // amplitude seed: robust peak-to-peak of the residuals, tried
    // alongside a moderate default (a capped seed from a bad base fit
    // can strand the optimizer as badly as a sphere)
    val sortedR = resid.sorted
    val amp = sortedR((0.95 * (n - 1)).toInt) - sortedR((0.05 * (n - 1)).toInt)
    val ampSeed = math.min(5.0, math.max(1.05, math.pow(10.0, 0.4 * amp)))
    val aBSeeds =
      if (math.abs(ampSeed - 1.3) > 0.05) Seq(1.3, ampSeed) else Seq(1.3)
    var best: FitResult = null
    var bestP = Double.NaN
    // multi-start over rotation phase AND spin pole: a phi0 seed out of
    // phase anti-correlates the shape term with the residuals and the
    // optimizer collapses a_b to the spherical bound; a distant pole
    // seed (the base sHG1G2 pole is often poorly constrained) strands
    // the fit in an aspect geometry the data contradict. G1/G2 seed at
    // the canonical 0.15 defaults — the base fit's G's are untrustworthy
    // when its chi2 is dominated by the unmodeled rotation signal.
    val spanDays = math.max(jdLt.max - jdLt.min, 1e-6)
    val poleSeeds = Seq(
      (base.params(5), base.params(6)),
      ((base.params(5) + math.Pi) % (2 * math.Pi), -base.params(6)),
      (0.5, 0.9), (2.5, 0.0), (4.5, -0.9))
    val idx = Array.tabulate(n)(_.toDouble)
    def model(p: Array[Double], xi: Double): Double = {
      val i = xi.toInt
      soccaMag(p, band(i), phase(i), ra(i), dec(i), jdLt(i), t0)
    }
    for (cand <- candidates;
         phi0Seed <- Seq(0.0, math.Pi / 2, math.Pi, 3 * math.Pi / 2);
         (a0Seed, d0Seed) <- poleSeeds;
         aBSeed <- aBSeeds) {
      // chi2(P) oscillates on the scale osc = P^2/(24*span) (one extra
      // rotation across the time span); the LS grid (4x oversampled)
      // localizes the peak within osc/8, so refinement stays inside
      // +-osc — a wider window hands the optimizer a dozen local
      // minima. A SHORT span makes osc exceed the candidate itself
      // (spanDays=2, cand=240h -> osc=1200), so the lower bound clamps
      // strictly positive — a negative "period" is still a finite
      // model (the rotation merely reverses) and could otherwise win
      // on chi2 and surface in the table's period column
      val osc = cand * cand / (24.0 * spanDays)
      val p0 = Array(base.params(0), base.params(1),
        0.15, 0.15, 0.2, 0.2,
        aBSeed, 1.1, phi0Seed, a0Seed, d0Seed, cand)
      val lo = Array(-3.0, -3.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0,
        -2 * math.Pi, 0.0, -math.Pi / 2,
        math.max(cand - osc, math.min(0.5, cand * 0.5)))
      val hi = Array(30.0, 30.0, 1.0, 1.0, 1.0, 1.0, 10.0, 5.0,
        4 * math.Pi, 2 * math.Pi, math.Pi / 2, cand + osc)
      val r = fitLM(model, p0, lo, hi, idx, mag, sigma)
      if (r.status == 0 && !r.chi2red.isNaN &&
          (best == null || r.chi2red < best.chi2red)) {
        best = r; bestP = r.params(11)
      }
    }
    if (best == null) return SoccaResult(nan, Double.NaN, Double.NaN,
      Double.NaN, Double.NaN)
    // aspect-angle summary at the solution (COLUMNS_SOCCA cos_lambda)
    val cosL = Array.tabulate(n)(i =>
      math.abs(spinAspect(ra(i), dec(i), best.params(9), best.params(10))))
    SoccaResult(best, bestP, cosL.min, cosL.sum / n, cosL.max)
  }

  private def solve(m0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val np = b0.length
    val a = m0.map(_.clone())
    val b = b0.clone()
    var col = 0
    while (col < np) {
      var piv = col
      var r = col + 1
      while (r < np) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (math.abs(a(piv)(col)) < 1e-300) return null
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t
        val tb = b(piv); b(piv) = b(col); b(col) = tb }
      r = col + 1
      while (r < np) {
        val f = a(r)(col) / a(col)(col)
        var k = col
        while (k < np) { a(r)(k) -= f * a(col)(k); k += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val out = new Array[Double](np)
    var row = np - 1
    while (row >= 0) {
      var s = b(row)
      var k = row + 1
      while (k < np) { s -= a(row)(k) * out(k); k += 1 }
      out(row) = s / a(row)(row)
      row -= 1
    }
    out
  }

  /** Diagonal of the inverse via Gauss-Jordan (small matrices). */
  private def invertDiagonal(m0: Array[Array[Double]]): Array[Double] = {
    val np = m0.length
    val a = m0.map(_.clone())
    val inv = Array.tabulate(np, np)((r, c) => if (r == c) 1.0 else 0.0)
    var col = 0
    while (col < np) {
      var piv = col
      var r = col + 1
      while (r < np) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (math.abs(a(piv)(col)) < 1e-300) return Array.fill(np)(Double.NaN)
      if (piv != col) {
        val t = a(piv); a(piv) = a(col); a(col) = t
        val ti = inv(piv); inv(piv) = inv(col); inv(col) = ti
      }
      val f0 = a(col)(col)
      var k = 0
      while (k < np) { a(col)(k) /= f0; inv(col)(k) /= f0; k += 1 }
      r = 0
      while (r < np) {
        if (r != col) {
          val f = a(r)(col)
          k = 0
          while (k < np) { a(r)(k) -= f * a(col)(k); inv(r)(k) -= f * inv(col)(k); k += 1 }
        }
        r += 1
      }
      col += 1
    }
    Array.tabulate(np)(i => inv(i)(i))
  }
}
