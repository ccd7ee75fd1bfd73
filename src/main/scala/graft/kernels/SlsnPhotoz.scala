package graft.kernels

/** Post-classification photo-z veto kernels for the ZTF superluminous
  * module — reference: ztf/superluminous/slsn_classifier.py:113-185
  * (`abs_peak`, `compute_milky_way_extinction`) consumed by
  * processor.py:233-263: alerts scored above the classifier's
  * optimal_threshold get an SDSS photo-z lookup, the brightest-band
  * peak absolute magnitude upper bound M(z+zerr) is computed under
  * LambdaCDM(H0=67.8, Om0=0.308, Ode0=0.692) with Fitzpatrick-99 Milky
  * Way extinction, and sources whose upper bound is still fainter than
  * not_sl_threshold (-19.75, kernel.py) have their probability zeroed.
  *
  * Both kernels are pinned against the reference's own doctest values
  * in SlsnPhotozSpec (extinction 1.34 at 6000A/0.5; two abs_peak
  * vectors at <=3e-4 mag).
  */
object SlsnPhotoz {

  private val C_KMS = 299792.458

  /** Luminosity distance in parsec under LambdaCDM (no radiation,
    * astropy's Tcmb0=0 default). Handles open/closed curvature like
    * astropy, though the reference's cosmology is flat.
    */
  def luminosityDistancePc(z: Double, h0: Double = 67.8,
      om0: Double = 0.308, ode0: Double = 0.692): Double = {
    val ok0 = 1.0 - om0 - ode0
    def e(zz: Double) = math.sqrt(
      om0 * math.pow(1 + zz, 3) + ok0 * (1 + zz) * (1 + zz) + ode0)
    // composite Simpson over [0, z]
    val n = 2048
    val h = z / n
    var s = 1.0 / e(0.0) + 1.0 / e(z)
    var i = 1
    while (i < n) {
      s += (if (i % 2 == 1) 4.0 else 2.0) / e(i * h)
      i += 1
    }
    val dc = (C_KMS / h0) * s * h / 3.0 // comoving, Mpc
    val hubble = C_KMS / h0
    val dm =
      if (math.abs(ok0) < 1e-12) dc
      else if (ok0 > 0) hubble / math.sqrt(ok0) * math.sinh(math.sqrt(ok0) * dc / hubble)
      else hubble / math.sqrt(-ok0) * math.sin(math.sqrt(-ok0) * dc / hubble)
    (1 + z) * dm * 1e6
  }

  // ---- Fitzpatrick 1999 extinction curve (dust_extinction F99) ----
  // Optical/IR cubic-spline anchors in x = 1/lambda [um^-1] with
  // A(lambda)/E(B-V) values; UV anchors at 2700/2600 A from the FM90
  // C1/C2/Drude terms. Public parameterization (Fitzpatrick 1999,
  // PASP 111, 63; dust_extinction parameter_averages.F99).
  private def f99Anchors(rv: Double): (Array[Double], Array[Double]) = {
    val c2 = -0.824 + 4.717 / rv
    val c1 = 2.030 - 3.007 * c2
    val x0 = 4.596; val gamma = 0.99; val c3 = 3.23
    def drude(x: Double) = {
      val x2 = x * x
      x2 / ((x2 - x0 * x0) * (x2 - x0 * x0) + (x * gamma) * (x * gamma))
    }
    def uv(x: Double) = c1 + c2 * x + c3 * drude(x) + rv
    val xs = Array(0.0, 0.377, 0.820, 1.667, 1.828, 2.141, 2.433, 3.704, 3.846)
    val ys = Array(
      0.0, 0.26469 * rv / 3.1, 0.82925 * rv / 3.1,
      -0.426 + 1.0044 * rv, -0.050 + 1.0016 * rv, 0.701 + 1.0016 * rv,
      1.208 + 1.0032 * rv - 0.00033 * rv * rv,
      uv(3.704), uv(3.846))
    (xs, ys)
  }

  /** Not-a-knot cubic spline second-derivative coefficients. */
  private def splineC(x: Array[Double], y: Array[Double]): Array[Double] = {
    val n = x.length
    val h = Array.tabulate(n - 1)(i => x(i + 1) - x(i))
    val a = Array.ofDim[Double](n, n)
    val b = new Array[Double](n)
    var i = 1
    while (i < n - 1) {
      a(i)(i - 1) = h(i - 1); a(i)(i) = 2 * (h(i - 1) + h(i)); a(i)(i + 1) = h(i)
      b(i) = 3 * ((y(i + 1) - y(i)) / h(i) - (y(i) - y(i - 1)) / h(i - 1))
      i += 1
    }
    a(0)(0) = h(1); a(0)(1) = -(h(0) + h(1)); a(0)(2) = h(0)
    a(n - 1)(n - 3) = h(n - 2); a(n - 1)(n - 2) = -(h(n - 3) + h(n - 2))
    a(n - 1)(n - 1) = h(n - 3)
    // gaussian elimination with partial pivoting
    val m = Array.tabulate(n)(r => a(r) :+ b(r))
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r; r += 1 }
      val t = m(col); m(col) = m(piv); m(piv) = t
      r = col + 1
      while (r < n) {
        val f = m(r)(col) / m(col)(col)
        var cc = col
        while (cc <= n) { m(r)(cc) -= f * m(col)(cc); cc += 1 }
        r += 1
      }
      col += 1
    }
    val c = new Array[Double](n)
    var r = n - 1
    while (r >= 0) {
      var s = m(r)(n)
      var cc = r + 1
      while (cc < n) { s -= m(r)(cc) * c(cc); cc += 1 }
      c(r) = s / m(r)(r)
      r -= 1
    }
    c
  }

  private lazy val defaultSpline = {
    val (xs, ys) = f99Anchors(3.1)
    (xs, ys, splineC(xs, ys))
  }

  /** A(lambda) in magnitudes for E(B-V) `ebv` at `lambdaAA` Angstrom
    * (doctest: compute_milky_way_extinction(0.5, 6000) = 1.34).
    */
  def milkyWayExtinction(ebv: Double, lambdaAA: Double, rv: Double = 3.1): Double = {
    val (xs, ys, c) =
      if (rv == 3.1) defaultSpline
      else { val (x0, y0) = f99Anchors(rv); (x0, y0, splineC(x0, y0)) }
    val xq = 10000.0 / lambdaAA
    var i = java.util.Arrays.binarySearch(xs, xq)
    if (i < 0) i = -i - 2
    i = math.min(math.max(i, 0), xs.length - 2)
    val h = xs(i + 1) - xs(i)
    val dx = xq - xs(i)
    val bb = (ys(i + 1) - ys(i)) / h - h * (2 * c(i) + c(i + 1)) / 3
    val dd = (c(i + 1) - c(i)) / (3 * h)
    (ys(i) + bb * dx + c(i) * dx * dx + dd * dx * dx * dx) * ebv
  }

  /** Peak absolute magnitude bracket [M(z-zerr), M(z), M(z+zerr)] of
    * the brightest band (argmin of the central M), matching abs_peak's
    * return layout — index 2 is the luminous upper bound processor.py
    * compares to not_sl_threshold. NaN triple when z or zerr is NaN;
    * negative ebv clamps to 0; effective z floors at 1e-3.
    */
  def absPeak(appPeak: Array[Double], lambdaAA: Array[Double], z: Double,
      zerr: Double, ebv: Double): Array[Double] = {
    if (z.isNaN || zerr.isNaN) return Array(Double.NaN, Double.NaN, Double.NaN)
    val e = if (ebv < 0) 0.0 else ebv
    val ms = appPeak.indices.map { band =>
      Array(-1, 0, 1).map { k =>
        val ze = math.max(z + k * zerr, 1e-3)
        appPeak(band) - 5 * math.log10(luminosityDistancePc(ze) / 10.0) -
          2.5 * math.log10(1 + ze) - milkyWayExtinction(e, lambdaAA(band))
      }
    }
    ms.minBy(_(1))
  }
}
