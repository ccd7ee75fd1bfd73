package graft.kernels

/** Orphan-GRB afterglow feature extraction — faithful port of the
  * reference's in-repo kernels (rubin/orphans/features_extraction.py,
  * fit.py, basic_functions.py), including their observable quirks:
  *
  *  - the zero→NaN replacement in compute_rates operates on a throwaway
  *    temporary (features_extraction.py:121), so the mean INCLUDES the
  *    per-filter 0.0 placeholders;
  *  - rescale_filters spells the y band "Y" (fit.py:50) while the data
  *    is lowercase, so y-band points silently drop out of the fit;
  *  - an all-r light curve yields identical distances for every beta and
  *    `min(beta_min)` picks the most negative (-p/2);
  *  - the light-curve model A*t + B + C*exp(-D*t) is fit by weighted
  *    least squares; the reference uses Minuit migrad with box limits
  *    and chi2-retry (fit.py:173-204) — here (A,B,C) are solved exactly
  *    (the model is linear in them) on a D grid with refinement, which
  *    reaches the same least-squares optimum deterministically;
  *  - chi2 is the REDUCED chi-square, sum(((y-fit)/err)^2)/(n-4).
  */
object OrphanFeatures {

  /** AB magnitude from flux (reference flux_to_mag: flux*1e-26 cgs). */
  def fluxToMag(flux: Double): Double =
    -2.5 * math.log10(flux * 1.0e-26) - 48.6

  def magToFlux(mag: Double): Double =
    math.pow(10.0, 26.0 - (mag + 48.6) / 2.5)

  /** Mean observing frequencies for u,g,r,i,z,Y (fit.py:51-59). */
  private val bands = Array("u", "g", "r", "i", "z", "Y")
  private val meanNu = Array(840336134453781.4, 629326620516047.8,
    482703137570394.2, 397614314115308.1, 344530577088716.56,
    298760145396604.1)
  private val nuR = meanNu(2)

  final case class Features(duration: Double, increaseRate: Double,
      decreaseRate1: Double, decreaseRate3: Double, gr: Double, ri: Double,
      a: Double, b: Double, c: Double, d: Double, aOverB: Double,
      chi2: Double) {
    def toArray: Array[Double] = Array(duration, increaseRate,
      decreaseRate1, decreaseRate3, gr, ri, a, b, c, d, aOverB, chi2)
  }

  /** duration between first detection and the magnitude minimum
    * (features_extraction.py:19-41): 0 when the curve opens at peak.
    */
  def duration(t: Array[Double], m: Array[Double]): Double = {
    if (m.isEmpty) return 0.0
    var minIdx = 0
    var i = 1
    while (i < m.length) { if (m(i) < m(minIdx)) minIdx = i; i += 1 }
    if (m(minIdx) == m(0)) 0.0 else t(minIdx) - t.min
  }

  /** (increase, firstThirdDecrease, lastThirdDecrease) mean rates in
    * mag/day (features_extraction.py:44-127). Filters iterate lowercase
    * u..y here (unlike the fit).
    */
  def rates(t: Array[Double], m: Array[Double], f: Array[String]): (Double, Double, Double) = {
    val filters = Array("u", "g", "r", "i", "z", "y")
    val inc = collection.mutable.ArrayBuffer.empty[Double]
    val dec1 = collection.mutable.ArrayBuffer.empty[Double]
    val dec3 = collection.mutable.ArrayBuffer.empty[Double]
    for (band <- filters) {
      val idx = f.indices.filter(f(_) == band)
      val roc = collection.mutable.ArrayBuffer.empty[Double]
      var k = 1
      while (k < idx.length) {
        val dt = t(idx(k)) - t(idx(k - 1))
        if (dt > 0.1) roc += (m(idx(k)) - m(idx(k - 1))) / dt
        k += 1
      }
      val neg = roc.filter(_ < 0)
      if (neg.nonEmpty) inc ++= neg else inc += 0.0
      val decIdx = roc.indices.filter(roc(_) > 0)
      val n = decIdx.length
      if (n >= 3) {
        dec1 ++= decIdx.take(n / 3).map(roc)
        dec3 ++= decIdx.takeRight(n / 3).map(roc)
      } else { dec1 += 0.0; dec3 += 0.0 }
    }
    def mean(r: collection.mutable.ArrayBuffer[Double]): Double =
      if (r.exists(_ != 0.0)) r.sum / r.length else 0.0
    (mean(inc), mean(dec1), mean(dec3))
  }

  /** numpy.interp: linear interpolation clamped at the edges. xp must be
    * ascending.
    */
  def interp(x: Double, xp: Array[Double], fp: Array[Double]): Double = {
    if (x <= xp(0)) return fp(0)
    if (x >= xp(xp.length - 1)) return fp(fp.length - 1)
    var i = java.util.Arrays.binarySearch(xp, x)
    if (i >= 0) return fp(i)
    i = -i - 1
    val x0 = xp(i - 1); val x1 = xp(i)
    fp(i - 1) + (fp(i) - fp(i - 1)) * (x - x0) / (x1 - x0)
  }

  /** Mean colours for (g,r) and (r,i) (features_extraction.py:129-176):
    * filter1 magnitudes interpolated at filter2 times; NaN when a band
    * is absent.
    */
  def colours(t: Array[Double], m: Array[Double], f: Array[String]): (Double, Double) = {
    def pair(b1: String, b2: String): Double = {
      val i1 = f.indices.filter(f(_) == b1)
      val i2 = f.indices.filter(f(_) == b2)
      if (i1.isEmpty || i2.isEmpty) return Double.NaN
      val t1 = i1.map(t).toArray; val m1 = i1.map(m).toArray
      var s = 0.0
      for (j <- i2) s += interp(t(j), t1, m1) - m(j)
      s / i2.length
    }
    (pair("g", "r"), pair("r", "i"))
  }

  /** rescale_filters (fit.py:24-140): pick the most common non-r band,
    * choose beta on a 10-point grid by minimum summed pairwise distance
    * to the r points, rescale every band's flux by (nu_r/nu_f)^beta and
    * re-express as magnitudes; times shift to start at 0. Band order in
    * the output is u,g,r,i,z,Y (concatenation order, not time order).
    */
  def rescaleFilters(t: Array[Double], m: Array[Double], e: Array[Double],
      f: Array[String]): (Array[Double], Array[Double], Array[Double]) = {
    val nonR = f.indices.filter(f(_) != "r")
    if (nonR.isEmpty) {
      val tmin = t.min
      return (t.map(_ - tmin), m, e)
    }
    // most frequent non-r band; np.unique sorts, argmax takes first max
    val counts = nonR.groupBy(f(_)).view.mapValues(_.length).toMap
    val maxCount = counts.values.max
    val filtMax = counts.keys.toSeq.sorted.find(counts(_) == maxCount).get
    val nuMax = bands.indexOf(filtMax) match {
      case -1 => meanNu(5) // lowercase y: "Y" slot frequency
      case i => meanNu(i)
    }

    val rIdx = f.indices.filter(f(_) == "r")
    val maxIdx = f.indices.filter(f(_) == filtMax)
    val fluxR = rIdx.map(i => magToFlux(m(i))).toArray
    val tR = rIdx.map(t).toArray
    val fluxMax = maxIdx.map(i => magToFlux(m(i))).toArray
    val tMax = maxIdx.map(t).toArray

    val p = 2.2
    // np.linspace(-(p-1)/2, -p/2, 10)
    val betaGrid = Array.tabulate(10)(k =>
      -(p - 1) / 2 + (-p / 2 - (-(p - 1) / 2)) * k / 9.0)
    var bestBeta = betaGrid(0)
    var bestD = Double.MaxValue
    for (beta <- betaGrid) {
      val scale = math.pow(nuR / nuMax, beta)
      var d = 0.0
      for (i <- fluxMax.indices; j <- fluxR.indices) {
        val dt = tMax(i) - tR(j)
        val df = fluxMax(i) * scale - fluxR(j)
        d += math.sqrt(dt * dt + df * df)
      }
      // ties keep the MOST NEGATIVE beta: python takes min(beta_min)
      // over all argmins, and the grid descends
      if (d < bestD || (d == bestD && beta < bestBeta)) { bestD = d; bestBeta = beta }
    }

    val outT = collection.mutable.ArrayBuffer.empty[Double]
    val outM = collection.mutable.ArrayBuffer.empty[Double]
    val outE = collection.mutable.ArrayBuffer.empty[Double]
    var bi = 0
    while (bi < bands.length) {
      val band = bands(bi) // note "Y": lowercase y points never match
      val idx = f.indices.filter(f(_) == band)
      val scale = if (band == "r") 1.0 else math.pow(nuR / meanNu(bi), bestBeta)
      for (i <- idx) {
        outT += t(i)
        outM += (if (band == "r") m(i) else fluxToMag(magToFlux(m(i)) * scale))
        outE += e(i)
      }
      bi += 1
    }
    val tmin = if (outT.nonEmpty) outT.min else 0.0
    (outT.map(_ - tmin).toArray, outM.toArray, outE.toArray)
  }

  /** Weighted least-squares fit of A*t + B + C*exp(-D*t): exact linear
    * solve for (A,B,C) on a D grid over the reference's box [-0.03, 10]
    * with golden-section refinement. Returns (A,B,C,D, reduced chi2).
    */
  def fitLightCurve(t: Array[Double], m: Array[Double], e: Array[Double],
      f: Array[String]): (Double, Double, Double, Double, Double) = {
    val (tt, y, err) = rescaleFilters(t, m, e, f)
    val n = tt.length
    if (n == 0) return (0.0, 0.0, 0.0, 0.0, 0.0)

    def solveFor(d: Double): (Double, Double, Double, Double) = {
      // weighted normal equations for basis {t, 1, exp(-d t)}
      var s00 = 0.0; var s01 = 0.0; var s02 = 0.0
      var s11 = 0.0; var s12 = 0.0; var s22 = 0.0
      var b0 = 0.0; var b1 = 0.0; var b2 = 0.0
      var i = 0
      while (i < n) {
        val w = if (err(i) != 0 && !err(i).isNaN) 1.0 / (err(i) * err(i)) else 0.0
        val x0 = tt(i); val x1 = 1.0; val x2 = math.exp(-d * tt(i))
        s00 += w * x0 * x0; s01 += w * x0 * x1; s02 += w * x0 * x2
        s11 += w * x1 * x1; s12 += w * x1 * x2; s22 += w * x2 * x2
        b0 += w * x0 * y(i); b1 += w * x1 * y(i); b2 += w * x2 * y(i)
        i += 1
      }
      val lm = 1e-12
      val det = (s00 + lm) * ((s11 + lm) * (s22 + lm) - s12 * s12) -
        s01 * (s01 * (s22 + lm) - s12 * s02) +
        s02 * (s01 * s12 - (s11 + lm) * s02)
      if (det == 0.0 || det.isNaN) return (0.0, 0.0, 0.0, Double.MaxValue)
      val a = (b0 * ((s11 + lm) * (s22 + lm) - s12 * s12) -
        s01 * (b1 * (s22 + lm) - s12 * b2) +
        s02 * (b1 * s12 - (s11 + lm) * b2)) / det
      val b = ((s00 + lm) * (b1 * (s22 + lm) - s12 * b2) -
        b0 * (s01 * (s22 + lm) - s12 * s02) +
        s02 * (s01 * b2 - b1 * s02)) / det
      val c = ((s00 + lm) * ((s11 + lm) * b2 - b1 * s12) -
        s01 * (s01 * b2 - b1 * s02) +
        b0 * (s01 * s12 - (s11 + lm) * s02)) / det
      var chi = 0.0
      i = 0
      while (i < n) {
        val w = if (err(i) != 0 && !err(i).isNaN) 1.0 / (err(i) * err(i)) else 0.0
        val r = y(i) - (a * tt(i) + b + c * math.exp(-d * tt(i)))
        chi += w * r * r
        i += 1
      }
      (a, b, c, chi)
    }

    val dLo = -0.03; val dHi = 10.0
    var bestDv = dLo; var best = solveFor(dLo)
    var k = 0
    while (k <= 100) {
      val d = dLo + (dHi - dLo) * k / 100.0
      val s = solveFor(d)
      if (s._4 < best._4) { best = s; bestDv = d }
      k += 1
    }
    // golden-section refinement around the best grid cell
    var lo = math.max(dLo, bestDv - (dHi - dLo) / 100.0)
    var hi = math.min(dHi, bestDv + (dHi - dLo) / 100.0)
    val phi = (math.sqrt(5.0) - 1) / 2
    var it = 0
    while (it < 60) {
      val d1 = hi - phi * (hi - lo)
      val d2 = lo + phi * (hi - lo)
      if (solveFor(d1)._4 < solveFor(d2)._4) hi = d2 else lo = d1
      it += 1
    }
    val dStar = (lo + hi) / 2
    val s = solveFor(dStar)
    if (s._4 < best._4) { best = s; bestDv = dStar }
    val dof = math.max(1, n - 4)
    (best._1, best._2, best._3, bestDv, best._4 / dof)
  }

  /** Full 12-feature vector in the classifier's column order
    * (classifier.py:96-109).
    */
  def features(t: Array[Double], m: Array[Double], e: Array[Double],
      f: Array[String]): Features = {
    val (inc, d1, d3) = rates(t, m, f)
    val (gr, ri) = colours(t, m, f)
    val (a, b, c, d, chi2) = fitLightCurve(t, m, e, f)
    Features(duration(t, m), inc, d1, d3, gr, ri, a, b, c, d,
      a / b, chi2)
  }

  /** classifier.py:145-150 pre-processing: +-inf -> 1000, NaN -> 0,
    * then sklearn normalize(norm="max"): divide the row by its maximum
    * ABSOLUTE value.
    */
  def preprocess(raw: Array[Double]): Array[Double] = {
    val cleaned = raw.map { v =>
      if (v.isPosInfinity || v.isNegInfinity) 1000.0
      else if (v.isNaN) 0.0 else v
    }
    val mx = cleaned.map(math.abs).max
    if (mx == 0.0) cleaned else cleaned.map(_ / mx)
  }
}
