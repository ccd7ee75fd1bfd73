package graft.tools

/** Candidate definitions for the five RECONSTRUCTED LIA statistics
  * (see kernels/LiaFeatures.scala tiers), each computed from one band's
  * (mag, magerr) with the same flux conversion the kernel uses. The
  * [[LiaAnchors]] main scores these against the bundled-artifact
  * anchors; winners migrate into the kernel.
  */
object LiaCandidates {

  private def nfne(mag: Array[Double], magerr: Array[Double]):
      (Array[Double], Array[Double]) = {
    val flux = mag.map(m => math.pow(10.0, (24.0 - m) / 2.5))
    val fluxErr = mag.indices.map(i =>
      magerr(i) * flux(i) * math.log(10.0) / 2.5).toArray
    val fmax = flux.max
    (flux.map(_ / fmax), fluxErr.map(_ / fmax))
  }

  private def median(xs: Array[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  // ---- f31 median_buffer_range ----

  val mbrMedianFrac: (Array[Double], Array[Double]) => Double = (m, e) => {
    val (nf, _) = nfne(m, e)
    val med = median(nf)
    nf.count(x => math.abs(x - med) < 0.1 * med).toDouble / nf.length
  }

  val mbrAmpFrac: (Array[Double], Array[Double]) => Double = (m, e) => {
    val (nf, _) = nfne(m, e)
    val med = median(nf)
    val amp = (nf.max - nf.min) / 2.0
    nf.count(x => math.abs(x - med) < amp / 10.0).toDouble / nf.length
  }

  // ---- f32 median_distance ----

  val mdNormFlux: (Array[Double], Array[Double]) => Double = (m, e) => {
    val (nf, ne) = nfne(m, e)
    val n = nf.length
    if (n < 2) 0.0
    else median(Array.tabulate(n - 1)(i =>
      math.sqrt(math.pow(nf(i + 1) - nf(i), 2) + math.pow(ne(i + 1) - ne(i), 2))))
  }

  val mdMag: (Array[Double], Array[Double]) => Double = (m, e) => {
    val n = m.length
    if (n < 2) 0.0
    else median(Array.tabulate(n - 1)(i =>
      math.sqrt(math.pow(m(i + 1) - m(i), 2) + math.pow(e(i + 1) - e(i), 2))))
  }

  val mdAbsFlux: (Array[Double], Array[Double]) => Double = (m, e) => {
    val (nf, _) = nfne(m, e)
    val n = nf.length
    if (n < 2) 0.0
    else median(Array.tabulate(n - 1)(i => math.abs(nf(i + 1) - nf(i))))
  }

  // ---- f33 peak_detection ----

  val peaksMeanStd: (Array[Double], Array[Double]) => Double = (m, e) => {
    val (nf, _) = nfne(m, e)
    val n = nf.length
    val mean = nf.sum / n
    val std = math.sqrt(nf.map(x => (x - mean) * (x - mean)).sum / n)
    (1 until n - 1).count(i =>
      nf(i) > nf(i - 1) && nf(i) > nf(i + 1) && nf(i) > mean + std).toDouble
  }

  /** peakutils.indexes(y, thres, min_dist): strict local maxima of y
    * above thres*(ymax-ymin)+ymin, then greedy suppression keeping the
    * highest peak within each min_dist window.
    */
  def peakutils(y: Array[Double], thres: Double, minDist: Int): Int = {
    val n = y.length
    if (n < 3) return 0
    val cut = thres * (y.max - y.min) + y.min
    val raw = (1 until n - 1).filter(i =>
      y(i) > y(i - 1) && y(i) > y(i + 1) && y(i) > cut)
    if (raw.isEmpty) return 0
    val keep = scala.collection.mutable.ArrayBuffer[Int]()
    raw.sortBy(i => -y(i)).foreach { i =>
      if (keep.forall(j => math.abs(j - i) >= minDist)) keep += i
    }
    keep.length
  }

  val peaksHalfRange: (Array[Double], Array[Double]) => Double = (m, e) => {
    val (nf, _) = nfne(m, e)
    val med = median(nf)
    peakutils(nf.map(x => math.abs(x - med)), 0.5, 25).toDouble
  }

  val peaksHalfRangeMd10: (Array[Double], Array[Double]) => Double = (m, e) => {
    val (nf, _) = nfne(m, e)
    val med = median(nf)
    peakutils(nf.map(x => math.abs(x - med)), 0.5, 10).toDouble
  }

  // ---- f36 sample_entropy ----

  def sampEn(x: Array[Double], m: Int, r: Double): Double = {
    val n = x.length
    if (n <= m + 1 || r <= 0) return 0.0
    def count(len: Int): Long = {
      var c = 0L
      var i = 0
      while (i < n - len) {
        var j = i + 1
        while (j < n - len) {
          var k = 0; var ok = true
          while (ok && k < len) {
            if (math.abs(x(i + k) - x(j + k)) > r) ok = false
            k += 1
          }
          if (ok) c += 1
          j += 1
        }
        i += 1
      }
      c
    }
    val b = count(m); val a = count(m + 1)
    if (a == 0 || b == 0) 0.0 else -math.log(a.toDouble / b)
  }

  val sampEnNf: (Array[Double], Array[Double]) => Double = (m, e) => {
    val (nf, _) = nfne(m, e)
    val mean = nf.sum / nf.length
    val std = math.sqrt(nf.map(x => (x - mean) * (x - mean)).sum / nf.length)
    sampEn(nf, 2, 0.2 * std)
  }

  val sampEnMag: (Array[Double], Array[Double]) => Double = (m, _) => {
    val mean = m.sum / m.length
    val std = math.sqrt(m.map(x => (x - mean) * (x - mean)).sum / m.length)
    sampEn(m, 2, 0.2 * std)
  }

  /** r9 parameterization sweep: (domain, template length m, tolerance
    * factor r/std) — the two axes the r7 adoption left open plus the
    * template length, scored against the f36 anchors (training mean
    * 1.49, thresholds 0.39..2.88 with p50 at 0.92).
    */
  def sampEnParam(useMag: Boolean, mm: Int, rf: Double)
      : (Array[Double], Array[Double]) => Double = (m, e) => {
    val x = if (useMag) m else nfne(m, e)._1
    val mean = x.sum / x.length
    val std = math.sqrt(x.map(v => (v - mean) * (v - mean)).sum / x.length)
    sampEn(x, mm, rf * std)
  }

  // ---- f37 shannon_entropy ----

  val shannonHist: (Array[Double], Array[Double]) => Double = (m, e) => {
    val (nf, _) = nfne(m, e)
    val lo = nf.min; val hi = nf.max
    if (hi == lo) 0.0
    else {
      val bins = new Array[Int](10)
      nf.foreach { x =>
        bins(math.min(9, ((x - lo) / (hi - lo) * 10).toInt)) += 1
      }
      -bins.filter(_ > 0).map { c =>
        val p = c.toDouble / nf.length
        p * math.log(p)
      }.sum / math.log(10.0)
    }
  }

  private def phi(z: Double): Double =
    0.5 * (1.0 + erf(z / math.sqrt(2.0)))

  private def erf(x: Double): Double = {
    // Abramowitz-Stegun 7.1.26, |eps| < 1.5e-7
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) *
      t - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    if (x >= 0) y else -y
  }

  /** -sum over points of p*log2(p)+q*log2(q), p = Gaussian(mean, RMS)
    * mass inside the point's error bar, q = 1-p; on normalized flux.
    */
  val shannonCdf: (Array[Double], Array[Double]) => Double = (m, e) => {
    val (nf, ne) = nfne(m, e)
    val n = nf.length
    val mean = nf.sum / n
    val rms = math.sqrt(nf.map(x => x * x).sum / n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val p = phi((nf(i) + ne(i) - mean) / rms) - phi((nf(i) - ne(i) - mean) / rms)
      if (p > 0 && p < 1) {
        val q = 1.0 - p
        s -= (p * math.log(p) + q * math.log(q)) / math.log(2.0)
      }
      i += 1
    }
    s
  }

  /** Same per-point error-bar mass, but the per-point mean of the
    * binary-entropy terms instead of the sum.
    */
  val shannonCdfMean: (Array[Double], Array[Double]) => Double = (m, e) => {
    val v = shannonCdf(m, e)
    v / m.length
  }

  /** Surprisal weighted by the mass OUTSIDE the error bar:
    * -sum log2(p)*(1-p), p = Gaussian(mean, std) mass inside
    * [x-2*err, x+2*err], magnitude domain. Near 0 when every point's
    * doubled error bar covers the sample distribution (a
    * Gaussian-consistent constant source); grows without bound on
    * structured excursions.
    */
  val shannonInvMag: (Array[Double], Array[Double]) => Double = (m, e) => {
    val n = m.length
    val mean = m.sum / n
    val std = math.sqrt(m.map(x => (x - mean) * (x - mean)).sum / n)
    var s = 0.0
    var i = 0
    while (std > 0 && i < n) {
      val p = phi((m(i) + 2 * e(i) - mean) / std) - phi((m(i) - 2 * e(i) - mean) / std)
      if (p > 0 && p < 1) s -= math.log(p) / math.log(2.0) * (1.0 - p)
      i += 1
    }
    s
  }

  /** r9 parameterization sweep of the ADOPTED error-CDF surprisal
    * family (the kernel's current f37 is useMag=true, k=2, log2,
    * unnormalized): -sum log_base(p_i), p_i = Gaussian(mean, std) mass
    * inside [x_i - k*err_i, x_i + k*err_i]. Axes left open by the r7
    * family adoption: domain, error-bar multiplier k, log base, and
    * per-point normalization.
    */
  def shannonSurprisal(useMag: Boolean, k: Double, lnBase: Boolean,
      perPoint: Boolean): (Array[Double], Array[Double]) => Double = (m, e) => {
    val (x, xe) = if (useMag) (m, e) else nfne(m, e)
    val n = x.length
    val mean = x.sum / n
    val std = math.sqrt(x.map(v => (v - mean) * (v - mean)).sum / n)
    if (std == 0) 0.0
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        val p = phi((x(i) + k * xe(i) - mean) / std) -
          phi((x(i) - k * xe(i) - mean) / std)
        s -= math.log(math.max(p, 1e-12)) /
          (if (lnBase) 1.0 else math.log(2.0))
        i += 1
      }
      if (perPoint) s / n else s
    }
  }

  /** FIXED-range histogram entropy in bits: -sum p_b log2 p_b over
    * `bins` equal cells of [0, 1] on normalized flux (nf = flux/max is
    * in (0, 1] by construction). Unlike the min-max-ranged r6
    * histogram (bounded by 1 after its /log10 normalization — refuted
    * by thresholds reaching 4.81), the FIXED range makes the statistic
    * collapse to ~0 for any low-noise curve (every point lands in the
    * top cell) and reach log2(bins) for high-amplitude spread — the
    * near-zero-mass / bounded-tail ladder the f37 anchors describe
    * (bound 4.81 < log2(bins) needs bins >= 29).
    */
  def shannonFixedHist(bins: Int): (Array[Double], Array[Double]) => Double =
    (m, e) => {
      val (nf, _) = nfne(m, e)
      val counts = new Array[Int](bins)
      nf.foreach { x =>
        val b = math.min(bins - 1, math.max(0, (x * bins).toInt))
        counts(b) += 1
      }
      -counts.filter(_ > 0).map { c =>
        val p = c.toDouble / nf.length
        p * math.log(p) / math.log(2.0)
      }.sum
    }

  /** Mislis et al. 2015-style double-CDF form, error-bar weighted:
    * -sum 2*err_i * (log2 P(X < x_i+err_i) + log2 P(X < x_i-err_i)),
    * Gaussian(mean, std) CDF — the published-entropy shape LIA's
    * docstring points at, included so the adopted family is tested
    * AGAINST it rather than assumed past it.
    */
  def shannonMislis(useMag: Boolean): (Array[Double], Array[Double]) => Double =
    (m, e) => {
      val (x, xe) = if (useMag) (m, e) else nfne(m, e)
      val n = x.length
      val mean = x.sum / n
      val std = math.sqrt(x.map(v => (v - mean) * (v - mean)).sum / n)
      if (std == 0) 0.0
      else {
        var s = 0.0
        var i = 0
        while (i < n) {
          val pUp = phi((x(i) + xe(i) - mean) / (std * math.sqrt(2.0)))
          val pDn = phi((x(i) - xe(i) - mean) / (std * math.sqrt(2.0)))
          s -= 2.0 * xe(i) *
            (math.log(math.max(pUp, 1e-12)) + math.log(math.max(pDn, 1e-12))) /
            math.log(2.0)
          i += 1
        }
        s
      }
    }

  /** r10 family: OUTLIER-GATED per-point surprisal — only points whose
    * error-bar mass falls below `p0` contribute -log_base(p_i), then
    * optional /n. The gate is what every previous family lacked
    * against the f37 threshold sketch: HALF the training threshold
    * mass sits below 0.008, i.e. half the training curves score
    * essentially ZERO, which an ungated surprisal can never produce
    * (an honest-error constant curve still pays ~0.07/point at k=2) —
    * but a gated one does, exactly (no point of a consistent curve
    * clears the gate).
    */
  def shannonOutlierGated(useMag: Boolean, k: Double, p0: Double,
      perPoint: Boolean): (Array[Double], Array[Double]) => Double = (m, e) => {
    val (x, xe) = if (useMag) (m, e) else nfne(m, e)
    val n = x.length
    val mean = x.sum / n
    val std = math.sqrt(x.map(v => (v - mean) * (v - mean)).sum / n)
    if (std == 0) 0.0
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        val p = phi((x(i) + k * xe(i) - mean) / std) -
          phi((x(i) - k * xe(i) - mean) / std)
        if (p < p0) s -= math.log(math.max(p, 1e-12)) / math.log(2.0)
        i += 1
      }
      if (perPoint) s / n else s
    }
  }

  /** r10 family: per-point BINARY entropy -sum[p log2 p + q log2 q]
    * over the k-sigma error-bar mass (generalizes shannonCdf's k=1 nf
    * form across domain/k/normalization).
    */
  def shannonBinary(useMag: Boolean, k: Double, perPoint: Boolean)
      : (Array[Double], Array[Double]) => Double = (m, e) => {
    val (x, xe) = if (useMag) (m, e) else nfne(m, e)
    val n = x.length
    val mean = x.sum / n
    val std = math.sqrt(x.map(v => (v - mean) * (v - mean)).sum / n)
    if (std == 0) 0.0
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        val p = phi((x(i) + k * xe(i) - mean) / std) -
          phi((x(i) - k * xe(i) - mean) / std)
        if (p > 0 && p < 1) {
          val q = 1.0 - p
          s -= (p * math.log(p) + q * math.log(q)) / math.log(2.0)
        }
        i += 1
      }
      if (perPoint) s / n else s
    }
  }

  /** r10 family: Vasicek m-spacing differential-entropy estimator (the
    * standard sample "Shannon entropy" of a continuous series):
    * H = (1/n) sum ln(n/(2m) * (x_(i+m) - x_(i-m))) over the sorted
    * sample, edges clamped; in bits.
    */
  def shannonVasicek(useMag: Boolean, mWin: Int)
      : (Array[Double], Array[Double]) => Double = (m, e) => {
    val x = (if (useMag) m else nfne(m, e)._1).sorted
    val n = x.length
    if (n <= 2 * mWin) 0.0
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        val hiV = x(math.min(n - 1, i + mWin))
        val loV = x(math.max(0, i - mWin))
        s += math.log(math.max(n.toDouble / (2 * mWin) * (hiV - loV), 1e-12))
        i += 1
      }
      s / n / math.log(2.0)
    }
  }

  /** Same inverse-weighted surprisal on normalized flux. */
  val shannonInvNf: (Array[Double], Array[Double]) => Double = (m, e) => {
    val (nf, ne) = nfne(m, e)
    val n = nf.length
    val mean = nf.sum / n
    val std = math.sqrt(nf.map(x => (x - mean) * (x - mean)).sum / n)
    var s = 0.0
    var i = 0
    while (std > 0 && i < n) {
      val p = phi((nf(i) + 2 * ne(i) - mean) / std) - phi((nf(i) - 2 * ne(i) - mean) / std)
      if (p > 0 && p < 1) s -= math.log(p) / math.log(2.0) * (1.0 - p)
      i += 1
    }
    s
  }

  // ---- f37 r12 families: the two axes every earlier sweep left
  // untouched. (a) UNIFORM-CDF window mass — the SIDRA method the LIA
  // docstring cites (Mislis et al. 2015) scores each point against
  // BOTH a Gaussian and a uniform model, and no uniform-model
  // candidate has ever been swept; (b) the UNCENTERED RMS scale —
  // LIA's own helper is a root-mean-square (sqrt(mean(x^2))), not a
  // centered std, and in the magnitude domain the two differ by ~the
  // mean magnitude itself.

  /** Per-point surprisal of the UNIFORM window mass: p_i = |[x-k*e,
    * x+k*e] ∩ [min, max]| / (max - min). Near 1 (term near 0) when the
    * error bars span the observed range — the constant-star case the
    * near-zero f37 threshold mass demands — and small (term large) for
    * high-amplitude structure.
    */
  def shannonUniform(useMag: Boolean, k: Double,
      perPoint: Boolean): (Array[Double], Array[Double]) => Double = (m, e) => {
    val (x, xe) = if (useMag) (m, e) else nfne(m, e)
    val n = x.length
    val lo = x.min; val hi = x.max
    if (hi == lo) 0.0
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        val a = math.max(lo, x(i) - k * xe(i))
        val b = math.min(hi, x(i) + k * xe(i))
        val p = math.max(b - a, 0.0) / (hi - lo)
        s -= math.log(math.max(p, 1e-12)) / math.log(2.0)
        i += 1
      }
      if (perPoint) s / n else s
    }
  }

  /** Mislis-style PAIR: per-point sum of the Gaussian and uniform
    * window-mass surprisals (both k-sigma'd on the same domain),
    * optionally per-point normalized.
    */
  def shannonNormalPlusUniform(useMag: Boolean, k: Double,
      perPoint: Boolean): (Array[Double], Array[Double]) => Double = (m, e) => {
    val g = shannonSurprisal(useMag, k, lnBase = false, perPoint)(m, e)
    val u = shannonUniform(useMag, k, perPoint)(m, e)
    g + u
  }

  /** The adopted per-point Gaussian surprisal with LIA's UNCENTERED
    * RMS as the scale: z = (x ± k*e - mean) / sqrt(mean(x^2)). In the
    * magnitude domain RMS ~ |mean mag| >> centered std, so windows
    * shrink toward zero mass and surprisal inflates — included to
    * refute or adopt the RootMS reading of the source's scale choice.
    */
  def shannonRms(useMag: Boolean, k: Double,
      perPoint: Boolean): (Array[Double], Array[Double]) => Double = (m, e) => {
    val (x, xe) = if (useMag) (m, e) else nfne(m, e)
    val n = x.length
    val mean = x.sum / n
    val rms = math.sqrt(x.map(v => v * v).sum / n)
    if (rms == 0) 0.0
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        val p = phi((x(i) + k * xe(i) - mean) / rms) -
          phi((x(i) - k * xe(i) - mean) / rms)
        s -= math.log(math.max(p, 1e-12)) / math.log(2.0)
        i += 1
      }
      if (perPoint) s / n else s
    }
  }
}
