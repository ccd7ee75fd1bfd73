package graft.kernels

/** Rainbow rising-light-curve fit — the multiband model behind the
  * Rubin early-SN-Ia and SLSN classifiers (reference:
  * rubin/random_forest_snia/processor.py:40-155, which delegates to
  * actsnfink/light-curve's published Rainbow model, Russeil et al.
  * 2024, A&A 683 A251):
  *
  *   F(t, nu) = A * s(t) * (2 pi h nu^3 / c^2)
  *              / expm1(h nu / (kB T(t))) / (sigma_SB T(t)^4)
  *
  * with a sigmoid bolometric rise s(t) = 1/(1+exp(-(t-t0)/rise_time))
  * and sigmoid temperature evolution
  * T(t) = Tmin + delta_T / (1 + exp((t-t0)/k_sig)).
  *
  * Feature vector (RAINBOW_FEATURES_NAMES, processor.py:33-41):
  * amplitude, rise_time, Tmin, delta_T, k_sig, reduced_chi2, lc_max —
  * the reference drops the fitted t0 (features[1:]).
  *
  * The reference's fit is scipy curve_fit inside actsnfink; here it is
  * a deterministic damped Gauss-Newton with numeric Jacobian and box
  * clamping — same model, same feature semantics, solver-level
  * deviation documented.
  */
object RainbowFit {

  // SI constants (CODATA), as light-curve's rainbow uses
  private val H = 6.62607015e-34
  private val C = 2.99792458e8
  private val KB = 1.380649e-23
  private val SIGMA_SB = 5.670374419e-8

  val FeatureNames: Seq[String] = Seq("amplitude", "rise_time", "Tmin",
    "delta_T", "k_sig", "reduced_chi2", "lc_max")

  /** LSST effective wavelengths in Angstrom (processor.py:112-119). */
  val LsstBandWaveAA: Map[String, Double] = Map(
    "u" -> 3671.0, "g" -> 4827.0, "r" -> 6223.0,
    "i" -> 7546.0, "z" -> 8691.0, "Y" -> 9712.0, "y" -> 9712.0)

  /** ZTF effective wavelengths (processor.py docstring). */
  val ZtfBandWaveAA: Map[String, Double] = Map(
    "g" -> 4770.0, "r" -> 6231.0, "i" -> 7625.0)

  /** Model flux at (t, nu) for params (t0, A, riseTime, tMin, deltaT, kSig). */
  def modelFlux(p: Array[Double], t: Double, nu: Double): Double = {
    val t0 = p(0); val a = p(1); val rise = p(2)
    val tMin = p(3); val dT = p(4); val kSig = p(5)
    val s = 1.0 / (1.0 + math.exp(-(t - t0) / rise))
    val temp = tMin + dT / (1.0 + math.exp((t - t0) / kSig))
    val x = H * nu / (KB * temp)
    val planck = 2.0 * math.Pi * H * nu * nu * nu / (C * C) / math.expm1(x)
    a * s * planck / (SIGMA_SB * temp * temp * temp * temp)
  }

  final case class Result(t0: Double, amplitude: Double, riseTime: Double,
      tMin: Double, deltaT: Double, kSig: Double, reducedChi2: Double,
      lcMax: Double) {
    /** RAINBOW_FEATURES_NAMES order (t0 dropped like the reference). */
    def features: Array[Double] =
      Array(amplitude, riseTime, tMin, deltaT, kSig, reducedChi2, lcMax)
  }

  /** True when the band's flux trend is rising (weighted LS slope > 0). */
  def isRising(t: Array[Double], f: Array[Double]): Boolean = {
    val n = t.length
    if (n < 2) return false
    val tm = t.sum / n; val fm = f.sum / n
    var stt = 0.0; var stf = 0.0
    var i = 0
    while (i < n) { val dt = t(i) - tm; stt += dt * dt; stf += dt * (f(i) - fm); i += 1 }
    stt > 0 && stf / stt > 0
  }

  /** Fit the rainbow model over a multiband curve. `waveAA` maps band
    * labels to effective wavelengths; unknown bands are dropped (the
    * reference's dict lookup would raise — callers pre-filter).
    */
  def fit(t: Array[Double], band: Array[String], flux: Array[Double],
      fluxErr: Array[Double], waveAA: Map[String, Double]): Result = {
    val sel = t.indices.filter(i => waveAA.contains(band(i)))
    val tt = sel.map(t).toArray
    val ff = sel.map(flux).toArray
    val ee = sel.map(i =>
      if (fluxErr(i).isNaN || fluxErr(i) <= 0) 1.0 else fluxErr(i)).toArray
    val nu = sel.map(i => C / (waveAA(band(i)) * 1e-10)).toArray
    val n = tt.length
    val lcMax = if (ff.nonEmpty) ff.max else Double.NaN
    if (n < 7) return Result(Double.NaN, 0, 0, 0, 0, 0, 0, if (lcMax.isNaN) 0 else lcMax)

    val iMax = ff.indices.maxBy(ff)
    val lo = Array(tt.min - 200.0, 1e-12, 1e-2, 1e3, 0.0, 1e-2)
    val hi = Array(tt.max + 200.0, 1e30, 100.0, 5e4, 5e4, 100.0)

    def chi2Of(q: Array[Double]): Double = {
      var c = 0.0
      var i = 0
      while (i < n) {
        val r = (ff(i) - modelFlux(q, tt(i), nu(i))) / ee(i)
        c += r * r
        i += 1
      }
      c
    }

    // scale-aware amplitude seed: A such that the model passes through
    // the observed maximum for the candidate (t0, rise, T) shape
    def seed(t0: Double, rise: Double): Array[Double] = {
      val q = Array(t0, 1.0, rise, 7000.0, 7000.0, 3.0)
      val unit = modelFlux(q, tt(iMax), nu(iMax))
      q(1) = if (unit > 0) math.max(ff(iMax), 1e-12) / unit else 1.0
      q
    }
    // multi-start over plausible rise geometries; the sigmoid saturates
    // when t0 drifts far left, leaving a degenerate local minimum —
    // starting at/before the observed peak avoids locking onto it
    val starts = for {
      rise <- Seq(2.0, 5.0, 15.0)
      t0 <- Seq(tt(iMax), tt(iMax) - rise, (tt.min + tt(iMax)) / 2)
    } yield seed(t0, rise)
    val p = starts.minBy(chi2Of).clone()

    // damped Gauss-Newton with numeric Jacobian and box clamping
    var lambda = 1e-3
    var iter = 0
    var chi = chi2Of(p)
    val np_ = 6
    while (iter < 60) {
      val jtj = Array.ofDim[Double](np_, np_)
      val jtr = new Array[Double](np_)
      var i = 0
      while (i < n) {
        val f0 = modelFlux(p, tt(i), nu(i))
        val grad = new Array[Double](np_)
        var k = 0
        while (k < np_) {
          val eps = math.max(math.abs(p(k)) * 1e-6, 1e-9)
          val saved = p(k)
          p(k) = saved + eps
          grad(k) = (modelFlux(p, tt(i), nu(i)) - f0) / eps
          p(k) = saved
          k += 1
        }
        val w = 1.0 / (ee(i) * ee(i))
        val r = ff(i) - f0
        k = 0
        while (k < np_) {
          var l = 0
          while (l < np_) { jtj(k)(l) += w * grad(k) * grad(l); l += 1 }
          jtr(k) += w * grad(k) * r
          k += 1
        }
        i += 1
      }
      var k = 0
      while (k < np_) { jtj(k)(k) *= (1.0 + lambda); jtj(k)(k) += 1e-12; k += 1 }
      val step = solve(jtj, jtr)
      if (step == null) { iter = 60 }
      else {
        val trial = Array.tabulate(np_)(k =>
          math.min(hi(k), math.max(lo(k), p(k) + step(k))))
        val trialChi = chi2Of(trial)
        if (trialChi < chi) {
          System.arraycopy(trial, 0, p, 0, np_)
          if (chi - trialChi < 1e-10 * (1.0 + chi)) iter = 60
          chi = trialChi
          lambda = math.max(lambda / 3.0, 1e-9)
        } else {
          lambda *= 10.0
          if (lambda > 1e9) iter = 60
        }
      }
      iter += 1
    }
    val dof = math.max(1, n - np_)
    // report amplitude in the reference convention (see fitBazin)
    Result(p(0), p(1) / averageNu(waveAA.values), p(2), p(3), p(4), p(5),
      chi / dof, lcMax)
  }

  /** light-curve's BaseRainbowFit reports the bolometric amplitude
    * divided by the average passband frequency ("internally we use
    * amplitude of F_bol / <nu> ... same units and order as the input
    * fluxes"), so downstream classifiers are trained on flux-scale
    * amplitudes (slsn doctest: 4886.5). The fit itself runs in
    * bolometric units; only the reported value rescales.
    */
  private def averageNu(waveAA: Iterable[Double]): Double =
    waveAA.map(w => C / (w * 1e-10)).sum / waveAA.size

  /** Rainbow with the bazin bolometric and sigmoid temperature — the
    * variant the reference's ZTF superluminous module fits
    * (ztf/superluminous/slsn_classifier.py:695-700 with
    * kernel.py temperature="sigmoid", bolometric="bazin"):
    *
    *   s(t) = exp(-(t-t0)/fall_time) / (1 + exp(-(t-t0)/rise_time))
    *   T(t) = Tmin + (Tmax - Tmin) / (1 + exp((t-t0)/t_color))
    *
    * Parameter order matches the reference's rainbow names:
    * reference_time, amplitude, rise_time, fall_time, Tmin, Tmax,
    * t_color. `errors` are sqrt(diag(inv(JtJ))) at the solution — the
    * Gauss-Newton analogue of iminuit's parabolic errors (solver-level
    * deviation documented); snr features are value/error.
    */
  final case class BazinResult(params: Array[Double], errors: Array[Double],
      reducedChi2: Double) {
    /** value(7) ++ snr(7) ++ chi2 — fit_rainbow's return layout
      * (slsn_classifier.py:473).
      */
    def features: Array[Double] =
      params ++ params.indices.map(i => params(i) / errors(i)) :+ reducedChi2
  }

  val BazinParamNames: Seq[String] = Seq("reference_time", "amplitude",
    "rise_time", "fall_time", "Tmin", "Tmax", "t_color")

  /** Bazin-rainbow model flux at (t, nu). */
  def bazinModelFlux(p: Array[Double], t: Double, nu: Double): Double = {
    val t0 = p(0); val a = p(1); val rise = p(2); val fall = p(3)
    val tMin = p(4); val tMax = p(5); val tColor = p(6)
    val s = math.exp(-(t - t0) / fall) / (1.0 + math.exp(-(t - t0) / rise))
    val temp = tMin + (tMax - tMin) / (1.0 + math.exp((t - t0) / tColor))
    val x = H * nu / (KB * temp)
    val planck = 2.0 * math.Pi * H * nu * nu * nu / (C * C) / math.expm1(x)
    a * s * planck / (SIGMA_SB * temp * temp * temp * temp)
  }

  /** Fit the bazin-bolometric rainbow (7 params) with per-parameter
    * errors. NaN params when fewer than 8 usable points (dof >= 1).
    */
  def fitBazin(t: Array[Double], band: Array[Double], flux: Array[Double],
      fluxErr: Array[Double], waveAA: Map[Int, Double]): BazinResult = {
    val sel = t.indices.filter(i => waveAA.contains(band(i).toInt))
    val tt = sel.map(t).toArray
    val ff = sel.map(flux).toArray
    val ee = sel.map(i =>
      if (fluxErr(i).isNaN || fluxErr(i) <= 0) 1.0 else fluxErr(i)).toArray
    val nu = sel.map(i => C / (waveAA(band(i).toInt) * 1e-10)).toArray
    val n = tt.length
    val np_ = 7
    if (n < np_ + 1)
      return BazinResult(Array.fill(np_)(Double.NaN), Array.fill(np_)(Double.NaN), Double.NaN)

    val iMax = ff.indices.maxBy(ff)
    val lo = Array(tt.min - 200.0, 1e-12, 1e-2, 1e-2, 1e3, 1e3, 1e-2)
    val hi = Array(tt.max + 200.0, 1e30, 500.0, 500.0, 5e4, 5e4, 500.0)

    def chi2Of(q: Array[Double]): Double = {
      var c = 0.0
      var i = 0
      while (i < n) {
        val r = (ff(i) - bazinModelFlux(q, tt(i), nu(i))) / ee(i)
        c += r * r
        i += 1
      }
      c
    }

    def seed(t0: Double, rise: Double, fall: Double): Array[Double] = {
      val q = Array(t0, 1.0, rise, fall, 5000.0, 12000.0, 10.0)
      val unit = bazinModelFlux(q, tt(iMax), nu(iMax))
      q(1) = if (unit > 0) math.max(ff(iMax), 1e-12) / unit else 1.0
      q
    }
    val starts = for {
      rise <- Seq(2.0, 6.0, 15.0)
      fall <- Seq(15.0, 40.0, 90.0)
      t0 <- Seq(tt(iMax), tt(iMax) - rise)
    } yield seed(t0, rise, fall)
    val p = starts.minBy(chi2Of).clone()

    var lambda = 1e-3
    var iter = 0
    var chi = chi2Of(p)
    var jtjAtSolution: Array[Array[Double]] = null
    while (iter < 200) {
      val jtj = Array.ofDim[Double](np_, np_)
      val jtr = new Array[Double](np_)
      var i = 0
      while (i < n) {
        val f0 = bazinModelFlux(p, tt(i), nu(i))
        val grad = new Array[Double](np_)
        var k = 0
        while (k < np_) {
          val eps = math.max(math.abs(p(k)) * 1e-6, 1e-9)
          val saved = p(k)
          p(k) = saved + eps
          grad(k) = (bazinModelFlux(p, tt(i), nu(i)) - f0) / eps
          p(k) = saved
          k += 1
        }
        val w = 1.0 / (ee(i) * ee(i))
        val r = ff(i) - f0
        k = 0
        while (k < np_) {
          var l = 0
          while (l < np_) { jtj(k)(l) += w * grad(k) * grad(l); l += 1 }
          jtr(k) += w * grad(k) * r
          k += 1
        }
        i += 1
      }
      jtjAtSolution = Array.tabulate(np_)(k => jtj(k).clone())
      var k = 0
      while (k < np_) { jtj(k)(k) *= (1.0 + lambda); jtj(k)(k) += 1e-12; k += 1 }
      val step = solve(jtj, jtr)
      if (step == null) { iter = 200 }
      else {
        val trial = Array.tabulate(np_)(k =>
          math.min(hi(k), math.max(lo(k), p(k) + step(k))))
        val trialChi = chi2Of(trial)
        if (trialChi < chi) {
          System.arraycopy(trial, 0, p, 0, np_)
          if (chi - trialChi < 1e-13 * (1.0 + chi)) iter = 200
          chi = trialChi
          lambda = math.max(lambda / 3.0, 1e-9)
        } else {
          lambda *= 10.0
          if (lambda > 1e12) iter = 200
        }
      }
      iter += 1
    }
    // parabolic errors: sqrt(diag(inv(JtJ))); JtJ singular -> |value|
    // (snr = 1), keeping the row scoreable like iminuit's fallback
    val errors = invDiag(jtjAtSolution) match {
      case Some(d) => Array.tabulate(np_)(k =>
        if (d(k) > 0) math.sqrt(d(k)) else math.max(math.abs(p(k)), 1e-12))
      case None => p.map(v => math.max(math.abs(v), 1e-12))
    }
    val dof = math.max(1, n - np_)
    // reference-convention amplitude: divide value AND error by <nu>
    // (snr_amplitude is scale-invariant; the bundled XGBoost's tree
    // splits on `amplitude` expect the flux-scale value)
    val nuAvg = averageNu(waveAA.values)
    p(1) /= nuAvg
    errors(1) /= nuAvg
    BazinResult(p, errors, chi / dof)
  }

  /** Rainbow with the LINEXP bolometric and sigmoid temperature — the
    * variant the reference's Rubin SLSN module fits
    * (rubin/slsn/feature_extraction.py:176-184: RainbowFit.from_angstrom
    * with temperature="sigmoid", bolometric="linexp", no baseline).
    * Linexp is the linear-rise-into-exponential-decay bolometric of the
    * Rainbow family (Russeil et al. 2024, A&A 683 A251):
    *
    *   s(t) = (dt / rise_time) * exp(1 - dt / rise_time),  dt = t - t0
    *          (0 before the reference time; peak value 1 at t0 + rise)
    *   T(t) = Tmin + (Tmax - Tmin) / (1 + exp((t-t0)/t_color))
    *
    * Feature order mirrors feature_extraction.py:121-129:
    * reference_time, rise_time, amplitude, Tmin, Tmax, t_color,
    * fit_error (reduced chi2 — the solver-level analogue of
    * light-curve's fit error; deviation documented). A fit the solver
    * cannot finish returns the reference's RuntimeError sentinel: all
    * seven features -9.0 (apply_rainbow, feature_extraction.py:178-196).
    * Amplitude reports in the flux scale (divided by the average
    * passband frequency — the BaseRainbowFit convention, see
    * [[averageNu]]).
    */
  val LinexpFeatureNames: Seq[String] = Seq("reference_time", "rise_time",
    "amplitude", "Tmin", "Tmax", "t_color", "fit_error")

  /** Linexp-rainbow model flux at (t, nu); params
    * (t0, A_bol, rise, Tmin, Tmax, t_color). */
  def linexpModelFlux(p: Array[Double], t: Double, nu: Double): Double = {
    val t0 = p(0); val a = p(1); val rise = p(2)
    val tMin = p(3); val tMax = p(4); val tColor = p(5)
    val dt = t - t0
    val s = if (dt <= 0.0) 0.0 else dt / rise * math.exp(1.0 - dt / rise)
    val temp = tMin + (tMax - tMin) / (1.0 + math.exp((t - t0) / tColor))
    val x = H * nu / (KB * temp)
    val planck = 2.0 * math.Pi * H * nu * nu * nu / (C * C) / math.expm1(x)
    a * s * planck / (SIGMA_SB * temp * temp * temp * temp)
  }

  /** Fit the linexp-bolometric rainbow (6 params); returns the 7
    * features of [[LinexpFeatureNames]], or seven -9.0 on failure.
    */
  def fitLinexp(t: Array[Double], band: Array[String], flux: Array[Double],
      fluxErr: Array[Double], waveAA: Map[String, Double]): Array[Double] = {
    val fail = Array.fill(7)(-9.0)
    val sel = t.indices.filter(i => waveAA.contains(band(i)) &&
      !flux(i).isNaN && !t(i).isNaN)
    val tt = sel.map(t).toArray
    val ff = sel.map(flux).toArray
    val ee = sel.map(i =>
      if (fluxErr(i).isNaN || fluxErr(i) <= 0) 1.0 else fluxErr(i)).toArray
    val nu = sel.map(i => C / (waveAA(band(i)) * 1e-10)).toArray
    val n = tt.length
    val np_ = 6
    if (n < np_ + 1) return fail

    val iMax = ff.indices.maxBy(ff)
    val lo = Array(tt.min - 300.0, 1e-12, 1e-2, 1e3, 1e3, 1e-2)
    val hi = Array(tt.max + 100.0, 1e30, 500.0, 5e4, 5e4, 500.0)

    def chi2Of(q: Array[Double]): Double = {
      var c = 0.0
      var i = 0
      while (i < n) {
        val r = (ff(i) - linexpModelFlux(q, tt(i), nu(i))) / ee(i)
        c += r * r
        i += 1
      }
      c
    }

    // scale-aware amplitude seed through the observed max; t0 seeds sit
    // BEFORE the peak (the pre-t0 region is flat zero — a t0 seeded past
    // the data has no gradient to climb back)
    def seed(t0: Double, rise: Double): Array[Double] = {
      val q = Array(t0, 1.0, rise, 5000.0, 12000.0, 10.0)
      val unit = linexpModelFlux(q, tt(iMax), nu(iMax))
      q(1) = if (unit > 0) math.max(ff(iMax), 1e-12) / unit else 1.0
      q
    }
    val tPeak = tt(iMax)
    val starts = for {
      rise <- Seq(5.0, 15.0, 40.0, 80.0)
      t0 <- Seq(tPeak - rise, tt.min - 1.0, tt.min - rise / 2)
    } yield seed(t0, rise)
    val p0 = starts.minBy(chi2Of)

    // Levenberg refinement via the shared PhaseCurve.fitLM (the same
    // damped solver SOCCA uses — one LM kernel to maintain), with the
    // index-as-x trick carrying the per-point frequency
    val idx = Array.tabulate(n)(_.toDouble)
    def model(q: Array[Double], xi: Double): Double = {
      val i = xi.toInt
      linexpModelFlux(q, tt(i), nu(i))
    }
    val r = graft.kernels.PhaseCurve.fitLM(model, p0, lo, hi, idx, ff, ee)
    val p = r.params
    if (p.exists(v => v.isNaN || v.isInfinite) || r.chi2red.isNaN) return fail
    Array(p(0), p(2), p(1) / averageNu(waveAA.values), p(3), p(4), p(5),
      r.chi2red)
  }

  /** Diagonal of inverse(a) via Gauss-Jordan; None when singular. */
  private def invDiag(a: Array[Array[Double]]): Option[Array[Double]] = {
    val n = a.length
    val m = Array.tabulate(n)(i => a(i).clone())
    val inv = Array.tabulate(n)(i => Array.tabulate(n)(j => if (i == j) 1.0 else 0.0))
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r; r += 1 }
      if (m(piv)(col) == 0.0 || m(piv)(col).isNaN) return None
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val ti = inv(col); inv(col) = inv(piv); inv(piv) = ti
      val d = m(col)(col)
      var c = 0
      while (c < n) { m(col)(c) /= d; inv(col)(c) /= d; c += 1 }
      r = 0
      while (r < n) {
        if (r != col && m(r)(col) != 0.0) {
          val f = m(r)(col)
          c = 0
          while (c < n) { m(r)(c) -= f * m(col)(c); inv(r)(c) -= f * inv(col)(c); c += 1 }
        }
        r += 1
      }
      col += 1
    }
    Some(Array.tabulate(n)(i => inv(i)(i)))
  }

  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i).clone())
    val x = b.clone()
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r; r += 1 }
      if (m(piv)(col) == 0.0 || m(piv)(col).isNaN) return null
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val tb = x(col); x(col) = x(piv); x(piv) = tb
      r = col + 1
      while (r < n) {
        val f = m(r)(col) / m(col)(col)
        var c2 = col
        while (c2 < n) { m(r)(c2) -= f * m(col)(c2); c2 += 1 }
        x(r) -= f * x(col)
        r += 1
      }
      col += 1
    }
    val out = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = x(i)
      var j = i + 1
      while (j < n) { s -= m(i)(j) * out(j); j += 1 }
      out(i) = s / m(i)(i)
      i -= 1
    }
    out
  }
}
