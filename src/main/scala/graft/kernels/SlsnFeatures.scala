package graft.kernels

/** Feature assembly for the ZTF superluminous-SN classifier — the
  * 27-feature vector the bundled XGBoost model was trained on
  * (feature_names embedded in superluminous_classifier.joblib;
  * pipeline: ztf/superluminous/slsn_classifier.py extract_features +
  * statistical_features + fit_rainbow + fit_salt, constants from
  * ztf/superluminous/kernel.py).
  *
  * Exact here: SNANA flux conversion, g/r band cut, validity gates
  * (>= 3 points per band, > 7 total, > 30 d span), the statistical
  * features (amplitude/max-slope/skew/std/q15/q85 over flux), and the
  * bazin-rainbow parameterization. Documented stand-ins: the salt2
  * template fit (sncosmo's SALT2 surfaces are an external artifact) and
  * the SFD E(B-V) dust map — both injectable; defaults keep rows
  * scoreable and deterministic.
  */
object SlsnFeatures {

  /** kernel.py:22-28. */
  val BandWaveAA: Map[Int, Double] = Map(1 -> 4770.0, 2 -> 6231.0)
  val MinPointsTotal = 7
  val MinPointsPerBand = 3
  val MinDuration = 30.0

  /** SNANA FLUXCAL from magnitude (fink_utils mag2fluxcal_snana:
    * 10^((27.5 - m)/2.5); err = sigma * flux * ln(10)/2.5).
    */
  def fluxCal(m: Double): Double = math.pow(10.0, (27.5 - m) / 2.5)
  def fluxCalErr(m: Double, sigma: Double): Double =
    fluxCal(m) * sigma * math.log(10.0) / 2.5

  /** np.quantile linear interpolation. */
  def quantile(sorted: Array[Double], q: Double): Double = {
    val n = sorted.length
    if (n == 0) return Double.NaN
    val pos = q * (n - 1)
    val lo = pos.toInt
    val hi = math.min(lo + 1, n - 1)
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  /** Unbiased sample skewness (light-curve's Skew; pandas .skew()):
    * n/((n-1)(n-2)) * sum(((x-mean)/s)^3), s the ddof=1 std.
    */
  def skew(x: Array[Double]): Double = {
    val n = x.length
    if (n < 3) return Double.NaN
    val mean = x.sum / n
    val s2 = x.map(v => (v - mean) * (v - mean)).sum / (n - 1)
    val s = math.sqrt(s2)
    if (s == 0) return Double.NaN
    val m3 = x.map(v => math.pow((v - mean) / s, 3)).sum
    n.toDouble / ((n - 1.0) * (n - 2.0)) * m3
  }

  /** Flux-domain statistics over a TIME-SORTED series:
    * (flux_amplitude, max_slope, skew, std_flux, q15, q85) — the
    * statistical_features block (slsn_classifier.py:522-568; golden
    * doctest values pinned in SlsnGoldenSpec).
    */
  def fluxStats(t: Array[Double], flux: Array[Double])
      : (Double, Double, Double, Double, Double, Double) = {
    val n = t.length
    val fluxMax = flux.max
    val amplitude = (fluxMax - flux.min) / 2.0
    var maxSlope = 0.0
    var i = 1
    while (i < n) {
      val dt = t(i) - t(i - 1)
      if (dt != 0) {
        val s = math.abs((flux(i) - flux(i - 1)) / dt)
        if (s > maxSlope) maxSlope = s
      }
      i += 1
    }
    val normed = flux.map(_ / fluxMax)
    val meanN = normed.sum / n
    val stdFlux = math.sqrt(normed.map(v => (v - meanN) * (v - meanN)).sum / n)
    val shifted = t.map(_ - t.head)
    (amplitude, maxSlope, skew(flux), stdFlux,
      quantile(shifted, 0.15), quantile(shifted, 0.85))
  }

  /** The 27 features keyed by the model's embedded feature names.
    * None when the reference's validity gates fail (its feature frame
    * goes NaN and the alert keeps the -1 sentinel).
    *
    * Inputs are the alert's concatenated history (any order); NaN
    * photometry must already be dropped by the caller.
    */
  def features(jd: Array[Double], fid: Array[Int], mag: Array[Double],
      sigma: Array[Double], distnr: Double, ebv: Double = 0.0,
      salt: (Double, Double, Double, Double, Double) = DefaultSalt)
      : Option[Map[String, Double]] = {
    // remove_bad_bands: keep g (1) and r (2) only
    val keep = fid.indices.filter(i => BandWaveAA.contains(fid(i)))
    val n = keep.length
    val perBandOk = BandWaveAA.keys.forall(b =>
      keep.count(fid(_) == b) >= MinPointsPerBand)
    if (!perBandOk || n <= MinPointsTotal) return None
    val order = keep.sortBy(jd)
    val t = order.map(jd).toArray
    val duration = t.last - t.head
    if (!(duration > MinDuration)) return None

    val flux = order.map(i => fluxCal(mag(i))).toArray
    val ferr = order.map(i => fluxCalErr(mag(i), sigma(i))).toArray
    val bands = order.map(fid(_).toDouble).toArray

    // fit_rainbow shifts time to the flux peak before fitting
    val iPeak = flux.indices.maxBy(flux)
    val ts = t.map(_ - t(iPeak))
    val rainbow = RainbowFit.fitBazin(ts, bands, flux, ferr, BandWaveAA)
    val p = rainbow.params; val e = rainbow.errors

    // statistical_features (flux-domain)
    val (amplitude, maxSlope, skewV, stdFlux, q15, q85) = fluxStats(t, flux)

    val (z, x0, x1, c, chi2Salt) = salt
    Some(Map(
      "amplitude" -> p(1), "rise_time" -> p(2), "fall_time" -> p(3),
      "Tmin" -> p(4), "Tmax" -> p(5), "t_color" -> p(6),
      "chi2_rainbow" -> rainbow.reducedChi2,
      "snr_amplitude" -> p(1) / e(1), "snr_rise_time" -> p(2) / e(2),
      "snr_fall_time" -> p(3) / e(3), "snr_Tmin" -> p(4) / e(4),
      "snr_Tmax" -> p(5) / e(5), "snr_t_color" -> p(6) / e(6),
      "max_slope" -> maxSlope,
      "z" -> z, "x0" -> x0, "x1" -> x1, "c" -> c, "chi2_salt" -> chi2Salt,
      "flux_amplitude" -> amplitude, "skew" -> skewV,
      "distnr" -> distnr, "duration" -> duration,
      "std_flux" -> stdFlux, "q15" -> q15, "q85" -> q85,
      "ebv" -> ebv))
  }

  /** Neutral salt2 stand-in (z, x0, x1, c, chi2) — the template fit
    * needs sncosmo's external SALT2 surfaces; zeros are deterministic
    * and keep rows scoreable (the reference's NaN would sentinel them).
    *
    * Terminal status (r12): these two stand-ins are ARTIFACT-DATA
    * gaps, not machinery gaps, and cannot be closed offline. The SFD
    * E(B-V) map is a measured all-sky dust survey (a data product;
    * there is no formula to reconstruct it from) and the SALT2 M0/M1/
    * CL surfaces are trained template data files distributed by
    * sncosmo — the same class as the CI-fetched classifier joblibs.
    * Everything COMPUTED around them is implemented and pinned on the
    * reference's own doctests: F99 extinction, abs_peak's LambdaCDM
    * luminosity distance, and the photo-z veto (kernels.SlsnPhotoz),
    * with both values injectable per row (`ebv`, `salt`) so supplying
    * the public artifacts requires no code change.
    */
  val DefaultSalt: (Double, Double, Double, Double, Double) =
    (0.0, 0.0, 0.0, 0.0, 0.0)
}
