package graft.kernels

/** The 47-statistic feature vector consumed by the microlensing RF
  * (ztf/microlensing/classifier.py:25-43 `_extract` →
  * `LIA.extract_features.extract_all(mag, magerr, convert=True)`).
  *
  * The LIA package itself is external (Godines et al. 2019, A&C 25,
  * 100298), so these are a documented best-effort reconstruction of its
  * published statistic set, NOT a line-for-line port. Four
  * cross-checks anchor it against the bundled artifacts:
  *
  *  - the bundled pca.sav carries the training means of all 47 features
  *    in order; the reconstruction below reproduces their scales
  *    (counts at indices 0-2/7-9, fractions at 11-15/21-22, signed
  *    near-zeros at 28-29/45, magnitude-scale values at 44, raw-flux
  *    scale at 5/41/43);
  *  - the bundled rf.sav (n_features_=47) never splits on indices 9,
  *    17, 18 — exactly the three features whose training means are 0
  *    (below5/con/con2), confirming the index assignment;
  *  - the conversion convention (flux = 10^((24-mag)/2.5)) reproduces
  *    the raw-flux feature scales in pca.mean_;
  *  - LIVENESS (r6, LiaForestRangeSpec): over a diverse synthetic
  *    ensemble, every one of the 44 features the forest splits on
  *    produces values that CROSS the forest's split-threshold range
  *    for its index — a wrong scale, sign or normalization would park
  *    the feature on one side of every threshold (a dead input), so
  *    each reconstruction is confirmed live against the real model's
  *    decision surface, not just against training-mean scales.
  *
  * Per-feature confidence, in three tiers:
  *  - CANONICAL (definition fixed by the statistic's standard form;
  *    only convention risk): abs_energy(3), abs_sum_changes(4),
  *    amplitude(5), autocorr(6), c3(10), complexity/CID(16),
  *    count_above/below mean(19-20), integrate(23), kurtosis(24),
  *    longest strikes(25-26), mean_(abs_)change(27-28),
  *    mean_second_derivative(29), medianAbsDev(30), RMS(35),
  *    skewness(38), std_over_mean(39), stetson J/K(41-42),
  *    sum_values(43), meanMag(44), trend(45), vonNeumann(46).
  *  - PARAMETER-PINNED (canonical shape, threshold/index convention
  *    validated by the artifact checks above): above/below k-sigma
  *    counts(0-2,7-9), duplicate-value binaries(11-13),
  *    first/last argmin-max locations(14-15,21-22), con/con2(17-18),
  *    ratio_recurring(34), half_mag_amplitude_ratio(40).
  *  - ANCHOR-ADOPTED (r7, tools/LiaAnchors: candidate definitions
  *    discriminated against rf.sav's split-threshold distribution —
  *    CART thresholds sit at midpoints of training values, so their
  *    quantiles sketch the training marginal — plus pca.sav's
  *    training means): median_buffer_range(31) = fraction within
  *    amplitude/10 of the median (also the statistic's
  *    literature-canonical form, Richards et al. 2011);
  *    median_distance(32) = MAG-domain Euclidean step distance (the
  *    flux-domain variant cannot reach the threshold mass at
  *    0.31-0.47); peak_detection(33) = peakutils-style half-range
  *    local-max count with min_dist=25 (thresholds are exactly
  *    {0.5, 1.5, 2.5} — an integer count in 0..3, training mean 1.44);
  *    sample_entropy(36) = SampEn(m=1, r=0.15*std) on the MAGNITUDE
  *    series (r9 sweep over domain x template x tolerance: matches the
  *    threshold median to 5% and the p25/p50/p75 ladder far better
  *    than the r7 flux-domain (2, 0.2*std) choice — see the inline
  *    rationale).
  *  - RECONSTRUCTED (LIA-specific parameterization not recoverable
  *    offline; liveness-confirmed, anchor-shape-compatible, not
  *    value-pinned): shannon_entropy(37) — PER-POINT error-CDF
  *    surprisal (the r6 histogram form was artifact-REFUTED in r7:
  *    bounded by 1 against training thresholds reaching 4.81; the r7
  *    unnormalized sum was artifact-REFUTED in r9: training-like
  *    ensemble mean ~144 against the 0.474 training mean in
  *    pca.mean_).
  *
  * Scoring therefore runs the REAL bundled forest over a vector whose
  * layout and per-index liveness are artifact-confirmed; the
  * RECONSTRUCTED tier — now down to shannon_entropy(37) alone — is
  * why the operator still surfaces `mulens_features_approx`.
  *
  * TERMINAL (r13): the f37 adjudication is CLOSED at family
  * precision. After the r7-r12 sweeps refuted every competing family
  * (60+ parameterizations: histogram, CDF mass, surprisal ladders,
  * double-CDF, outlier-gated, binary, Vasicek m-spacing, fixed-bin
  * bit entropy, uniform/paired window mass, RMS scale), the r13
  * closing sweep measured the anchors' remaining discriminating power
  * WITHIN the adopted per-point Gaussian-surprisal family — and found
  * none: every k/log-base/domain variant passes every binding anchor
  * gate (LiaAnchorSpec "f37 TERMINAL"). rf.sav's thresholds and
  * pca.sav's means cannot separate the remaining parameterizations,
  * so value-level reconstruction is structurally unreachable offline;
  * the adopted (mag, k=2, log2, per-point) form is final, and
  * `mulens_features_approx` remains the honest surface. No further
  * sweeps unless a new artifact ships.
  */
object LiaFeatures {

  val Count = 47

  /** Feature vector from one band's DC-magnitude light curve. */
  def extractAll(mag: Array[Double], magerr: Array[Double]): Array[Double] = {
    val n = mag.length
    val zp = 24.0
    val flux = mag.map(m => math.pow(10.0, (zp - m) / 2.5))
    val fluxErr = mag.indices.map(i =>
      magerr(i) * flux(i) * math.log(10.0) / 2.5).toArray
    val fmax = flux.max
    val nf = flux.map(_ / fmax)
    val ne = fluxErr.map(_ / fmax)

    val mean = nf.sum / n
    val std = math.sqrt(nf.map(x => (x - mean) * (x - mean)).sum / n)
    val med = median(nf)

    def countAbove(k: Double) = nf.count(_ > mean + k * std).toDouble
    def countBelow(k: Double) = nf.count(_ < mean - k * std).toDouble

    val diffs = Array.tabulate(n - 1)(i => nf(i + 1) - nf(i))

    // lag-1 autocorrelation
    val denom = nf.map(x => (x - mean) * (x - mean)).sum
    val autoCorr =
      if (denom == 0) 0.0
      else (0 until n - 1).map(i => (nf(i) - mean) * (nf(i + 1) - mean)).sum / denom

    val c3 =
      if (n < 3) 0.0
      else (0 until n - 2).map(i => nf(i) * nf(i + 1) * nf(i + 2)).sum / (n - 2)

    val counts = nf.groupBy(identity).map { case (_, v) => v.length }
    val hasDup = if (counts.exists(_ > 1)) 1.0 else 0.0
    val maxDup = if (nf.count(_ == nf.max) > 1) 1.0 else 0.0
    val minDup = if (nf.count(_ == nf.min) > 1) 1.0 else 0.0

    val argmax = nf.indexOf(nf.max)
    val argmin = nf.indexOf(nf.min)
    val lastArgmax = nf.lastIndexOf(nf.max)
    val lastArgmin = nf.lastIndexOf(nf.min)

    val complexity = math.sqrt(diffs.map(d => d * d).sum)

    // con / con2: fraction of runs of >=3 (resp >=2) consecutive points
    // beyond 2 std from the mean
    def conRuns(minRun: Int): Double = {
      var runs = 0; var run = 0
      var i = 0
      while (i < n) {
        if (math.abs(nf(i) - mean) > 2 * std) { run += 1 }
        else { if (run >= minRun) runs += 1; run = 0 }
        i += 1
      }
      if (run >= minRun) runs += 1
      runs.toDouble / n
    }

    def longestStrike(above: Boolean): Double = {
      var best = 0; var run = 0
      var i = 0
      while (i < n) {
        val hit = if (above) nf(i) > mean else nf(i) < mean
        if (hit) { run += 1; if (run > best) best = run } else run = 0
        i += 1
      }
      best.toDouble
    }

    val integrate = (0 until n - 1).map(i => (nf(i) + nf(i + 1)) / 2).sum

    val m2 = nf.map(x => math.pow(x - mean, 2)).sum / n
    val m3 = nf.map(x => math.pow(x - mean, 3)).sum / n
    val m4 = nf.map(x => math.pow(x - mean, 4)).sum / n
    val kurtosis = if (m2 == 0) 0.0 else m4 / (m2 * m2) - 3.0
    val skewness = if (m2 == 0) 0.0 else m3 / math.pow(m2, 1.5)

    val meanAbsChange = diffs.map(math.abs).sum / math.max(1, n - 1)
    val meanChange = diffs.sum / math.max(1, n - 1)
    val meanSecondDeriv =
      if (n < 3) 0.0
      else (0 until n - 2).map(i => (nf(i + 2) - 2 * nf(i + 1) + nf(i)) / 2.0)
        .sum / (n - 2)

    val mad = median(nf.map(x => math.abs(x - med)))
    // fraction within amplitude/10 of the median (Richards et al. 2011
    // "medianBRP", the statistic's literature-canonical form; anchor
    // check r7: ensemble mean 0.50 vs the 0.446 training mean in
    // pca.sav, thresholds straddled — tools/LiaAnchors)
    val medianBufferRange = {
      val amp10 = (nf.max - nf.min) / 20.0
      nf.count(x => math.abs(x - med) < amp10).toDouble / n
    }
    // MAGNITUDE-domain Euclidean step distance: the rf.sav threshold
    // quantiles for this index ([0.0135, 0.473], quartile mass at
    // 0.31-0.47) are routine for mag/magerr steps and unreachable for
    // the normalized-flux variant (ensemble p90 0.11) — anchor-adopted
    // r7 (tools/LiaAnchors; ensemble mean 0.16 vs training mean 0.142)
    val medianDistance =
      if (n < 2) 0.0
      else median(Array.tabulate(n - 1)(i =>
        math.sqrt(math.pow(mag(i + 1) - mag(i), 2) +
          math.pow(magerr(i + 1) - magerr(i), 2))))

    // peakutils.indexes-style count on |nf - median|: strict local
    // maxima above half the range, greedy min_dist=25 suppression.
    // Anchor-adopted r7: rf.sav splits this index ONLY at
    // {0.5, 1.5, 2.5} (an integer count in 0..3) with training mean
    // 1.44; this definition's ensemble mean is 1.60 with range 0-3,
    // while the previous mean+sigma local-max count sat at 5.2
    val peaks = {
      val y = nf.map(x => math.abs(x - med))
      peakCount(y, 0.5, 25).toDouble
    }

    val recurring = counts.count(_ > 1).toDouble
    val ratioRecurring = if (counts.isEmpty) 0.0 else recurring / counts.size

    val rms = math.sqrt(nf.map(x => x * x).sum / n)

    // ANCHOR-ADOPTED (r9, tools/LiaAnchors sweep): SampEn(m=1,
    // r=0.15*std) on the MAGNITUDE series. The r7 choice —
    // SampEn(2, 0.2*std) on normalized flux — put 76-79% of the
    // training-like ensemble's mass below the p25..p50 split
    // thresholds (ideal 25%/50%); the (m=1, 0.15*std, mag)
    // parameterization sits at 45%/52%/73% against the p25/p50/p75
    // thresholds (ideal 25/50/75), matches the threshold median
    // almost exactly (ensemble p50 0.88 vs threshold p50 0.92), and
    // closes most of the training-mean gap (ensemble mean 1.16 vs
    // pca.mean 1.49, from 0.66). Stable under ensemble reseeding.
    val sampEnMag = {
      val mMn0 = mag.sum / n
      val mSd0 = math.sqrt(mag.map(x => (x - mMn0) * (x - mMn0)).sum / n)
      sampleEntropy(mag, 1, 0.15 * mSd0)
    }

    // error-CDF surprisal (mag domain), PER-POINT: -sum log2(p_i)/n
    // with p_i the Gaussian(mean, std) mass inside the point's DOUBLED
    // error bar. Near 0 when every error bar covers the sample spread
    // (a Gaussian-consistent source with conservative errors); grows
    // on structured excursions. The r6 histogram definition was
    // REFUTED in r7 (bounded by 1 against thresholds reaching 4.81);
    // the r7 UNNORMALIZED sum is REFUTED in r9 by the training-mean
    // anchor: its training-like ensemble mean is ~144 against
    // pca.mean_ = 0.474 (a 300x gap, reseed-stable — tools/LiaAnchors
    // r9 sweep), because every structured curve accumulates tens of
    // bits per excursion point. The per-point mean keeps the
    // near-zero-mass/tail shape that adopted the family (consistent
    // curves ~0.0x, structured curves cross every threshold up to
    // 4.81) while landing the ensemble mean at 2.6 — the closest of
    // the 26 swept parameterizations.
    //
    // r10 sweep (three NEW families, all artifact-refuted, so the
    // per-point form stands as the only all-anchor-compatible one):
    //  - per-point BINARY entropy (mag, k=2, /n) lands the training
    //    mean almost exactly (0.467 vs 0.474) but is bounded by 1
    //    against thresholds reaching 4.81 — killed by the same tail
    //    test as the r6 histogram;
    //  - Vasicek m-spacing differential entropy is negative over most
    //    curves against a strictly POSITIVE threshold ladder
    //    (0.0008..4.81) — support mismatch;
    //  - OUTLIER-GATED surprisal (only p_i < p0 contribute) produces
    //    the exact zeros the p50=0.008 threshold hints at, but goes
    //    bimodal: nothing lands in the 0.008-0.23 band that carries
    //    60% of the threshold mass (frac<p50 0.13-0.22 vs ideal 0.50,
    //    reseed-stable).
    // r12 sweep closed the last unexplored axes of the cited SIDRA
    // method (Mislis et al. 2015 score each point under BOTH a
    // Gaussian and a uniform model; LIA's own scale helper is an
    // uncentered RMS) — all artifact-refuted (LiaAnchorSpec pins):
    //  - UNIFORM window mass (|window ∩ range| / range), alone and
    //    summed with the Gaussian term, leaves the 0.008 p50
    //    threshold band nearly empty (frac<p50 ≤ 0.06 at every
    //    domain/k/normalization vs the ~0.50 a correct definition
    //    must show);
    //  - RMS-scaled z-scores inflate every curve's surprisal (mag
    //    RMS ≈ |mean mag| >> centered std): ensemble p10 ≥ 2.6
    //    against a threshold p75 of 0.23 — no overlap at all.
    // TERMINAL for the swept space: across r7-r12, 60+
    // parameterizations over every family the LIA source, its cited
    // method, and its helpers suggest (histogram, CDF mass, surprisal
    // ladders, double-CDF, outlier-gated, binary, Vasicek m-spacing,
    // fixed-bin bit entropy, uniform/paired window mass, RMS scale),
    // the adopted per-point Gaussian surprisal remains the ONLY
    // all-anchor-compatible form. Family-level reconstruction; still
    // surfaced via mulens_features_approx.
    val shannon = {
      val mMn = mag.sum / n
      val mSd = math.sqrt(mag.map(x => (x - mMn) * (x - mMn)).sum / n)
      if (mSd == 0) 0.0
      else {
        var s = 0.0
        var i = 0
        while (i < n) {
          val p = normCdf((mag(i) + 2 * magerr(i) - mMn) / mSd) -
            normCdf((mag(i) - 2 * magerr(i) - mMn) / mSd)
          s -= math.log(math.max(p, 1e-12)) / math.log(2.0)
          i += 1
        }
        s / n
      }
    }

    val stdOverMean = if (mean == 0) 0.0 else std / mean

    // magnitude-domain statistics
    val mMean = mag.sum / n
    val mMed = median(mag)
    val above = mag.filter(_ > mMed)
    val below = mag.filter(_ <= mMed)
    def rmsDev(xs: Array[Double]) =
      if (xs.isEmpty) 0.0
      else math.sqrt(xs.map(x => (x - mMed) * (x - mMed)).sum / xs.length)
    val halfAmpRatio = {
      val b = rmsDev(below)
      if (b == 0) 0.0 else rmsDev(above) / b
    }
    val trend = {
      // OLS slope of magnitude against sample index
      val xm = (n - 1) / 2.0
      val sxx = (0 until n).map(i => (i - xm) * (i - xm)).sum
      if (sxx == 0) 0.0
      else (0 until n).map(i => (i - xm) * (mag(i) - mMean)).sum / sxx
    }
    val vonNeumann = {
      val varM = mag.map(x => (x - mMean) * (x - mMean)).sum / (n - 1)
      if (varM == 0 || n < 2) 0.0
      else (0 until n - 1).map(i =>
        (mag(i + 1) - mag(i)) * (mag(i + 1) - mag(i))).sum / ((n - 1) * varM)
    }

    // Stetson J/K on the raw flux with errors
    val fMean = flux.sum / n
    val delta = flux.indices.map(i =>
      math.sqrt(n.toDouble / (n - 1)) * (flux(i) - fMean) /
        (if (fluxErr(i) > 0) fluxErr(i) else 1.0)).toArray
    val stetsonJ = (0 until n - 1).map { i =>
      val p = delta(i) * delta(i + 1)
      math.signum(p) * math.sqrt(math.abs(p))
    }.sum
    val stetsonK = {
      val sAbs = delta.map(math.abs).sum / n
      val sSq = math.sqrt(delta.map(d => d * d).sum / n)
      if (sSq == 0) 0.0 else sAbs / sSq
    }

    Array(
      countAbove(1), countAbove(3), countAbove(5), // 0-2 above1/3/5
      nf.map(x => x * x).sum, // 3 abs_energy
      diffs.map(math.abs).sum, // 4 abs_sum_changes
      (flux.max - flux.min) / 2.0, // 5 amplitude (raw flux)
      autoCorr, // 6
      countBelow(1), countBelow(3), countBelow(5), // 7-9 below1/3/5
      c3, // 10
      hasDup, maxDup, minDup, // 11-13
      (n - 1 - lastArgmax).toDouble / n, // 14 check_max_last_loc
      (n - 1 - lastArgmin).toDouble / n, // 15 check_min_last_loc
      complexity, // 16
      conRuns(3), conRuns(2), // 17-18 con/con2
      nf.count(_ > mean).toDouble, // 19 count_above
      nf.count(_ < mean).toDouble, // 20 count_below
      argmax.toDouble / n, // 21 first_loc_max
      argmin.toDouble / n, // 22 first_loc_min
      integrate, // 23
      kurtosis, // 24
      longestStrike(true), longestStrike(false), // 25-26
      meanAbsChange, meanChange, meanSecondDeriv, // 27-29
      mad, // 30 medianAbsDev
      medianBufferRange, // 31
      medianDistance, // 32
      peaks, // 33 peak_detection
      ratioRecurring, // 34
      rms, // 35 root_mean_squared
      sampEnMag, // 36
      shannon, // 37
      skewness, // 38
      stdOverMean, // 39
      halfAmpRatio, // 40 half_mag_amplitude_ratio (mag domain)
      stetsonJ, stetsonK, // 41-42 (raw flux)
      flux.sum, // 43 sum_values (raw flux)
      mMean, // 44 meanMag
      trend, // 45 (mag slope vs index)
      vonNeumann) // 46 (mag domain)
  }

  /** peakutils.indexes-style peak count: strict local maxima of y
    * above thres*(ymax-ymin)+ymin, then greedy suppression keeping
    * the highest peak within each minDist window.
    */
  private def peakCount(y: Array[Double], thres: Double, minDist: Int): Int = {
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

  /** Standard normal CDF via Abramowitz-Stegun 7.1.26 (|eps| < 1.5e-7). */
  private def normCdf(z: Double): Double = {
    val x = z / math.sqrt(2.0)
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) *
      t - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    0.5 * (1.0 + (if (x >= 0) y else -y))
  }

  private def median(xs: Array[Double]): Double = {
    if (xs.isEmpty) return 0.0
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** SampEn(m, r): -ln(A/B) with Chebyshev distance; 0 on degenerate
    * inputs (constant series or too few points).
    */
  private def sampleEntropy(x: Array[Double], m: Int, r: Double): Double = {
    val n = x.length
    if (n <= m + 1 || r <= 0) return 0.0
    def count(len: Int): Long = {
      var c = 0L
      var i = 0
      while (i < n - len) {
        var j = i + 1
        while (j < n - len) {
          var k = 0
          var ok = true
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
    val b = count(m)
    val a = count(m + 1)
    if (a == 0 || b == 0) 0.0 else -math.log(a.toDouble / b)
  }
}
