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
  *  - RECONSTRUCTED (LIA-specific parameterization not recoverable
  *    offline — binning/radius/entropy parameters are plausible
  *    choices, liveness-confirmed but not value-pinned):
  *    median_buffer_range(31), median_distance(32),
  *    peak_detection(33), sample_entropy(36), shannon_entropy(37).
  *
  * Scoring therefore runs the REAL bundled forest over a vector whose
  * layout and per-index liveness are artifact-confirmed; the
  * RECONSTRUCTED tier is why the operator still surfaces
  * `mulens_features_approx`.
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
    val sorted = nf.sorted

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
    val medianBufferRange = nf.count(x => math.abs(x - med) < 0.1 * med).toDouble / n
    val medianDistance = median(Array.tabulate(n - 1)(i =>
      math.sqrt(diffs(i) * diffs(i) +
        (ne(i + 1) - ne(i)) * (ne(i + 1) - ne(i)))))

    val peaks = (1 until n - 1).count(i =>
      nf(i) > nf(i - 1) && nf(i) > nf(i + 1) && nf(i) > mean + std).toDouble

    val recurring = counts.count(_ > 1).toDouble
    val ratioRecurring = if (counts.isEmpty) 0.0 else recurring / counts.size

    val rms = math.sqrt(nf.map(x => x * x).sum / n)

    val sampEn = sampleEntropy(nf, 2, 0.2 * std)

    // normalized histogram Shannon entropy (10 bins over the range)
    val shannon = {
      val lo = sorted.head; val hi = sorted.last
      if (hi == lo) 0.0
      else {
        val bins = new Array[Int](10)
        nf.foreach { x =>
          val b = math.min(9, ((x - lo) / (hi - lo) * 10).toInt)
          bins(b) += 1
        }
        -bins.filter(_ > 0).map { c =>
          val p = c.toDouble / n
          p * math.log(p)
        }.sum / math.log(10.0)
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
      sampEn, // 36
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
