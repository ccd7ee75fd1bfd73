package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kernels.PhaseCurve

/** SSOFT — the Solar System Object Fink Table batch build (reference:
  * ztf/ssoft/processor.py:674-887). The one batch-analytical product in
  * the reference: per-object phase-curve parameters from the
  * pre-aggregated light-curve table.
  *
  * Spark-first deviations from the reference (SURVEY.md §7.2 step 8):
  * the per-object result is a typed struct column — not a stringified
  * dict parsed back with pandas eval — and the final table stays a
  * DataFrame (collect left to the caller).
  *
  * Scale: the input is one row per object with array columns; the fit
  * is a per-row kernel (no shuffle at all after the scan), so the job
  * is embarrassingly parallel and bounded by fit cost; `nparts` controls
  * partition granularity like the reference's `4 x ncores` rule.
  */
object Ssoft {

  final case class BandFit(h: Double, h_err: Double, g: Double, g_err: Double,
      chi2red: Double, n_obs: Int, min_phase: Double, max_phase: Double)

  final case class SsoftParams(fit_g: BandFit, fit_r: BandFit,
      n_days: Double, n_measurements: Int, status: Int)

  /** Per-object astrometry + time-lapse summary
    * (ztf/ssoft/processor.py:645-671): moments of the observed-vs-
    * ephemerides angular separation (numpy/scipy conventions: population
    * std, biased skew, biased Fisher kurtosis) and per-filter day spans.
    */
  final case class AstroStats(mean_astrometry: Double, std_astrometry: Double,
      skew_astrometry: Double, kurt_astrometry: Double,
      n_days_1: Double, n_days_2: Double, last_jd: Double)

  def astroStats(raObs: Array[Double], decObs: Array[Double],
      raEph: Array[Double], decEph: Array[Double],
      cjd: Array[Double], cfid: Array[Int]): AstroStats = {
    val n = raObs.length
    val sep = new Array[Double](n)
    var i = 0
    while (i < n) {
      val dDec = math.toRadians(decEph(i) - decObs(i))
      val dRa = math.toRadians(raEph(i) - raObs(i))
      val a = math.sin(dDec / 2) * math.sin(dDec / 2) +
        math.cos(math.toRadians(decObs(i))) * math.cos(math.toRadians(decEph(i))) *
          math.sin(dRa / 2) * math.sin(dRa / 2)
      sep(i) = 2.0 * math.asin(math.min(1.0, math.sqrt(a))) *
        (180.0 / math.Pi) * 3600.0
      i += 1
    }
    val mean = sep.sum / n
    var m2 = 0.0; var m3 = 0.0; var m4 = 0.0
    i = 0
    while (i < n) {
      val d = sep(i) - mean
      m2 += d * d; m3 += d * d * d; m4 += d * d * d * d
      i += 1
    }
    m2 /= n; m3 /= n; m4 /= n
    val std = math.sqrt(m2)
    val skew = if (m2 > 0) m3 / math.pow(m2, 1.5) else 0.0
    val kurt = if (m2 > 0) m4 / (m2 * m2) - 3.0 else -3.0
    def span(b: Int): Double = {
      val t = cjd.indices.filter(cfid(_) == b).map(cjd)
      if (t.isEmpty) Double.NaN else t.max - t.min
    }
    AstroStats(mean, std, skew, kurt, span(1), span(2),
      if (cjd.isEmpty) Double.NaN else cjd.max)
  }

  /** Per-object HG fit per band over (phase, reduced mag). */
  def fitObject(cmagpsf: Array[Double], csigmapsf: Array[Double],
      cfid: Array[Int], cjd: Array[Double], phaseDeg: Array[Double],
      dobs: Array[Double], dhelio: Array[Double]): SsoftParams = {
    // reduced magnitude: m - 5 log10(Dobs * Dhelio)
    val mred = cmagpsf.indices.map(i =>
      cmagpsf(i) - 5.0 * math.log10(dobs(i) * dhelio(i))).toArray

    def band(b: Int): BandFit = {
      val sel = cfid.indices.filter(i => cfid(i) == b &&
        !cmagpsf(i).isNaN && !csigmapsf(i).isNaN && !phaseDeg(i).isNaN)
      if (sel.length < 3)
        return BandFit(Double.NaN, Double.NaN, Double.NaN, Double.NaN,
          Double.NaN, sel.length, Double.NaN, Double.NaN)
      val alpha = sel.map(i => math.toRadians(phaseDeg(i))).toArray
      val m = sel.map(mred).toArray
      val s = sel.map(csigmapsf).toArray
      val r = PhaseCurve.fitHG(alpha, m, s)
      BandFit(r.params(0), r.errors(0), r.params(1), r.errors(1),
        r.chi2red, sel.length,
        sel.map(phaseDeg).min, sel.map(phaseDeg).max)
    }

    val span = if (cjd.nonEmpty) cjd.max - cjd.min else Double.NaN
    SsoftParams(band(1), band(2), span, cmagpsf.length, 0)
  }

  final case class SpinFit(h_g: Double, h_r: Double, g1: Double, g2: Double,
      oblateness: Double, alpha0_deg: Double, delta0_deg: Double,
      chi2red: Double, n_obs: Int)

  /** Joint sHG1G2 spin fit across both bands (shared G1/G2/spin, per-band
    * H) over reduced magnitudes.
    */
  def fitSpin(cmagpsf: Array[Double], csigmapsf: Array[Double],
      cfid: Array[Int], phaseDeg: Array[Double], raDeg: Array[Double],
      decDeg: Array[Double], dobs: Array[Double], dhelio: Array[Double]): SpinFit = {
    val sel = cfid.indices.filter(i => (cfid(i) == 1 || cfid(i) == 2) &&
      !cmagpsf(i).isNaN && !csigmapsf(i).isNaN && !phaseDeg(i).isNaN)
    if (sel.length < 10)
      return SpinFit(Double.NaN, Double.NaN, Double.NaN, Double.NaN,
        Double.NaN, Double.NaN, Double.NaN, Double.NaN, sel.length)
    val mred = sel.map(i =>
      cmagpsf(i) - 5.0 * math.log10(dobs(i) * dhelio(i))).toArray
    val r = PhaseCurve.fitSHG1G2(
      sel.map(i => math.toRadians(phaseDeg(i))).toArray,
      sel.map(i => math.toRadians(raDeg(i))).toArray,
      sel.map(i => math.toRadians(decDeg(i))).toArray,
      sel.map(cfid).toArray, mred, sel.map(csigmapsf).toArray)
    SpinFit(r.params(0), r.params(1), r.params(2), r.params(3), r.params(4),
      math.toDegrees(r.params(5)), math.toDegrees(r.params(6)),
      r.chi2red, sel.length)
  }

  /** SHG1G2 variant of the table build: adds the joint spin fit. */
  def buildWithSpin(spark: SparkSession, aggregated: DataFrame,
      nmin: Int = 50): DataFrame = {
    val kernel = udf((cm: Seq[Double], cs: Seq[Double], cf: Seq[Int],
        phase: Seq[Double], ra: Seq[Double], dec: Seq[Double],
        dobs: Seq[Double], dhelio: Seq[Double]) => {
      def a(x: Seq[Double]): Array[Double] = if (x == null) Array.empty else x.toArray
      if (cm == null || cf == null || phase == null ||
        cm.size != phase.size || cm.size != cf.size)
        SpinFit(Double.NaN, Double.NaN, Double.NaN, Double.NaN,
          Double.NaN, Double.NaN, Double.NaN, Double.NaN, 0)
      else fitSpin(a(cm), a(cs), cf.toArray, a(phase),
        a(ra), a(dec), a(dobs), a(dhelio))
    })
    build(spark, aggregated, nmin)
      .join(aggregated.select(col("ssnamenr"),
        kernel(
          col("cmagpsf").cast("array<double>"), col("csigmapsf").cast("array<double>"),
          col("cfid").cast("array<int>"), col("Phase").cast("array<double>"),
          col("cra").cast("array<double>"), col("cdec").cast("array<double>"),
          col("Dobs").cast("array<double>"), col("Dhelio").cast("array<double>"))
          .as("spin")), "ssnamenr")
  }

  final case class SoccaFit(h_g: Double, h_r: Double,
      g1_1: Double, g1_2: Double, g2_1: Double, g2_2: Double,
      a_b: Double, a_c: Double, phi0: Double,
      alpha0: Double, delta0: Double, alpha0_alt: Double, delta0_alt: Double,
      period: Double, period_chi2red: Double,
      min_cos_lambda: Double, mean_cos_lambda: Double, max_cos_lambda: Double,
      err_a_b: Double, err_a_c: Double, err_phi0: Double,
      err_alpha0: Double, err_delta0: Double, err_period: Double,
      chi2red: Double, n_obs: Int)

  /** SOCCA fit for one object (ztf/ssoft/processor.py:525-607): light-
    * travel-corrected times, dxy astrometric-noise trim, residual
    * sigma-clip, then the period-blind 12-parameter ellipsoid fit
    * ([[PhaseCurve.fitSOCCA]] — published-math reconstruction of the
    * external asteroid_spinprops model; deviations documented there).
    * Cleaning stand-ins for fink_utils.sso.cleaning: `dxy_cleaning` =
    * drop points above the 0.95 dxy quantile; `iterative_cleaning` =
    * one MAD-based 5-sigma clip of sHG1G2 residuals (the reference's
    * loop iterates to convergence; one pass keeps the kernel
    * deterministic and bounded).
    */
  def fitSocca(cmagpsf: Array[Double], csigmapsf: Array[Double],
      cfid: Array[Int], cjd: Array[Double], phaseDeg: Array[Double],
      raDeg: Array[Double], decDeg: Array[Double],
      dobs: Array[Double], dhelio: Array[Double],
      dxyIn: Array[Double]): SoccaFit = {
    val nanFit = SoccaFit(Double.NaN, Double.NaN, Double.NaN, Double.NaN,
      Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
      Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
      Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
      Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
      Double.NaN, 0)
    // a null or short companion array (the UDF maps null -> empty)
    // must yield the NaN sentinel for THIS object, not an
    // ArrayIndexOutOfBounds that kills the whole job (r10 review)
    val n = cfid.length
    if (Seq(cmagpsf, csigmapsf, cjd, phaseDeg, raDeg, decDeg, dobs,
        dhelio).exists(_.length != n))
      return nanFit
    var sel = cfid.indices.filter(i => (cfid(i) == 1 || cfid(i) == 2) &&
      !cmagpsf(i).isNaN && !csigmapsf(i).isNaN && !phaseDeg(i).isNaN)
    if (sel.length < 14) return nanFit.copy(n_obs = sel.length)
    // dxy cleaning: drop the top-5% astrometric-noise points
    if (dxyIn.length == cfid.length) {
      val dxy = sel.map(dxyIn)
      val thr = dxy.sorted.apply((0.95 * (dxy.length - 1)).toInt)
      sel = sel.zip(dxy).filter(_._2 <= thr).map(_._1)
    }
    def mk(): (Array[Double], Array[Double], Array[Double], Array[Double],
        Array[Int], Array[Double], Array[Double]) = (
      sel.map(i => cmagpsf(i) - 5.0 * math.log10(dobs(i) * dhelio(i))).toArray,
      sel.map(csigmapsf).toArray,
      sel.map(i => math.toRadians(phaseDeg(i))).toArray,
      sel.map(i => math.toRadians(raDeg(i))).toArray,
      sel.map(cfid).toArray,
      sel.map(i => math.toRadians(decDeg(i))).toArray,
      sel.map(i => cjd(i) - dobs(i) / PhaseCurve.CAuPerDay).toArray)
    // residual sigma-clip against a base sHG1G2 fit
    locally {
      val (m, s, ph, ra, bd, dec, _) = mk()
      val base = PhaseCurve.fitSHG1G2(ph, ra, dec, bd, m, s)
      if (!base.chi2red.isNaN) {
        val res = m.indices.map { i =>
          val h = if (bd(i) == 1) base.params(0) else base.params(1)
          m(i) - PhaseCurve.shg1g2Mag(h, base.params(2), base.params(3),
            base.params(4), base.params(5), base.params(6), ph(i), ra(i), dec(i))
        }
        val sorted = res.sorted
        val med = sorted(sorted.length / 2)
        val mad = res.map(r => math.abs(r - med)).sorted.apply(res.length / 2)
        if (mad > 0) {
          val keep = res.indices.filter(i => math.abs(res(i) - med) <= 5.0 * 1.4826 * mad)
          if (keep.length >= 14) sel = keep.map(sel).toIndexedSeq
        }
      }
    }
    val (m, s, ph, ra, bd, dec, jdLt) = mk()
    val r = PhaseCurve.fitSOCCA(ph, ra, dec, bd, m, s, jdLt)
    if (r.result.chi2red.isNaN) return nanFit.copy(n_obs = sel.length)
    val p = r.result.params
    val e = r.result.errors
    val a0 = (math.toDegrees(p(9)) % 360.0 + 360.0) % 360.0
    val d0 = math.toDegrees(p(10))
    // the kernel parameterizes shape as (a_b, b/c); report COLUMNS_SOCCA
    // a_c = a_b * (b/c), error by first-order propagation
    val aC = p(6) * p(7)
    val errAC = math.sqrt(p(7) * p(7) * e(6) * e(6) + p(6) * p(6) * e(7) * e(7))
    val phi0 = ((p(8) % (2 * math.Pi)) + 2 * math.Pi) % (2 * math.Pi)
    SoccaFit(p(0), p(1), p(2), p(3), p(4), p(5), p(6), aC, phi0,
      a0, d0, (a0 + 180.0) % 360.0, -d0,
      r.periodH, r.result.chi2red,
      r.minCosL, r.meanCosL, r.maxCosL,
      e(6), errAC, e(8), math.toDegrees(e(9)), math.toDegrees(e(10)), e(11),
      r.result.chi2red, sel.length)
  }

  /** SOCCA variant of the table build (build_the_ssoft model='SOCCA'):
    * the base per-band table plus the period-blind spin-shape fit.
    * Synthesizes the cdx/cdy noise columns when absent, like the
    * reference's repair step.
    */
  def buildSocca(spark: SparkSession, aggregated: DataFrame,
      nmin: Int = 50): DataFrame = {
    val withNoise =
      if (aggregated.columns.contains("cdx")) aggregated
      else withNoiseColumns(aggregated)
    val kernel = udf((cm: Seq[Double], cs: Seq[Double], cf: Seq[Int],
        cjd: Seq[Double], phase: Seq[Double], ra: Seq[Double],
        dec: Seq[Double], dobs: Seq[Double], dhelio: Seq[Double],
        dxy: Seq[Double]) => {
      def a(x: Seq[Double]): Array[Double] = if (x == null) Array.empty else x.toArray
      if (cm == null || cf == null || phase == null ||
        cm.size != phase.size || cm.size != cf.size)
        fitSocca(Array.empty, Array.empty, Array.empty, Array.empty,
          Array.empty, Array.empty, Array.empty, Array.empty, Array.empty,
          Array.empty)
      else fitSocca(a(cm), a(cs), cf.toArray, a(cjd), a(phase),
        a(ra), a(dec), a(dobs), a(dhelio), a(dxy))
    })
    // dxy collapses to one array column up front (a UDF takes at most
    // 10 args, and the kernel only ever uses the quadrature sum).
    // Pre-filter with the SAME size gates as the base build: the
    // multi-start SOCCA kernel is the most expensive fit in the repo,
    // and the inner join below would discard sub-nmin results anyway
    val withDxy = withNoise
      .filter(size(col("cra")) >= nmin)
      .filter(size(col("Phase")) >= nmin)
      .filter(size(col("cmagpsf")) === size(col("Phase")))
      .withColumn("socca_dxy",
        zip_with(col("cdx").cast("array<double>"),
          col("cdy").cast("array<double>"),
          (x, y) => sqrt(x * x + y * y)))
    build(spark, withNoise, nmin)
      .join(withDxy.select(col("ssnamenr"),
        kernel(
          col("cmagpsf").cast("array<double>"), col("csigmapsf").cast("array<double>"),
          col("cfid").cast("array<int>"), col("cjd").cast("array<double>"),
          col("Phase").cast("array<double>"),
          col("cra").cast("array<double>"), col("cdec").cast("array<double>"),
          col("Dobs").cast("array<double>"), col("Dhelio").cast("array<double>"),
          col("socca_dxy")).as("socca")), "ssnamenr")
  }

  /** Missing-column repair: per-measurement Gaussian noise arrays
    * (`cdx`/`cdy`) — reference: ztf/ssoft/processor.py:819-825, a seeded
    * randn pandas UDF there. Here the noise is a deterministic function
    * of (object name, index, seed) via Box-Muller over a splitmix hash,
    * so results are independent of partitioning (Spark's randn(seed)
    * depends on row position within a partition).
    */
  def withNoiseColumns(df: DataFrame, seed: Long = 3L): DataFrame = {
    val noise = udf((name: String, n: Int) => {
      val rng = new java.util.Random(name.hashCode.toLong * 0x9e3779b97f4a7c15L ^ seed)
      Array.fill(n)(rng.nextGaussian())
    })
    df.withColumn("cdx", noise(col("ssnamenr"), size(col("cra"))))
      .withColumn("cdy", noise(concat(col("ssnamenr"), lit("#y")), size(col("cra"))))
  }

  /** Build the flat table. Mirrors the reference driver:
    * size filters (>= nmin measurements, consistent arrays), optional
    * sampling, repartition + cache, per-object fit, typed select.
    */
  def build(spark: SparkSession, aggregated: DataFrame, nmin: Int = 50,
      nparts: Int = 0, sampleFraction: Double = 1.0): DataFrame = {
    import spark.implicits._

    var df = aggregated
      .filter(size(col("cra")) >= nmin)
      .filter(size(col("Phase")) >= nmin)
      .filter(size(col("cmagpsf")) === size(col("Phase")))
    if (sampleFraction < 1.0) df = df.sample(sampleFraction, seed = 0L)
    if (nparts > 0) df = df.repartition(nparts)
    df = df.cache()

    val kernel = udf((cm: Seq[Double], cs: Seq[Double], cf: Seq[Int],
        cjd: Seq[Double], phase: Seq[Double], dobs: Seq[Double],
        dhelio: Seq[Double]) =>
      fitObject(cm.toArray, cs.toArray, cf.toArray, cjd.toArray,
        phase.toArray, dobs.toArray, dhelio.toArray))

    val astro = udf((ra: Seq[Double], dec: Seq[Double], raE: Seq[Double],
        decE: Seq[Double], cjd: Seq[Double], cf: Seq[Int]) =>
      astroStats(ra.toArray, dec.toArray, raE.toArray, decE.toArray,
        cjd.toArray, cf.toArray))

    df.withColumn("ssoft", kernel(
      col("cmagpsf").cast("array<double>"), col("csigmapsf").cast("array<double>"),
      col("cfid").cast("array<int>"), col("cjd").cast("array<double>"),
      col("Phase").cast("array<double>"), col("Dobs").cast("array<double>"),
      col("Dhelio").cast("array<double>")))
      .withColumn("astro", astro(
        col("cra").cast("array<double>"), col("cdec").cast("array<double>"),
        col("RA").cast("array<double>"), col("DEC").cast("array<double>"),
        col("cjd").cast("array<double>"), col("cfid").cast("array<int>")))
      .select(col("ssnamenr"), col("ssoft.*"), col("astro.*"))
  }
}
