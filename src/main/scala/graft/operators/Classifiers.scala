package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kernels.{FastTransientKernel, LightCurveFeatures, SigmoidFit}
import graft.models.{AnomalyModels, RefModels, Scorer, StubModels}

/** Classifier score modules (SURVEY.md §2.3): native selection gates +
  * JVM feature kernels + injected [[graft.models.Scorer]]s. Model
  * *parameters* default to deterministic stand-ins (see StubModels);
  * every other stage — gates, feature extraction, sentinel semantics,
  * column contracts — follows the reference modules.
  */
object Classifiers {

  private def arr(xs: Seq[java.lang.Double]): Array[Double] =
    if (xs == null) Array.empty
    else xs.map(x => if (x == null) Double.NaN else x.doubleValue()).toArray

  /** Per-band (g,r) sigmoid-rise features in flux space; 12 doubles. */
  def sniaFeatures(cjd: Array[Double], cmagpsf: Array[Double],
      csigmapsf: Array[Double], cfid: Array[Int]): Array[Double] = {
    val out = new Array[Double](12)
    var band = 1
    while (band <= 2) {
      val sel = cfid.indices.filter(i => cfid(i) == band && !cmagpsf(i).isNaN && !csigmapsf(i).isNaN)
      val t = sel.map(cjd).toArray
      val f = sel.map(i => FastTransientKernel.toFlux(cmagpsf(i))).toArray
      val s = sel.map(i => FastTransientKernel.toFluxErr(csigmapsf(i), FastTransientKernel.toFlux(cmagpsf(i)))).toArray
      val r = SigmoidFit.fit(t, f, s)
      val off = (band - 1) * 6
      out(off) = r.a; out(off + 1) = r.b; out(off + 2) = r.c
      out(off + 3) = r.snratio; out(off + 4) = r.mse; out(off + 5) = r.nrise
      band += 1
    }
    out.map(x => if (x.isNaN) 0.0 else x)
  }

  /** Early-SN-Ia score (`pIa`) — reference:
    * ztf/random_forest_snia/processor.py:77-216. 0.0 where the gate
    * rejects (reference sentinel). Features are the per-band sigmoid
    * fits in the bundled forests' feature_names_in_ order
    * (a,b,c,snratio,mse,nrise for g then r).
    *
    * Default scorer: the bundled active-learning-loop forest
    * (for_al_loop/model_20241122_wlimits.pkl; the rfscore_sigmoid
    * default-model_sigmoid.obj is CI-fetched and not in the bundle).
    */
  def rfSnia(spark: SparkSession, df: DataFrame,
      scorer: Scorer = RefModels.alSniaScorer.getOrElse(StubModels.forest("rf_snia", 12))): DataFrame = {
    val s = udf((cjd: Seq[java.lang.Double], cm: Seq[java.lang.Double],
        cs: Seq[java.lang.Double], cf: Seq[Int]) =>
      scorer.score(sniaFeatures(arr(cjd), arr(cm), arr(cs), cf.toArray)))
    df.withColumn("pIa",
        when(SelectionCuts.sniaGate(col("cmagpsf"), col("candidate.ndethist"),
          col("cdsxmatch")),
          s(col("cjd").cast("array<double>"), col("cmagpsf").cast("array<double>"),
            col("csigmapsf").cast("array<double>"), col("cfid").cast("array<int>")))
          .otherwise(lit(0.0)))
      .withColumn("pIa_is_stub", lit(graft.models.Scorer.isStandIn(scorer)))
  }

  /** Kilonova score (`pKNe`) — reference: ztf/kilonova/processor.py:37-186
    * (kndetect PC-fit features + the bundled
    * Pipeline(RobustScaler, RandomForest), KN_model_1PC.pkl).
    *
    * Feature layout per band (matching the bundle's 8-feature scaler:
    * npoints, coeff1, residuo, maxflux for g then r): the band's SNANA
    * FLUXCAL curve normalized by its maximum, PC1 (mixed_pcs.csv,
    * 401-sample grid at 0.25 d spanning +-50 d around peak) evaluated at
    * the observed epochs by linear interpolation, the single coefficient
    * solved by least squares, residuo = sqrt of the sigma-normalized
    * squared-residual sum (errors in peak-normalized units) — the
    * variant that reproduces both the bundle's RobustScaler medians
    * (residuo ~7.8) and the reference doctest golden (pKNe>0.5 -> 1 on
    * the datatest fixture, same object). The kndetect package itself is
    * offline-unavailable; classifier weights and components are the
    * real bundled ones.
    */
  def kilonova(spark: SparkSession, df: DataFrame,
      components: Array[Array[Double]] =
        RefModels.kilonovaPcs.getOrElse(StubComponents.pc),
      pipeline: Option[(graft.models.SklearnModels.RobustScaler,
        graft.models.SklearnModels.ForestClassifier)] = RefModels.kilonova): DataFrame = {
    val scorer: Array[Double] => Double = pipeline match {
      case Some((scaler, forest)) =>
        val idx = forest.classes.indexOf(true)
        x => forest.proba(scaler.transform(x))(idx)
      case None =>
        val stub = StubModels.forest("kilonova", 8)
        x => stub.score(x)
    }
    val pc1 = components(0)
    val s = udf((cjd: Seq[java.lang.Double], cm: Seq[java.lang.Double],
        cs: Seq[java.lang.Double], cf: Seq[Int]) => {
      val jd = arr(cjd); val m = arr(cm); val sig = arr(cs)
      val feats = new Array[Double](8)
      var band = 1
      while (band <= 2) {
        val sel = cf.indices.filter(i => cf(i) == band && !m(i).isNaN && !sig(i).isNaN)
        val off = (band - 1) * 4
        if (sel.nonEmpty) {
          // SNANA FLUXCAL (ZP 27.5), as mag2fluxcal_snana
          val flux = sel.map(i => math.pow(10.0, (27.5 - m(i)) / 2.5)).toArray
          val ferr = sel.indices.map(j =>
            sig(sel(j)) * flux(j) * math.log(10.0) / 2.5).toArray
          val t = sel.map(jd).toArray
          var iMax = 0
          var i = 1
          while (i < flux.length) { if (flux(i) > flux(iMax)) iMax = i; i += 1 }
          val mx = flux(iMax)
          val tPeak = t(iMax)
          // PC1 on the [-50, 50] 0.25 d grid; 0 outside support
          def pcAt(dt: Double): Double = {
            val pos = (dt + 50.0) / 0.25
            if (pos < 0 || pos > 400) 0.0
            else {
              val lo = math.floor(pos).toInt
              val hi = math.min(lo + 1, 400)
              pc1(lo) + (pos - lo) * (pc1(hi) - pc1(lo))
            }
          }
          var num = 0.0; var den = 0.0
          i = 0
          while (i < flux.length) {
            val p = pcAt(t(i) - tPeak)
            num += p * flux(i) / mx; den += p * p
            i += 1
          }
          val coeff = if (den > 0) num / den else 0.0
          // residuo: sigma-normalized residual L2 in peak-normalized units
          var res = 0.0
          i = 0
          while (i < flux.length) {
            val r = flux(i) / mx - coeff * pcAt(t(i) - tPeak)
            val sn = ferr(i) / mx
            if (sn > 0) res += (r / sn) * (r / sn)
            i += 1
          }
          feats(off) = flux.length.toDouble
          feats(off + 1) = coeff
          feats(off + 2) = math.sqrt(res)
          feats(off + 3) = mx
        }
        band += 1
      }
      scorer(feats)
    })
    df.withColumn("pKNe",
        when(SelectionCuts.kilonovaGate(col("cmagpsf"), col("candidate.ndethist"),
          col("cdsxmatch")),
          s(col("cjd").cast("array<double>"), col("cmagpsf").cast("array<double>"),
            col("csigmapsf").cast("array<double>"), col("cfid").cast("array<int>")))
          .otherwise(lit(0.0)))
      .withColumn("pKNe_is_stub", lit(pipeline.isEmpty))
  }

  /** Microlensing score (`mulens`) — reference:
    * ztf/microlensing/processor.py:38-190. Gates reproduced exactly:
    * ndethist < 100, >= 20 valid measurements overall, >= 10 valid per
    * band, DC-magnitude conversion per point (dc_mag), both bands must
    * classify ML; the score is the mean of the two band P(ML), else 0.
    *
    * Scoring runs the REAL bundled rf.sav forest (1000 trees over 47
    * inputs — n_features_=47 shows the FINK-branch LIA feeds raw
    * features, not the 44-dim pca.sav output) via
    * [[graft.models.RefModels.mulensForest]], over the
    * [[graft.kernels.LiaFeatures]] vector, whose LAYOUT is confirmed
    * against the bundled artifacts. After the r7 anchor narrowing
    * (tools/LiaAnchors: candidate definitions discriminated against
    * rf.sav's split-threshold distribution and pca.sav's training
    * means) and the r9 parameterization sweep (sample_entropy
    * anchor-adopted at SampEn(m=1, 0.15*std, mag); the shannon
    * unnormalized sum refuted by the training-mean anchor and
    * narrowed to its per-point form) the approximation scope surfaced
    * by `mulens_features_approx` is down to ONE statistic — the
    * shannon-entropy (37) residual parameterization; everything else
    * is canonical, parameter-pinned, or anchor-adopted (see the
    * kernel's tier doc).
    * Falls back to the documented stand-in when the bundle is absent.
    */
  def microlensing(spark: SparkSession, df: DataFrame,
      forest: Option[graft.models.SklearnModels.ForestClassifier] =
        graft.models.RefModels.mulensForest): DataFrame = {
    val fallback: Scorer = StubModels.forest("mulens", graft.kernels.LiaFeatures.Count)
    val s = udf((cm: Seq[java.lang.Double], cs: Seq[java.lang.Double],
        cmagnr: Seq[java.lang.Double], csigmagnr: Seq[java.lang.Double],
        cisdiffpos: Seq[String], cf: Seq[Int]) => {
      val m = arr(cm); val sg = arr(cs)
      val mnr = arr(cmagnr); val snr = arr(csigmagnr)
      // valid = not an upper limit (magpsf == magpsf in the reference)
      val valid = m.indices.filter(i => !m(i).isNaN)
      if (valid.length < 20) 0.0
      else {
        val perBand = (1 to 2).map { band =>
          val sel = valid.filter(i => cf(i) == band)
          if (sel.length < 10) None // classes.append("") -> never ML
          else {
            val dc = sel.map(i => graft.kernels.Photometry.dcMag(
              m(i), sg(i), mnr(i), snr(i),
              if (cisdiffpos(i) == null) "" else cisdiffpos(i)))
            // Guard (deviation from the reference, which feeds NaN
            // dc_mag into the external classifier with warnings
            // suppressed): a negative DC flux (isdiffpos='f' with
            // |diff| >= reference flux) or NaN magnr/sigmapsf makes
            // dcMag NaN, and ONE such point would poison every
            // normalized LIA statistic — the forest then traverses
            // NaN <= thr == false on every split and emits an
            // arbitrary in-range score. Drop non-finite pairs instead;
            // an emptied band cannot classify (like the < 10 gate).
            val finite = dc.filter(p =>
              java.lang.Double.isFinite(p._1) && java.lang.Double.isFinite(p._2))
            // the reference's >=10-points gate applies to what the
            // statistics actually see: 1-2 surviving points would make
            // the normalized LIA statistics degenerate/NaN again —
            // exactly what this guard exists to prevent
            if (finite.length < 10) None
            else {
              val dmag = finite.map(_._1).toArray
              val derr = finite.map(_._2).toArray
              val feats = graft.kernels.LiaFeatures.extractAll(dmag, derr)
              forest match {
                case Some(rf) =>
                  val p = rf.proba(feats)
                  val cls = rf.classes(p.indices.maxBy(p))
                  Some((cls == "ML", p(rf.classes.indexOf("ML"))))
                case None =>
                  val sc = fallback.score(feats.map(x => if (x.isNaN) 0.0 else x))
                  Some((sc > 0.5, sc))
              }
            }
          }
        }
        // np.all(classes == "ML"): both bands present AND both vote ML
        if (perBand.forall(_.exists(_._1)))
          perBand.flatMap(_.map(_._2)).sum / 2.0
        else 0.0
      }
    })
    df.withColumn("mulens",
        when(col("candidate.ndethist").cast("int") < 100,
          s(col("cmagpsf").cast("array<double>"),
            col("csigmapsf").cast("array<double>"),
            col("cmagnr").cast("array<double>"),
            col("csigmagnr").cast("array<double>"),
            col("cisdiffpos").cast("array<string>"),
            col("cfid").cast("array<int>")))
          .otherwise(lit(0.0)))
      .withColumn("mulens_is_stub", lit(forest.isEmpty))
      .withColumn("mulens_features_approx", lit(true))
  }

  /** SNN score — reference: ztf/snn/processor.py:84-210: the selection
    * gate (apply_selection_cuts_ztf), SNANA FLUXCAL sequences, and the
    * bundled SuperNNova bi-LSTM run natively
    * ([[graft.models.SnnModel]]); prob_class0 is the returned score,
    * 0.0 outside the gate. When the model bundle is absent a summary-
    * feature stub keeps the pipeline runnable.
    *
    * Note: the processor's doctest golden (pIa>0.5 -> 6) cannot hold
    * against the BUNDLED datatest fixture — only 4 of its 124 alerts
    * satisfy the gate's own jd[-1]-jdstarthist <= 90 cut (verified
    * directly), so that golden predates the current fixture.
    */
  def snn(spark: SparkSession, df: DataFrame, outCol: String = "snn_snia_vs_nonia",
      model: Option[graft.models.SnnModel] = RefModels.snnSniaVsNonia,
      fallback: Scorer = StubModels.logistic("snn", 26)): DataFrame = {
    val s = model match {
      case Some(m) =>
        udf((cjd: Seq[java.lang.Double], cf: Seq[Int], cm: Seq[java.lang.Double],
            cs: Seq[java.lang.Double]) =>
          graft.models.SnnFeatures.probClass0(m, arr(cjd), cf.toArray,
            arr(cm), arr(cs)))
      case None =>
        udf((cjd: Seq[java.lang.Double], cf: Seq[Int], cm: Seq[java.lang.Double],
            cs: Seq[java.lang.Double]) => {
          val jd = arr(cjd); val mm = arr(cm); val sg = arr(cs)
          val sel = mm.indices.filter(i => !mm(i).isNaN && !sg(i).isNaN)
          fallback.score(LightCurveFeatures.extract(
            sel.map(jd).toArray, sel.map(mm).toArray, sel.map(sg).toArray)
            .map(x => if (x.isNaN) 0.0 else x))
        })
    }
    df.withColumn(outCol,
        when(SelectionCuts.snnGate(col("cmagpsf"), col("cjd"),
          col("candidate.jdstarthist"), col("roid"), col("cdsxmatch")),
          s(col("cjd").cast("array<double>"), col("cfid").cast("array<int>"),
            col("cmagpsf").cast("array<double>"), col("csigmapsf").cast("array<double>")))
          .otherwise(lit(0.0)))
      .withColumn(outCol + "_is_stub", lit(model.isEmpty))
  }

  /** Anomaly score — reference: ztf/anomaly_detection/processor.py:85-242.
    * Two per-band forests over the 25 MODEL_COLUMNS features
    * (processor.py:33-59); the final score is the min over bands with
    * valid features, NaN when neither band is valid
    * (TwoBandModel.anomaly_score semantics). A band is valid only when
    * every MODEL_COLUMNS feature is non-NaN (the reference masks a band
    * out via `data.isna().any(1)`).
    *
    * Band→forest mapping reproduces the reference quirk verbatim: its
    * `data_r` variable holds fid=1 (which in ZTF is the g filter) and is
    * scored by the forest_r_AAD model, and vice versa
    * (processor.py:212-242). So `forestFid1` should carry forest_r's
    * parameters and `forestFid2` forest_g's.
    */
  def anomaly(spark: SparkSession, df: DataFrame): DataFrame = {
    val (f1, f2) = RefModels.anomalyBeta.getOrElse(
      (StubModels.isolationForest("anomaly_fid1", 25),
        StubModels.isolationForest("anomaly_fid2", 25)))
    anomaly(df, f1, f2)
  }

  /** anomaly with explicit per-band forests (fid1 <- forest_r params,
    * fid2 <- forest_g, per the reference's swapped naming).
    */
  def anomaly(df: DataFrame, forestFid1: Scorer, forestFid2: Scorer): DataFrame = {
    val s = udf((lc: Map[Int, Map[String, Double]]) => {
      def bandScore(b: Int, f: Scorer): Option[Double] =
        lc.get(b).flatMap { feats =>
          val x = AnomalyModels.ModelColumns.map(n =>
            feats.getOrElse(n, Double.NaN)).toArray
          if (x.exists(_.isNaN)) None else Some(f.score(x))
        }
      val scores = Seq(bandScore(1, forestFid1), bandScore(2, forestFid2)).flatten
      if (scores.isEmpty) Double.NaN else scores.min
    })
    df.withColumn("anomaly_score", s(col("lc_features")))
  }
}

/** Deterministic stand-in PCA components for the kilonova projection
  * (real deployment: the kndetect component matrix, broadcast).
  */
object StubComponents {
  val pc: Array[Array[Double]] = {
    val r = new java.util.Random(424242L)
    Array.fill(3)(Array.fill(24)(r.nextGaussian() / math.sqrt(24.0)))
  }
}
