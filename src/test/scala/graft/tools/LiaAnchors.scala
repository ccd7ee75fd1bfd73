package graft.tools

/** Dump the artifact anchors the five RECONSTRUCTED LIA statistics
  * (indices 31, 32, 33, 36, 37 — see kernels/LiaFeatures.scala) can be
  * narrowed against:
  *
  *  - pca.sav `mean_(i)` = the TRAINING-SET mean of feature i (sklearn
  *    PCA centers on the training mean), and
  *  - the distribution of rf.sav split thresholds at feature i — CART
  *    places each threshold at the midpoint of two observed training
  *    values, so threshold quantiles sketch the training marginal.
  *
  * A candidate definition whose ensemble distribution sits at the wrong
  * scale against BOTH anchors is ruled out (`sbt "Test/runMain
  * graft.tools.LiaAnchors"`).
  */
object LiaAnchors {

  def thresholdStats(idx: Int): (Long, Array[Double]) = {
    val forest = graft.models.RefModels.mulensForest.get
    val ts = scala.collection.mutable.ArrayBuffer[Double]()
    forest.trees.foreach { t =>
      t.feature.indices.foreach { n =>
        if (t.left(n) != -1 && t.feature(n).toInt == idx) ts += t.threshold(n)
      }
    }
    val s = ts.toArray.sorted
    def q(p: Double) = if (s.isEmpty) Double.NaN
      else s(math.min(s.length - 1, (p * s.length).toInt))
    (s.length.toLong, Array(q(0.0), q(0.1), q(0.25), q(0.5), q(0.75), q(0.9), q(1.0 - 1e-9)))
  }

  /** Training-like ensemble (the bundled models were trained on the
    * public ZTF_mulens_simulator's mix: PSPL microlensing events +
    * constant stars + variables + CVs over ZTF-like noise — see
    * classifier.py:52). Returns (mag, magerr) light curves.
    */
  def ensemble(trials: Int, seed: Int): Seq[(Array[Double], Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until trials).map { trial =>
      val n = 10 + rnd.nextInt(90)
      val kind = trial % 4
      val base = 14.0 + rnd.nextDouble() * 8.0
      // error-CONSISTENT photometry: the reported magerr tracks the
      // true per-point scatter (as in real ZTF photometry and the
      // training simulator) — an independent (noise, magerr) draw
      // mis-scores every error-weighted candidate
      val errBase = 0.01 + rnd.nextDouble() * 0.15
      val err = Array.fill(n)(errBase * (0.7 + 0.6 * rnd.nextDouble()))
      // reported errors are CONSERVATIVE for a fraction of sources
      // (ZTF pipeline errors commonly overestimate the realized
      // repeatability, up to ~3x for bright constants) — the realized
      // scatter divides by this factor while `err` stays as reported
      val conserv = if (rnd.nextBoolean()) 1.0 else 1.0 + 2.0 * rnd.nextDouble()
      val mag = Array.tabulate(n) { i =>
        val t = i.toDouble / n
        val shape = kind match {
          case 0 => 0.0 // constant
          case 1 => -(0.5 + 4.0 * rnd.nextDouble()) *
            math.exp(-math.pow((t - 0.5) / 0.1, 2)) // PSPL-ish event
          case 2 => 0.8 * math.sin(t * 20.0) // variable
          case _ => if (rnd.nextDouble() < 0.15) -2.5 else 0.0 // CV bursts
        }
        base + shape + rnd.nextGaussian() * err(i) / conserv
      }
      (mag, err)
    }
  }

  def quants(xs: Array[Double]): String = {
    val s = xs.sorted
    def q(p: Double) = s(math.min(s.length - 1, (p * s.length).toInt))
    f"mean=${xs.sum / xs.length}%9.4f q[p10,p50,p90]=${q(0.1)}%9.4f ${q(0.5)}%9.4f ${q(0.9)}%9.4f"
  }

  def main(args: Array[String]): Unit = {
    val pca = graft.models.RefModels.mulensPca.get
    val names = Map(31 -> "median_buffer_range", 32 -> "median_distance",
      33 -> "peak_detection", 36 -> "sample_entropy", 37 -> "shannon_entropy")
    for (i <- Seq(31, 32, 33, 36, 37)) {
      val (n, qs) = thresholdStats(i)
      println(f"f$i%2d ${names(i)}%-20s pca.mean=${pca.mean(i)}%12.5f  nthr=$n%5d  " +
        f"thr[min,p10,p25,p50,p75,p90,max]=${qs.map(v => f"$v%.4f").mkString(", ")}")
    }
    println()
    // candidate definitions, evaluated over the training-like ensemble
    val ens = ensemble(2000, 7)
    val cands = LiaCandidates
    def eval(name: String, f: (Array[Double], Array[Double]) => Double): Unit =
      println(f"$name%-34s ${quants(ens.map { case (m, e) => f(m, e) }.toArray)}")

    println("-- f31 median_buffer_range (anchor mean 0.446)")
    eval("A frac |x-med|<0.1*med (current)", cands.mbrMedianFrac)
    eval("B frac |x-med|<amp/10", cands.mbrAmpFrac)
    println("-- f32 median_distance (anchor mean 0.142, thr up to 0.47)")
    eval("A med sqrt(dnf^2+dne^2) (current)", cands.mdNormFlux)
    eval("B med sqrt(dmag^2+dmagerr^2)", cands.mdMag)
    eval("C med |dnf|", cands.mdAbsFlux)
    println("-- f33 peak_detection (anchor mean 1.44, thr {0.5,1.5,2.5})")
    eval("A #locmax > mean+std (current)", cands.peaksMeanStd)
    eval("B peakutils |x-med| thres=.5 md=25", cands.peaksHalfRange)
    eval("C peakutils nf thres=.5 md=10", cands.peaksHalfRangeMd10)
    println("-- f36 sample_entropy (anchor mean 1.49, thr 0.39-2.88)")
    eval("A SampEn(2,.2std) nf (current)", cands.sampEnNf)
    eval("B SampEn(2,.2std) mag", cands.sampEnMag)
    println("-- f37 shannon_entropy (anchor mean 0.474, thr p50=0.008 tail 4.8)")
    eval("A hist10/log10 nf (refuted r7)", cands.shannonHist)
    eval("B err-CDF -sum p*log2 p", cands.shannonCdf)
    eval("C err-CDF sum -log2(p)/n", cands.shannonCdfMean)
    eval("D -sum log2(p)(1-p) mag 2err", cands.shannonInvMag)
    eval("E -sum log2(p)(1-p) nf 2err", cands.shannonInvNf)

    // ---- r9 parameterization sweeps (VERDICT r8 #5): score each
    // candidate's ensemble distribution against BOTH anchors — the
    // training mean (pca.mean_) and the threshold-quantile sketch of
    // the training marginal (frac< columns: fraction of ensemble
    // values below the thr p25/p50/p75 — were the candidate the
    // training statistic, these sit near 0.25/0.50/0.75).
    def evalFit(name: String, idx: Int,
        f: (Array[Double], Array[Double]) => Double): Unit = {
      val xs = ens.map { case (m, e) => f(m, e) }.toArray
      val (_, qs) = thresholdStats(idx)
      def fracBelow(t: Double) = xs.count(_ < t).toDouble / xs.length
      println(f"$name%-34s ${quants(xs)} " +
        f"frac<[p25,p50,p75]=${fracBelow(qs(2))}%.2f ${fracBelow(qs(3))}%.2f ${fracBelow(qs(4))}%.2f")
    }
    println("-- f36 r9 sweep (training mean 1.49; ideal frac< = .25 .50 .75)")
    for (mag <- Seq(false, true); mm <- Seq(1, 2);
         rf <- Seq(0.1, 0.15, 0.2, 0.25, 0.3))
      evalFit(f"SampEn(m=$mm,r=$rf%.2f,${if (mag) "mag" else "nf"})", 36,
        cands.sampEnParam(mag, mm, rf))
    println("-- f37 r9 sweep (training mean 0.474; ideal frac< = .25 .50 .75)")
    for (mag <- Seq(true, false); k <- Seq(1.0, 2.0, 3.0);
         ln <- Seq(false, true); pp <- Seq(false, true))
      evalFit(f"surprisal(${if (mag) "mag" else "nf"},k=$k%.0f," +
        f"${if (ln) "ln" else "log2"}${if (pp) ",/n" else ""})", 37,
        cands.shannonSurprisal(mag, k, ln, pp))
    evalFit("Mislis dblCDF mag", 37, cands.shannonMislis(true))
    evalFit("Mislis dblCDF nf", 37, cands.shannonMislis(false))
    println("-- f37 r12 families: uniform window mass / normal+uniform / RMS scale")
    for (mag <- Seq(true, false); k <- Seq(1.0, 2.0); pp <- Seq(true, false))
      evalFit(f"uniform(${if (mag) "mag" else "nf"},k=$k%.0f${if (pp) ",/n" else ""})",
        37, cands.shannonUniform(mag, k, pp))
    for (mag <- Seq(true, false); k <- Seq(1.0, 2.0); pp <- Seq(true, false))
      evalFit(f"norm+unif(${if (mag) "mag" else "nf"},k=$k%.0f${if (pp) ",/n" else ""})",
        37, cands.shannonNormalPlusUniform(mag, k, pp))
    for (mag <- Seq(true, false); k <- Seq(1.0, 2.0); pp <- Seq(true, false))
      evalFit(f"rmsScale(${if (mag) "mag" else "nf"},k=$k%.0f${if (pp) ",/n" else ""})",
        37, cands.shannonRms(mag, k, pp))
    for (bins <- Seq(20, 30, 32, 40, 50, 64))
      evalFit(s"fixedHist($bins) bits nf", 37, cands.shannonFixedHist(bins))
    println("-- f36 fine sweep around the m=1 mag ladder")
    for (rf <- Seq(0.05, 0.08, 0.1, 0.12, 0.15))
      evalFit(f"SampEn(m=1,r=$rf%.2f,mag)", 36, cands.sampEnParam(true, 1, rf))
    // ensemble-robustness: the two leading candidates under a DIFFERENT
    // synthetic seed (adoption requires the ladder to survive reseeding)
    val ens2 = ensemble(2000, 31)
    def evalFit2(name: String, idx: Int,
        f: (Array[Double], Array[Double]) => Double): Unit = {
      val xs = ens2.map { case (m, e) => f(m, e) }.toArray
      val (_, qs) = thresholdStats(idx)
      def fracBelow(t: Double) = xs.count(_ < t).toDouble / xs.length
      println(f"$name%-34s ${quants(xs)} " +
        f"frac<[p25,p50,p75]=${fracBelow(qs(2))}%.2f ${fracBelow(qs(3))}%.2f ${fracBelow(qs(4))}%.2f")
    }
    println("-- reseeded (seed 31) stability check")
    evalFit2("SampEn(m=1,r=0.10,mag)", 36, cands.sampEnParam(true, 1, 0.1))
    evalFit2("SampEn(m=1,r=0.15,mag)", 36, cands.sampEnParam(true, 1, 0.15))
    evalFit2("SampEn(m=2,r=0.20,nf) current", 36, cands.sampEnParam(false, 2, 0.2))
    evalFit2("fixedHist(32) bits nf", 37, cands.shannonFixedHist(32))
    evalFit2("surprisal(mag,k=2,log2) current", 37,
      cands.shannonSurprisal(true, 2.0, false, false))

    // ---- r10 families (VERDICT r9 #7): the shape fact every earlier
    // family missed is the HALF-AT-ZERO training marginal (thr p50 =
    // 0.008); the gated surprisal can produce exact zeros, binary
    // entropy and Vasicek are the remaining published-entropy shapes.
    println("-- f37 r10 sweep: outlier-gated surprisal")
    for (mag <- Seq(true, false); k <- Seq(1.0, 2.0);
         p0 <- Seq(0.25, 0.5, 0.75); pp <- Seq(true, false))
      evalFit(f"gated(${if (mag) "mag" else "nf"},k=$k%.0f,p0=$p0%.2f" +
        f"${if (pp) ",/n" else ""})", 37,
        cands.shannonOutlierGated(mag, k, p0, pp))
    println("-- f37 r10 sweep: binary entropy")
    for (mag <- Seq(true, false); k <- Seq(1.0, 2.0); pp <- Seq(true, false))
      evalFit(f"binary(${if (mag) "mag" else "nf"},k=$k%.0f" +
        f"${if (pp) ",/n" else ""})", 37, cands.shannonBinary(mag, k, pp))
    println("-- f37 r10 sweep: Vasicek m-spacing")
    for (mag <- Seq(true, false); mw <- Seq(1, 2, 5))
      evalFit(f"vasicek(${if (mag) "mag" else "nf"},m=$mw)", 37,
        cands.shannonVasicek(mag, mw))
    println("-- r10 reseeded (seed 31) stability for the leading gated forms")
    evalFit2("gated(mag,k=2,p0=0.50,/n)", 37,
      cands.shannonOutlierGated(true, 2.0, 0.5, perPoint = true))
    evalFit2("gated(mag,k=2,p0=0.25,/n)", 37,
      cands.shannonOutlierGated(true, 2.0, 0.25, perPoint = true))
    evalFit2("gated(nf,k=2,p0=0.50,/n)", 37,
      cands.shannonOutlierGated(false, 2.0, 0.5, perPoint = true))
  }
}
