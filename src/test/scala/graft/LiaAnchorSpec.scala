package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.LiaAnchors

/** Artifact-anchor regression pins for the r7 LIA narrowing (VERDICT
  * r6 #5): the three ANCHOR-ADOPTED definitions (31/32/33) and the
  * shape constraint that refuted the old shannon_entropy (37) are
  * pinned against the bundled rf.sav/pca.sav so drift in either the
  * kernel or the artifact parsing is caught. The anchors: CART places
  * split thresholds at midpoints of observed training values, so the
  * threshold distribution at a feature index sketches the training
  * marginal; pca.sav's mean_ carries the training mean per index.
  */
class LiaAnchorSpec extends AnyFunSuite {

  private lazy val ens = LiaAnchors.ensemble(400, 7)
  private def feat(i: Int): Array[Double] =
    ens.map { case (m, e) => graft.kernels.LiaFeatures.extractAll(m, e)(i) }.toArray

  test("f33 peak_detection: the artifact thresholds are the integer-count set and the kernel lives in it") {
    assume(graft.models.RefModels.mulensForest.isDefined, "rf.sav absent")
    val (n, _) = LiaAnchors.thresholdStats(33)
    assert(n > 0)
    val forest = graft.models.RefModels.mulensForest.get
    val distinct = forest.trees.flatMap { t =>
      t.feature.indices.collect {
        case k if t.left(k) != -1 && t.feature(k).toInt == 33 => t.threshold(k)
      }
    }.toSet
    // the artifact fact that adopted the definition: every threshold
    // is a half-integer in 0.5..2.5 (training counts in 0..3)
    assert(distinct.subsetOf(Set(0.5, 1.5, 2.5)), s"thresholds drifted: $distinct")
    val f = feat(33)
    assert(f.forall(x => x == x.floor && x >= 0), "not an integer count")
    val mean = f.sum / f.length
    assert(mean > 0.5 && mean < 2.5,
      s"ensemble mean $mean left the threshold band (training mean 1.44)")
  }

  test("f32 median_distance: the mag-domain definition reaches both ends of the threshold range") {
    assume(graft.models.RefModels.mulensForest.isDefined, "rf.sav absent")
    val (_, q) = LiaAnchors.thresholdStats(32)
    val f = feat(32).sorted
    // observed values must cross the low-quartile AND high-quartile
    // threshold mass — the flux-domain variant failed the high end
    // (p90 of 0.11 against thresholds at 0.31-0.47)
    assert(f.head < q(2), s"no mass below the p25 threshold ${q(2)}")
    assert(f.last > q(4), s"no mass above the p75 threshold ${q(4)} — " +
      "the high threshold band is unreachable (flux-domain regression?)")
  }

  test("f31 median_buffer_range: a fraction, anchor-plausible mean") {
    val f = feat(31)
    assert(f.forall(x => x >= 0 && x <= 1))
    val mean = f.sum / f.length
    assert(math.abs(mean - 0.446) < 0.25,
      s"ensemble mean $mean too far from the 0.446 training mean")
  }

  test("f37 shannon_entropy: unbounded tail plus near-zero mass (the shape that refuted the histogram form)") {
    assume(graft.models.RefModels.mulensForest.isDefined, "rf.sav absent")
    val f = feat(37)
    // training thresholds reach 4.81 — the statistic must exceed 1
    // (the old histogram definition was bounded by 1)
    assert(f.max > 1.0, "no tail above 1 — bounded-entropy regression")
    // and half the threshold mass is below 0.008 — quiet curves must
    // be able to land near zero
    assert(f.min < 0.1, s"no near-zero mass (min ${f.min})")
  }

  test("f37 shannon_entropy: training-mean anchor (the shape that refuted the r7 unnormalized sum)") {
    val f = feat(37)
    val mean = f.sum / f.length
    // pca.mean_(37) = 0.474: the r7 unnormalized sum sat at ~144 on
    // this ensemble (300x); the adopted per-point form must stay
    // within the same order of magnitude as the training mean
    assert(mean < 10.0,
      s"ensemble mean $mean detached from the 0.474 training mean — " +
        "unnormalized-sum regression")
  }

  test("f37 r10 adjudication facts: positive threshold support with the 0.008/0.23/4.8 ladder") {
    assume(graft.models.RefModels.mulensForest.isDefined, "rf.sav absent")
    val (n, q) = LiaAnchors.thresholdStats(37)
    assert(n > 100, "threshold sample collapsed — artifact parsing drift")
    // the three artifact facts the r10 refutations rest on:
    // strictly positive support (kills Vasicek's negative values),
    assert(q(0) > 0.0, s"negative/zero threshold appeared: ${q(0)}")
    // a tail beyond 1 (kills every bounded-by-1 family: the r6
    // histogram AND the r10 per-point binary entropy),
    assert(q(6) > 4.0, s"tail threshold collapsed: ${q(6)}")
    // and heavy mass in the 0.008-0.23 mid-band (kills the r10
    // outlier-gated form, which evacuates it)
    assert(q(3) < 0.05 && q(4) > 0.1 && q(4) < 1.0,
      s"mid-band moved: p50=${q(3)} p75=${q(4)}")
  }

  test("f37 r12 refutations: uniform window mass, Mislis normal+uniform pair, RMS scale") {
    // The r12 sweep closed the two axes every earlier round left
    // untouched: (a) the UNIFORM-model window mass of the SIDRA
    // method the LIA docstring cites (Mislis et al. 2015 score each
    // point under BOTH a Gaussian and a uniform model — only the
    // Gaussian half had ever been swept), alone and paired with the
    // Gaussian term; (b) LIA's own root-mean-square helper as the
    // z-score scale (uncentered RMS ≈ |mean mag| in the magnitude
    // domain). All three families are artifact-refuted at every
    // swept parameterization (mag/nf domain, k ∈ {1,2}, raw and
    // per-point): their ensemble mass sits entirely ABOVE the
    // 0.0034/0.008 low-threshold band that carries half the training
    // marginal — frac< p50 ≤ 0.06 everywhere vs the ~0.50 a correct
    // definition must show, and the RMS family cannot even reach the
    // p75 threshold (frac< = 0.00 at every setting, ensemble p10 ≥
    // 2.6 vs threshold p75 0.23). Pin the discriminating fact per
    // family on the per-point k=2 mag form (each family's closest
    // approach) so a kernel or artifact drift resurfaces them.
    assume(graft.models.RefModels.mulensForest.isDefined, "rf.sav absent")
    val (_, q) = LiaAnchors.thresholdStats(37)
    val small = ens.take(400)
    def fracBelow(f: (Array[Double], Array[Double]) => Double, t: Double) = {
      val xs = small.map { case (m, e) => f(m, e) }
      xs.count(_ < t).toDouble / xs.length
    }
    import graft.tools.LiaCandidates._
    // p50 threshold (0.008) carries ~half the training mass; the
    // refuted families leave it nearly empty
    assert(fracBelow(shannonUniform(true, 2.0, true), q(3)) < 0.2,
      "uniform window mass now reaches the low band — re-adjudicate")
    assert(fracBelow(shannonNormalPlusUniform(true, 2.0, true), q(3)) < 0.2,
      "normal+uniform pair now reaches the low band — re-adjudicate")
    // the RMS family is refuted harder: no mass even below p75 (0.23)
    assert(fracBelow(shannonRms(true, 2.0, true), q(4)) < 0.1,
      "RMS-scaled surprisal now reaches the mid band — re-adjudicate")
  }

  test("f36 sample_entropy: r9 anchor adoption holds (mag domain, m=1, r=0.15*std)") {
    assume(graft.models.RefModels.mulensForest.isDefined, "rf.sav absent")
    val (_, q) = LiaAnchors.thresholdStats(36)
    val f = feat(36)
    val mean = f.sum / f.length
    // pca.mean_(36) = 1.49; the r7 flux-domain (2, 0.2*std) choice sat
    // at 0.66 on this ensemble, the adopted parameterization at ~1.2
    assert(mean > 0.9 && mean < 2.2,
      s"ensemble mean $mean left the anchor band (training mean 1.49)")
    // the adoption's discriminating fact: the ensemble median tracks
    // the threshold median (0.92) instead of sitting at a third of it
    val sorted = f.sorted
    val med = sorted(sorted.length / 2)
    assert(med > 0.5 * q(3) && med < 2.0 * q(3),
      s"ensemble median $med detached from the threshold median ${q(3)}")
    // liveness across the threshold range (0.39 .. 2.88)
    assert(f.min < q(0) && f.max > q(6),
      "feature no longer crosses the full threshold range")
  }

  test("f37 TERMINAL (r13): the anchor set cannot discriminate within the adopted family") {
    // The closing fact of the r7-r13 narrowing (VERDICT r12 #6): after
    // 60+ parameterizations refuted EVERY competing family, the
    // remaining anchors — positive threshold support, a tail beyond 1
    // (thresholds reach 4.81), near-zero mass (p50 = 0.008), and the
    // training-mean order (pca.mean_ = 0.474) — are passed by EVERY
    // in-family variant of the adopted per-point Gaussian surprisal:
    // error-bar multiplier k in {1, 1.5, 2, 2.5, 3}, log base 2 or e,
    // and even the normalized-flux domain (measured here: all pass all
    // binding gates; the mid-band occupancy gate that killed the
    // OTHER families does not separate these — the synthetic anchor
    // ensemble's frac<p50 sits at 0.00-0.12 for every variant,
    // adopted included, because the training marginal's quiet-curve
    // mass is not reproducible offline). rf.sav/pca.sav therefore
    // carry NO remaining discriminating power inside the family:
    // value-level reconstruction of shannon_entropy(37) is
    // structurally closed offline, the adopted (mag, k=2, log2,
    // per-point) form is final at family precision, and the operator
    // keeps surfacing `mulens_features_approx`. This test pins the
    // exhaustion fact itself — if a future artifact or ensemble
    // change makes an anchor separate the variants, the adjudication
    // must be reopened.
    assume(graft.models.RefModels.mulensForest.isDefined, "rf.sav absent")
    import graft.tools.LiaCandidates.shannonSurprisal
    val variants = Seq(
      shannonSurprisal(true, 1.0, false, true),
      shannonSurprisal(true, 1.5, false, true),
      shannonSurprisal(true, 2.0, false, true), // the adopted form
      shannonSurprisal(true, 2.5, false, true),
      shannonSurprisal(true, 3.0, false, true),
      shannonSurprisal(true, 2.0, true, true),
      shannonSurprisal(false, 2.0, false, true))
    val passing = variants.count { f =>
      val xs = ens.map { case (m, e) => f(m, e) }.toArray
      val mean = xs.sum / xs.length
      xs.max > 1.0 && xs.min < 0.1 && mean < 10.0
    }
    // all but the k=1 variant (min 0.016) pass even the near-zero
    // gate; require the exhaustion to stay broad, not unanimous
    assert(passing >= 5,
      s"only $passing/7 in-family variants pass the anchor gates — " +
        "an anchor gained discriminating power; reopen the f37 adjudication")
    // and the adopted form is among the passers (absolute pin)
    val adopted = ens.map { case (m, e) =>
      shannonSurprisal(true, 2.0, false, true)(m, e) }.toArray
    assert(adopted.max > 1.0 && adopted.min < 0.1 &&
      adopted.sum / adopted.length < 10.0)
  }
}
