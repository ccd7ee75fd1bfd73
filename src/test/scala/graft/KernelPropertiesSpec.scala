package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{FastTransientKernel, ImageStats, LightCurveFeatures, PowerSpectrum}
import graft.text.Winnow

/** Property-based kernel tests (raw ScalaCheck generators; the
  * scalatestplus bridge isn't available offline, so properties sample a
  * fixed number of deterministic cases).
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val smallDoubles = Gen.chooseNum(-1e3, 1e3)
  private val arrays = Gen.nonEmptyListOf(smallDoubles).map(_.toArray)

  test("percentile matches a naive implementation on random arrays") {
    for {
      xs <- samples(arrays, 50)
      q <- Seq(0.0, 3.7, 25.0, 50.0, 77.7, 95.0, 100.0)
    } {
      val arr = xs.sorted
      val got = FastTransientKernel.percentileSorted(arr, q)
      val pos = (arr.length - 1) * q / 100.0
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      val expect = arr(lo) + (pos - lo) * (arr(hi) - arr(lo))
      assert(math.abs(got - expect) <= 1e-9 * math.max(1.0, math.abs(expect)))
    }
  }

  test("quantileSorted is monotone in q") {
    samples(arrays, 50).foreach { xs =>
      val arr = xs.sorted
      val qs = Seq(0.0, 0.25, 0.5, 0.75, 1.0).map(q =>
        LightCurveFeatures.quantileSorted(arr, q))
      assert(qs.zip(qs.tail).forall { case (a, b) => a <= b + 1e-12 })
    }
  }

  test("winnowing is reproducible and self-similar") {
    samples(Gen.alphaLowerStr.suchThat(_.length >= 30), 30).foreach { s =>
      val f1 = Winnow.fingerprints(s)
      assert(f1.toSeq === Winnow.fingerprints(s).toSeq)
      assert(Winnow.similarity(f1, f1) === 1.0)
    }
  }

  test("sigma clipping is idempotent") {
    samples(Gen.listOfN(64, smallDoubles), 25).foreach { xs =>
      val img = xs.toArray.grouped(8).toArray
      val once = ImageStats.sigmaClip(img)
      val masked = Array.tabulate(img.length, img(0).length)((r, c) =>
        if (once.mask(r)(c)) Double.NaN else img(r)(c))
      val twice = ImageStats.sigmaClip(masked)
      assert(twice.countMasked === once.countMasked)
    }
  }

  test("wasserstein distance: zero on identical samples, symmetric") {
    val pairs = samples(Gen.zip(arrays, arrays), 50)
    pairs.foreach { case (x, y) =>
      assert(PowerSpectrum.wasserstein(x, x) === 0.0)
      assert(math.abs(PowerSpectrum.wasserstein(x, y) -
        PowerSpectrum.wasserstein(y, x)) < 1e-9)
    }
  }

  test("KS statistic is in [0,1] and zero for identical samples") {
    samples(arrays.suchThat(_.length >= 3), 50).foreach { x =>
      val (d0, _) = PowerSpectrum.ksTest(x, x)
      assert(d0 === 0.0)
      val shifted = x.map(_ + 1e6)
      val (d1, p1) = PowerSpectrum.ksTest(x, shifted)
      assert(d1 === 1.0)
      assert(p1 >= 0.0 && p1 <= 1.0)
    }
  }

  private val wordGen = Gen.oneOf("the", "a", "data", "Spark", "ROW", "añejo", "北京")
  private val textGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))

  test("simhash is a bag-of-words signature: token-order and case invariant") {
    samples(textGen, 40).foreach { t =>
      val base = graft.dedup.Dedup.simhashKernel(t)
      val toks = t.split(" ")
      val perm = toks.reverse.mkString(" ")
      assert(graft.dedup.Dedup.simhashKernel(perm) === base,
        "token order changed the signature")
      assert(graft.dedup.Dedup.simhashKernel(t.toUpperCase(java.util.Locale.ROOT)
        .toLowerCase(java.util.Locale.ROOT)) === base)
    }
  }

  test("grams-from-tokens equals shingles-from-text (the TextFamily d7 contract)") {
    // TextFamily.gramsFromTokens re-derives d7's n-grams from the
    // shared token array; Decontaminate.flags derives them from the
    // raw text via shinglesKernel. The family≡standalone equality rests
    // on these agreeing on EVERY text, including empty tokens from
    // consecutive/leading/trailing spaces and unicode
    val trickyGen = Gen.listOf(Gen.oneOf(
      "the", "a", "", " ", "añejo", "北京", "x  y", "")).map(_.mkString(" "))
    for {
      t <- samples(textGen, 30) ++ samples(trickyGen, 30) ++
        Seq("", " ", "  ", "a", "a b")
      n <- Seq(2, 3, 4)
    } {
      val fromText = graft.dedup.Dedup.shinglesKernel(t, n).toSeq
      val toks = t.toLowerCase(java.util.Locale.ROOT).split(" ", -1).toSeq
      val fromTokens = graft.text.TextFamily.gramsKernel(toks, n).toSeq
      assert(fromTokens === fromText,
        s"gram divergence on '$t' n=$n")
    }
  }

  test("shingle kernel laws: count bound, distinctness, n-gram shape") {
    for {
      t <- samples(textGen, 40)
      n <- Seq(1, 2, 3, 5)
    } {
      val toks = t.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
      val sh = graft.dedup.Dedup.shinglesKernel(t, n)
      assert(sh.length === sh.distinct.length, "shingles must be distinct")
      val expectedMax = math.max(0, toks.length - n + 1)
      assert(sh.length <= expectedMax)
      if (toks.length >= n) assert(sh.nonEmpty)
      sh.foreach(g => assert(g.split(" ", -1).length === n,
        s"gram '$g' is not an $n-gram"))
    }
  }
}
