package graft.kernels

/** Radial power-spectrum + shuffle-test host detection (reference:
  * ztf/hostless_detection/powerspectrum.py:25-233, after the ELEPHANT
  * pipeline paper arXiv:2404.18165).
  *
  * For an image cutout: 2-D DFT -> squared amplitudes -> mean per radial
  * frequency bin scaled by annulus area. The host statistic compares the
  * Wasserstein distances (real spectrum vs shuffled-pixel spectra)
  * against (shuffled vs shuffled) with a two-sample KS test.
  */
object PowerSpectrum {

  /** Naive 2-D DFT squared amplitudes, row-major flattened. Sizes here
    * are tiny (<= 63), so O(n^3) is fine and dependency-free.
    */
  def powerSpectrum2d(img: Array[Array[Double]]): Array[Double] = {
    val n = img.length
    val m = img(0).length
    // 1-D DFT along rows then columns
    val re = Array.ofDim[Double](n, m)
    val im = Array.ofDim[Double](n, m)
    var r = 0
    while (r < n) {
      var k = 0
      while (k < m) {
        var sr = 0.0; var si = 0.0
        var c = 0
        while (c < m) {
          val ang = -2.0 * math.Pi * k * c / m
          sr += img(r)(c) * math.cos(ang)
          si += img(r)(c) * math.sin(ang)
          c += 1
        }
        re(r)(k) = sr; im(r)(k) = si
        k += 1
      }
      r += 1
    }
    val out = new Array[Double](n * m)
    var k1 = 0
    while (k1 < n) {
      var k2 = 0
      while (k2 < m) {
        var sr = 0.0; var si = 0.0
        var rr = 0
        while (rr < n) {
          val ang = -2.0 * math.Pi * k1 * rr / n
          val (cr, ci) = (math.cos(ang), math.sin(ang))
          sr += re(rr)(k2) * cr - im(rr)(k2) * ci
          si += re(rr)(k2) * ci + im(rr)(k2) * cr
          rr += 1
        }
        out(k1 * m + k2) = sr * sr + si * si
        k2 += 1
      }
      k1 += 1
    }
    out
  }

  /** (knrm, kbins, binAreas) for a square size (powerspectrum.py:88-100). */
  def prepare(size: Int): (Array[Double], Array[Double], Array[Double]) = {
    val kfreq = Array.tabulate(size) { i =>
      (if (i <= (size - 1) / 2) i else i - size).toDouble
    }
    val knrm = new Array[Double](size * size)
    var i = 0
    while (i < size) {
      var j = 0
      while (j < size) {
        knrm(i * size + j) = math.sqrt(kfreq(i) * kfreq(i) + kfreq(j) * kfreq(j))
        j += 1
      }
      i += 1
    }
    val nb = size / 2
    val kbins = Array.tabulate(nb + 1)(k => 0.5 + k)
    val areas = Array.tabulate(nb)(k =>
      math.Pi * (kbins(k + 1) * kbins(k + 1) - kbins(k) * kbins(k)))
    (knrm, kbins, areas)
  }

  /** Radial binned-mean spectrum * annulus areas (scipy
    * binned_statistic semantics: right edge inclusive in last bin;
    * empty bin -> NaN).
    */
  def radialSpectrum(img: Array[Array[Double]], knrm: Array[Double],
      kbins: Array[Double], areas: Array[Double]): Array[Double] = {
    val amps = powerSpectrum2d(img)
    val nb = areas.length
    val sums = new Array[Double](nb)
    val counts = new Array[Int](nb)
    var i = 0
    while (i < amps.length) {
      val k = knrm(i)
      if (k >= kbins(0) && k <= kbins(nb)) {
        var b = ((k - kbins(0)) / (kbins(1) - kbins(0))).toInt
        if (b == nb) b = nb - 1
        sums(b) += amps(i)
        counts(b) += 1
      }
      i += 1
    }
    Array.tabulate(nb)(b =>
      if (counts(b) == 0) Double.NaN else sums(b) / counts(b) * areas(b))
  }

  /** 1-D Wasserstein distance between equal-weight samples. */
  def wasserstein(u0: Array[Double], v0: Array[Double]): Double = {
    val u = u0.clone(); java.util.Arrays.sort(u)
    val v = v0.clone(); java.util.Arrays.sort(v)
    val all = (u ++ v).sorted
    var d = 0.0
    var i = 0
    while (i < all.length - 1) {
      val x = all(i)
      val ucdf = countLE(u, x).toDouble / u.length
      val vcdf = countLE(v, x).toDouble / v.length
      d += math.abs(ucdf - vcdf) * (all(i + 1) - x)
      i += 1
    }
    d
  }

  private def countLE(sorted: Array[Double], x: Double): Int = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Two-sample KS statistic + asymptotic p-value. */
  def ksTest(a0: Array[Double], b0: Array[Double]): (Double, Double) = {
    val a = a0.clone(); java.util.Arrays.sort(a)
    val b = b0.clone(); java.util.Arrays.sort(b)
    var i = 0; var j = 0; var d = 0.0
    while (i < a.length && j < b.length) {
      val x = math.min(a(i), b(j))
      while (i < a.length && a(i) <= x) i += 1
      while (j < b.length && b(j) <= x) j += 1
      val diff = math.abs(i.toDouble / a.length - j.toDouble / b.length)
      if (diff > d) d = diff
    }
    // scipy ks_2samp asymptotic convention: en = sqrt(n1*n2/(n1+n2)),
    // p = kstwobign.sf(en * d) — plain en*d, no small-sample correction
    // (the Numerical-Recipes (en + 0.12 + 0.11/en) adjustment diverges
    // from the reference's scipy p-values and was removed)
    val n = a.length.toDouble * b.length / (a.length + b.length)
    val lambda = math.sqrt(n) * d
    var p = 0.0
    var k = 1
    while (k <= 100) {
      p += 2.0 * math.pow(-1.0, k - 1) * math.exp(-2.0 * k * k * lambda * lambda)
      k += 1
    }
    (d, math.max(0.0, math.min(1.0, p)))
  }

  /** Host statistic for one image: KS(WD(real, shuffled), WD(shuffled,
    * shuffled)) (powerspectrum.py:120-233). Returns (-1,-1) when the
    * distance distributions are degenerate (the reference's guard).
    */
  def hostStatistic(image: Array[Array[Double]], cutoutSize: Int,
      iterations: Int, rng: java.util.Random): (Double, Double) = {
    val full = image.length
    val start = (full - cutoutSize) / 2
    val stop = start + cutoutSize
    def cutout(img: Array[Array[Double]]): Array[Array[Double]] =
      img.slice(start, stop).map(_.slice(start, stop))

    val (knrm, kbins, areas) = prepare(cutoutSize)
    val real = radialSpectrum(cutout(image), knrm, kbins, areas)

    val flat = image.flatten
    val shuffled = Array.ofDim[Double](iterations, areas.length)
    var it = 0
    while (it < iterations) {
      val copy = flat.clone()
      // Fisher-Yates
      var i = copy.length - 1
      while (i > 0) {
        val j = rng.nextInt(i + 1)
        val t = copy(i); copy(i) = copy(j); copy(j) = t
        i -= 1
      }
      val img2 = Array.tabulate(full, full)((r, c) => copy(r * full + c))
      shuffled(it) = radialSpectrum(cutout(img2), knrm, kbins, areas)
      it += 1
    }

    val realToShuffled = shuffled.map(s => wasserstein(s, real))
    val pairs = for {
      i <- 0 until iterations; j <- (i + 1) until iterations
    } yield wasserstein(shuffled(i), shuffled(j))
    val s2s = pairs.toArray

    if (realToShuffled.distinct.length < 3 || s2s.distinct.length < 3)
      (-1.0, -1.0)
    else ksTest(realToShuffled, s2s)
  }
}
