package graft.text

/** Winnowing document fingerprints (the MOSS scheme: Schleimer,
  * Wilkerson & Aiken 2003) — rolling k-gram hashes, minimum per sliding
  * window (rightmost wins ties), consecutive duplicates collapsed.
  * The near-dup/containment fingerprint family named in the project
  * north star; guarantees any shared substring of length >= w + k - 1
  * yields a shared fingerprint.
  */
object Winnow {

  private val Base = 257L
  private val Mod = (1L << 61) - 1 // Mersenne prime

  /** Rolling polynomial hashes of every k-gram of s. "Characters" are
    * Unicode CODEPOINTS (matching the oracle's ord/substr semantics and
    * DuckDB's length()), not UTF-16 units — charAt would split non-BMP
    * characters (emoji) into surrogate halves and diverge cross-engine.
    */
  def kgramHashes(s: String, k: Int): Array[Long] = {
    val cp = s.codePoints().toArray
    if (cp.length < k) return Array.empty
    val n = cp.length - k + 1
    val out = new Array[Long](n)
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) {
      h = mulmod(h, Base) + cp(i)
      if (h >= Mod) h -= Mod
      if (i < k - 1) pow = mulmod(pow, Base)
      i += 1
    }
    out(0) = h
    i = 1
    while (i < n) {
      h = h - mulmod(cp(i - 1).toLong, pow)
      if (h < 0) h += Mod
      h = mulmod(h, Base) + cp(i + k - 1)
      if (h >= Mod) h -= Mod
      out(i) = h
      i += 1
    }
    out
  }

  private def mulmod(a: Long, b: Long): Long = {
    // 61-bit Mersenne multiplication via Math.multiplyHigh
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & Mod) + ((lo >>> 61) | (hi << 3))
    if (r >= Mod) r -= Mod
    r
  }

  /** Winnowed fingerprint set (sorted, distinct). */
  def fingerprints(text: String, k: Int = 5, w: Int = 4): Array[Long] = {
    val hs = kgramHashes(text, k)
    if (hs.isEmpty) return Array.empty
    if (hs.length <= w) return Array(hs.min)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var last = -1
    var i = 0
    while (i + w <= hs.length) {
      // rightmost minimum of window [i, i+w)
      var m = i
      var j = i + 1
      while (j < i + w) { if (hs(j) <= hs(m)) m = j; j += 1 }
      if (m != last) { out += hs(m); last = m }
      i += 1
    }
    val arr = out.toArray
    java.util.Arrays.sort(arr)
    arr.distinct
  }

  /** Fingerprint-overlap similarity (|A ∩ B| / |A ∪ B|). */
  def similarity(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet
    val inter = b.count(sa.contains)
    val union = sa.size + b.distinct.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
