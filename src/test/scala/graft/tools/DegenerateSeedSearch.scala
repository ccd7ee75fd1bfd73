// dev scratch (r17): search for a degenerate IVF seed — three
// near-identical centroids whose FP pairwise sqDist pattern leaves
// super 1 with NO tagged members under the pre-fix tag rule
// (d01 < 0, d02 < d01, d12 > d02, all via the exact Vec.sqDist fold:
// (dot(a,a) + dot(b,b)) - 2.0*dot(a,b)), plus a probe vector that
// ROUTES to super 1. Prints the found doubles as exact bit literals.
// Usage: runMain graft.tools.DegenerateSeedSearch
package graft.tools
object DegenerateSeedSearch {
  def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) { acc += a(i) * b(i); i += 1 }
    acc
  }
  def d(a: Array[Double], b: Array[Double]): Double =
    dot(a, a) + dot(b, b) - 2.0 * dot(a, b)

  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val base = Array(1.7, 2.3, 3.1, 4.9)
    def perturb(): Array[Double] = base.map { x =>
      var v = x
      val k = rnd.nextInt(4)
      var i = 0
      while (i < k) {
        v = if (rnd.nextBoolean()) Math.nextUp(v) else Math.nextDown(v)
        i += 1
      }
      v
    }
    var found: (Array[Double], Array[Double], Array[Double]) = null
    var tries = 0
    while (found == null && tries < 2000000) {
      tries += 1
      val c0 = perturb(); val c1 = perturb(); val c2 = perturb()
      val d01 = d(c0, c1); val d02 = d(c0, c2); val d12 = d(c1, c2)
      if (d01 < 0 && d02 < d01 && d12 > d02) found = (c0, c1, c2)
    }
    if (found == null) { println("[search] no centroid triple found"); return }
    val (c0, c1, c2) = found
    println(s"[search] triple after $tries tries: " +
      s"d01=${d(c0, c1)} d02=${d(c0, c2)} d12=${d(c1, c2)}")
    // probe: must route to super 1 strictly (d(v,c1) < d(v,c0) and < d(v,c2))
    var probe: Array[Double] = null
    tries = 0
    while (probe == null && tries < 2000000) {
      tries += 1
      val v = perturb()
      if (d(v, c1) < d(v, c0) && d(v, c1) < d(v, c2)) probe = v
    }
    if (probe == null) { println("[search] no probe found"); return }
    println(s"[search] probe after $tries tries: " +
      s"dv0=${d(probe, c0)} dv1=${d(probe, c1)} dv2=${d(probe, c2)}")
    def lits(n: String, a: Array[Double]): Unit =
      println(s"[search] $n = Array(" + a.map(x =>
        s"java.lang.Double.longBitsToDouble(${java.lang.Double.doubleToLongBits(x)}L)")
        .mkString(", ") + ")")
    lits("c0", c0); lits("c1", c1); lits("c2", c2); lits("probe", probe)
  }
}
