package graft.tools

object AxpyBench {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(1)
    val n = 600
    // L1-resident: 4 weight rows (19 KB) + accumulator
    val w = Array.fill(4)(Array.fill(n)(rnd.nextDouble()))
    val g = new Array[Double](n)
    def axpyAll(): Double = {
      var j = 0
      while (j < 4) {
        val kr = w(j); val xv = j * 0.001 + 1e-9
        var k = 0
        while (k < n) { g(k) += xv * kr(k); k += 1 }
        j += 1
      }
      g(0)
    }
    var s = 0.0
    (0 until 20000).foreach(_ => s += axpyAll())
    var t0 = System.nanoTime()
    val reps = 2000000
    (0 until reps).foreach(_ => s += axpyAll())
    var dt = (System.nanoTime() - t0) / 1e9
    println(f"axpy L1: ${4.0 * n * reps / dt / 1e9}%.1f GMAC/s ($s)")
    // dot-product form, L1-resident
    val acc = new Array[Double](4)
    def dotAll(): Double = {
      var j = 0
      while (j < 4) {
        val kr = w(j); var z = 0.0
        var k = 0
        while (k < n) { z += g(k) * kr(k); k += 1 }
        acc(j) = z; j += 1
      }
      acc(0)
    }
    (0 until 20000).foreach(_ => s += dotAll())
    t0 = System.nanoTime()
    (0 until reps).foreach(_ => s += dotAll())
    dt = (System.nanoTime() - t0) / 1e9
    println(f"dot  L1: ${4.0 * n * reps / dt / 1e9}%.1f GMAC/s ($s)")
  }
}
