package graft.tools

import graft.models.{CatsKernel, CatsVectorKernel}

/** Scalar vs Vector-API CatsKernel on the CATS model's two hot GEMM
  * shapes (`sbt "Test/runMain graft.tools.GemmBench"`):
  *
  *  - LSTM gate pre-activation: x(batch, 2*units) @ w(2*units, 4*units)
  *    with units=64 — the shape CatsModel.lstmLayer feeds gemmAcc per
  *    timestep (395 of them per direction per layer).
  *  - conv tap: x(batch, cin) @ w(cin, cout) at the widest conv
  *    (cin=64, cout=128), fed once per kernel tap.
  *
  * Median-of-7 per kernel, checksum-compared, GMAC/s reported. The
  * recorded adjudication lives in SCALE_r09.md.
  */
object GemmBench {

  private def bench(name: String, bN: Int, nJ: Int, nK: Int): Unit = {
    val rnd = new scala.util.Random(42)
    val x = Array.fill(bN)(Array.fill(nJ)(rnd.nextDouble() - 0.5))
    val w = Array.fill(nJ)(Array.fill(nK)(rnd.nextDouble() - 0.5))
    def run(k: CatsKernel, reps: Int): (Double, Double) = {
      val out = Array.fill(bN)(new Array[Double](nK))
      var s = 0.0
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { k.gemmAcc(x, w, out); s += out(0)(0); r += 1 }
      ((System.nanoTime() - t0) / 1e9, s)
    }
    val macs = bN.toLong * nJ * nK
    val reps = math.max(3, (200L * 1000 * 1000 / macs).toInt)
    run(CatsKernel.Scalar, reps); run(CatsVectorKernel, reps) // warm-up
    def med(k: CatsKernel): Double = {
      val ts = (0 until 7).map(_ => run(k, reps)._1).sorted
      ts(3)
    }
    val (tsc, sSc) = (med(CatsKernel.Scalar), run(CatsKernel.Scalar, 1)._2)
    val (tve, sVe) = (med(CatsVectorKernel), run(CatsVectorKernel, 1)._2)
    require(sSc == sVe, s"checksum drift: $sSc vs $sVe")
    val gSc = macs.toDouble * reps / tsc / 1e9
    val gVe = macs.toDouble * reps / tve / 1e9
    println(f"$name%-28s scalar ${gSc}%6.2f GMAC/s   vector ${gVe}%6.2f GMAC/s   speedup ${gVe / gSc}%4.2fx")
  }

  def main(args: Array[String]): Unit = {
    println(s"default kernel: ${if (CatsKernel.default eq CatsVectorKernel) "vector" else "scalar"}")
    bench("lstm gates b=8  (128x256)", 8, 128, 256)
    bench("lstm gates b=64 (128x256)", 64, 128, 256)
    bench("conv tap   b=8  (64x128)", 8, 64, 128)
    bench("conv tap   b=64 (64x128)", 64, 64, 128)
    bench("conv tap   b=395 (64x128)", 395, 64, 128)
  }
}
