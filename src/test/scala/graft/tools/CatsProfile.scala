package graft.tools

/** Micro-profile of the CATS forward pass: per-row vs batched.
  * Run: sbt "Test/runMain graft.tools.CatsProfile [batchRows]"
  */
object CatsProfile {
  def main(args: Array[String]): Unit = {
    val b = if (args.nonEmpty) args(0).toInt else 16
    val model = graft.models.RefModels.cats.getOrElse(
      sys.error("cats model archive absent"))
    val rnd = new scala.util.Random(7)
    def tensor(): Array[Array[Float]] = {
      val mjd = Array.tabulate(60)(i => 60000.0 + i * 3.0)
      val flux = Array.fill(60)(rnd.nextDouble() * 100)
      val err = flux.map(_ * 0.05)
      val band = Array.fill(60)("gri".charAt(rnd.nextInt(3)).toString)
      graft.operators.Rubin.catsInputTensor(mjd, flux, err, band)
    }
    val xs = Array.fill(b)(tensor())
    // warm-up
    (0 until 3).foreach(_ => model.forward(xs(0)))
    var t0 = System.nanoTime()
    val single = xs.map(model.forward)
    val tSingle = (System.nanoTime() - t0) / 1e6
    println(f"per-row:  ${tSingle}%.1f ms total, ${tSingle / b}%.1f ms/row (n=$b)")
    single.foreach(p => assert(math.abs(p.sum - 1.0) < 1e-9))
    model.forwardBatch(xs) // warm
    t0 = System.nanoTime()
    val batch = model.forwardBatch(xs)
    val tBatch = (System.nanoTime() - t0) / 1e6
    println(f"batched:  ${tBatch}%.1f ms total, ${tBatch / b}%.1f ms/row " +
      f"(${tSingle / tBatch}%.1fx)")
    val identical = single.zip(batch).forall { case (a, c) =>
      a.zip(c).forall { case (x, y) => x == y } }
    println(s"bit-identical: $identical")
    assert(identical, "forwardBatch diverged from forward")
  }
}
