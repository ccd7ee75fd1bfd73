package graft.tools

/** Diagnostic: per-feature-index split-threshold range of the bundled
  * microlensing forest vs the observed range of our LiaFeatures
  * reconstruction over a diverse synthetic light-curve ensemble.
  * Run: sbt "Test/runMain graft.tools.LiaThresholds"
  */
object LiaThresholds {
  def main(args: Array[String]): Unit = {
    val forest = graft.models.RefModels.mulensForest.getOrElse(
      sys.error("rf.sav absent"))
    val nf = graft.kernels.LiaFeatures.Count
    val thrMin = Array.fill(nf)(Double.PositiveInfinity)
    val thrMax = Array.fill(nf)(Double.NegativeInfinity)
    val nSplits = new Array[Long](nf)
    forest.trees.foreach { t =>
      t.feature.indices.foreach { n =>
        if (t.left(n) != -1) {
          val f = t.feature(n).toInt
          nSplits(f) += 1
          if (t.threshold(n) < thrMin(f)) thrMin(f) = t.threshold(n)
          if (t.threshold(n) > thrMax(f)) thrMax(f) = t.threshold(n)
        }
      }
    }
    // diverse ensemble: flat, noisy, bumps of several amplitudes,
    // trends, periodic, dense/sparse
    val rnd = new scala.util.Random(11)
    val obsMin = Array.fill(nf)(Double.PositiveInfinity)
    val obsMax = Array.fill(nf)(Double.NegativeInfinity)
    for (trial <- 0 until 400) {
      val n = 10 + rnd.nextInt(90)
      val kind = trial % 8
      val base = 14.0 + rnd.nextDouble() * 8.0
      val noise = 0.01 + rnd.nextDouble() * 0.3
      val mag = Array.tabulate(n) { i =>
        val t = i.toDouble / n
        val shape = kind match {
          case 0 => 0.0
          case 1 => 0.0
          case 2 => -(0.5 + 4.0 * rnd.nextDouble()) *
            math.exp(-math.pow((t - 0.5) / 0.1, 2)) // microlens-ish bump
          case 3 => -(2.0 * rnd.nextDouble()) *
            math.exp(-math.pow((t - 0.3) / 0.05, 2))
          case 4 => 2.0 * (t - 0.5) // trend
          case 5 => 0.8 * math.sin(t * 20.0) // periodic
          case 6 => if (rnd.nextDouble() < 0.1) -3.0 else 0.0 // outliers
          case _ => -5.0 * math.exp(-math.pow((t - 0.5) / 0.2, 2)) // deep
        }
        base + shape + rnd.nextGaussian() * noise
      }
      val err = Array.fill(n)(0.01 + rnd.nextDouble() * 0.2)
      val f = graft.kernels.LiaFeatures.extractAll(mag, err)
      f.indices.foreach { i =>
        if (f(i) < obsMin(i)) obsMin(i) = f(i)
        if (f(i) > obsMax(i)) obsMax(i) = f(i)
      }
    }
    println(f"${"idx"}%4s ${"splits"}%7s ${"thrMin"}%12s ${"thrMax"}%12s ${"obsMin"}%12s ${"obsMax"}%12s  flag")
    for (i <- 0 until nf) {
      val flag =
        if (nSplits(i) == 0) "never-split"
        else if (obsMin(i) > thrMax(i)) "OBS-ABOVE-ALL-THR"
        else if (obsMax(i) < thrMin(i)) "OBS-BELOW-ALL-THR"
        else "ok"
      println(f"$i%4d ${nSplits(i)}%7d ${thrMin(i)}%12.4g ${thrMax(i)}%12.4g ${obsMin(i)}%12.4g ${obsMax(i)}%12.4g  $flag")
    }
  }
}
