package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.models.{RefModels, SnnFeatures, SnnModel, TorchReader}

/** Pins the torch reader + LSTM forward pass against probabilities from
  * an independent Python/numpy implementation run on the same real
  * weights and the same LCG-generated inputs (goldens inline).
  */
class SnnModelSpec extends AnyFunSuite {

  private val modelDir = RefModels.dir + "/snn_models/snn_snia_vs_nonia"
  private def available = new java.io.File(modelDir, "model.pt").isFile

  private final class Lcg(seed: Long) {
    private var x = seed & Long.MaxValue
    def next(): Double = {
      x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue
      x.toDouble / (1L << 62).toDouble - 1.0
    }
  }

  test("state dict: 2-layer bi-LSTM(32) + 2-class output layer") {
    assume(available)
    val sd = TorchReader.stateDict(TorchReader.load(s"$modelDir/model.pt"))
    assert(sd("rnn_layer.weight_ih_l0").size === Vector(128, 8))
    assert(sd("rnn_layer.weight_ih_l1").size === Vector(128, 64))
    assert(sd("output_layer.weight").size === Vector(2, 64))
    assert(sd.contains("rnn_layer.weight_hh_l1_reverse"))
  }

  test("forward pass matches the independent numpy evaluation") {
    assume(available)
    val model = SnnModel.load(modelDir)
    val lcg = new Lcg(777L)
    val golden = Map(
      1 -> (0.4954792195133189, 0.504520780486681),
      4 -> (0.5075556925090557, 0.49244430749094414),
      9 -> (0.5000995542523031, 0.49990044574769693))
    for (seqLen <- Seq(1, 4, 9)) {
      val x = Array.fill(seqLen)(Array.fill(8)(lcg.next()))
      val p = model.forward(x)
      val (g0, g1) = golden(seqLen)
      assert(math.abs(p(0) - g0) < 1e-9, s"len $seqLen p0 ${p(0)}")
      assert(math.abs(p(1) - g1) < 1e-9, s"len $seqLen p1 ${p(1)}")
    }
  }

  test("data_norm log-standardization round-trips the stored stats") {
    assume(available)
    val model = SnnModel.load(modelDir)
    // x chosen so ln(x - min + 1e-5) == mean -> normalized 0
    val (min, mean, _) = (-1300.2288818359375, 7.231179714202881, 0.1645582616329193)
    val x = math.exp(mean) + min - 1e-5
    assert(math.abs(model.logNorm("FLUXCAL_g", x)) < 1e-9)
    // below-min values clip to the min
    assert(model.logNorm("FLUXCAL_g", min - 100) ===
      model.logNorm("FLUXCAL_g", min))
  }

  test("night grouping merges same-night filters into one timestep") {
    assume(available)
    val jd = Array(2460000.6, 2460000.7, 2460004.6) // first two same MJD night
    val fid = Array(1, 2, 1)
    val mag = Array(18.0, 18.5, 19.0)
    val sig = Array(0.05, 0.07, 0.1)
    val steps = SnnFeatures.timesteps(jd, fid, mag, sig, Seq("g", "r"))
    assert(steps.length === 2)
    assert(steps(0).flux.keySet === Set("g", "r"))
    assert(steps(1).flux.keySet === Set("g"))
    val model = SnnModel.load(modelDir)
    val m = SnnFeatures.featureMatrix(model, steps, Seq("g", "r"))
    assert(m.length === 2)
    assert(m(0).length === 8)
    // one-hot (g, gr, r): first step is the "gr" combo
    assert(m(0).slice(5, 8).toSeq === Seq(0.0, 1.0, 0.0))
    assert(m(1).slice(5, 8).toSeq === Seq(1.0, 0.0, 0.0))
  }

  test("elasticc zip-format model loads with 6-filter input layout") {
    val dir = RefModels.dir + "/snn_models/elasticc_binary_broad/SN_vs_other"
    assume(new java.io.File(dir, "model.pt").isFile)
    val sd = TorchReader.stateDict(TorchReader.load(s"$dir/model.pt"))
    // 13 photometric features + filter-combination one-hots
    val inDim = sd("rnn_layer.weight_ih_l0").size(1)
    assert(inDim > 13)
    assert(sd("output_layer.weight").size(0) === 2)
  }
}
