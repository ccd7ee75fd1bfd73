package graft.models

/** SuperNNova "vanilla" classifier runtime — the RNN behind snn_ia /
  * snn_sn_vs_all (reference: ztf/snn/processor.py:84-210, which calls
  * supernnova.validation.validate_onthefly.classify_lcs on the bundled
  * model.pt + data_norm.json).
  *
  * Architecture (cli_args.json of the bundled models): 2-layer
  * bidirectional LSTM, hidden 32, mean-pooled over time, linear output
  * to 2 classes, softmax. Input features per timestep (8 for the
  * 2-filter ZTF models): FLUXCAL_g, FLUXCAL_r, FLUXCALERR_g,
  * FLUXCALERR_r, delta_time — log-standardized with the stored
  * (min, mean, std) — then the one-hot filter-combination flags
  * (g, gr, r), unnormalized.
  */
final class SnnModel(
    val layers: Array[SnnModel.LstmLayer], // (fwd, rev) per layer
    val outW: Array[Array[Float]], val outB: Array[Float],
    val norm: Map[String, (Double, Double, Double)]) extends Serializable {

  import SnnModel._

  /** SuperNNova log-standardization: (ln(clip(x, min) - min + 1e-5) - mean)/std. */
  def logNorm(feature: String, x: Double): Double = {
    val (min, mean, std) = norm(feature)
    (math.log(math.max(x, min) - min + 1e-5) - mean) / std
  }

  /** Forward pass over a [seqLen x inputDim] matrix; returns class
    * probabilities (softmax over the output layer of the mean-pooled
    * bidirectional states).
    */
  def forward(x: Array[Array[Double]]): Array[Double] = {
    require(x.forall(_.length == layers(0).fwd.weightIh(0).length),
      s"input dim ${x(0).length} != model input ${layers(0).fwd.weightIh(0).length}")
    var seq: Array[Array[Double]] = x
    for (layer <- layers) {
      val fwd = runDirection(layer.fwd, seq, reverse = false)
      val rev = runDirection(layer.rev, seq, reverse = true)
      seq = Array.tabulate(seq.length)(t => fwd(t) ++ rev(t))
    }
    val h = seq
    val d = h(0).length
    val mean = new Array[Double](d)
    for (t <- h.indices; j <- 0 until d) mean(j) += h(t)(j) / h.length
    val logits = Array.tabulate(outB.length) { c =>
      var z = outB(c).toDouble
      var j = 0
      while (j < d) { z += outW(c)(j) * mean(j); j += 1 }
      z
    }
    val mx = logits.max
    val exps = logits.map(z => math.exp(z - mx))
    val s = exps.sum
    exps.map(_ / s)
  }

  private def runDirection(dir: LstmDirection, seq: Array[Array[Double]],
      reverse: Boolean): Array[Array[Double]] = {
    val hdim = dir.hiddenDim
    val out = new Array[Array[Double]](seq.length)
    val hState = new Array[Double](hdim)
    val cState = new Array[Double](hdim)
    val order = if (reverse) seq.indices.reverse else seq.indices
    for (t <- order) {
      val xt = seq(t)
      // PyTorch gate order: input, forget, cell(g), output
      val gates = new Array[Double](4 * hdim)
      var g = 0
      while (g < 4 * hdim) {
        var z = dir.biasIh(g).toDouble + dir.biasHh(g)
        val wi = dir.weightIh(g)
        var j = 0
        while (j < xt.length) { z += wi(j) * xt(j); j += 1 }
        val wh = dir.weightHh(g)
        j = 0
        while (j < hdim) { z += wh(j) * hState(j); j += 1 }
        gates(g) = z
        g += 1
      }
      var k = 0
      while (k < hdim) {
        val i = sigmoid(gates(k))
        val f = sigmoid(gates(hdim + k))
        val gg = math.tanh(gates(2 * hdim + k))
        val o = sigmoid(gates(3 * hdim + k))
        cState(k) = f * cState(k) + i * gg
        hState(k) = o * math.tanh(cState(k))
        k += 1
      }
      out(t) = hState.clone()
    }
    out
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))
}

object SnnModel {

  final class LstmDirection(val weightIh: Array[Array[Float]],
      val weightHh: Array[Array[Float]], val biasIh: Array[Float],
      val biasHh: Array[Float]) extends Serializable {
    def hiddenDim: Int = biasIh.length / 4
  }
  final class LstmLayer(val fwd: LstmDirection, val rev: LstmDirection)
    extends Serializable

  /** Load model.pt (legacy torch state_dict) + data_norm.json. */
  def load(modelDir: String): SnnModel = {
    val sd = TorchReader.stateDict(TorchReader.load(s"$modelDir/model.pt"))
    def mat(name: String): Array[Array[Float]] = {
      val t = sd(name)
      val flat = t.floats
      val Vector(r, c) = t.size
      Array.tabulate(r)(i => java.util.Arrays.copyOfRange(flat, i * c, (i + 1) * c))
    }
    def vec(name: String): Array[Float] = sd(name).floats

    val nLayers = sd.keys.count(k => k.startsWith("rnn_layer.weight_ih_l") &&
      !k.endsWith("_reverse"))
    val layers = Array.tabulate(nLayers) { l =>
      new LstmLayer(
        new LstmDirection(mat(s"rnn_layer.weight_ih_l$l"),
          mat(s"rnn_layer.weight_hh_l$l"),
          vec(s"rnn_layer.bias_ih_l$l"), vec(s"rnn_layer.bias_hh_l$l")),
        new LstmDirection(mat(s"rnn_layer.weight_ih_l${l}_reverse"),
          mat(s"rnn_layer.weight_hh_l${l}_reverse"),
          vec(s"rnn_layer.bias_ih_l${l}_reverse"),
          vec(s"rnn_layer.bias_hh_l${l}_reverse")))
    }
    new SnnModel(layers, mat("output_layer.weight"), vec("output_layer.bias"),
      parseNorm(s"$modelDir/data_norm.json"))
  }

  /** data_norm.json: {"FEATURE": {"mean": m, "min": lo, "std": s}, ...} —
    * flat two-level JSON of numbers, parsed without a JSON library.
    */
  def parseNorm(path: String): Map[String, (Double, Double, Double)] = {
    val text = {
      val src = scala.io.Source.fromFile(path)
      try src.mkString finally src.close()
    }
    val entry = """"([A-Za-z_]+)"\s*:\s*\{([^}]*)\}""".r
    val num = """"(mean|min|std)"\s*:\s*(-?[0-9.eE+]+)""".r
    entry.findAllMatchIn(text).map { m =>
      val vals = num.findAllMatchIn(m.group(2))
        .map(n => n.group(1) -> n.group(2).toDouble).toMap
      m.group(1) -> (vals("min"), vals("mean"), vals("std"))
    }.toMap
  }
}
