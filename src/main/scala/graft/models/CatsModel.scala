package graft.models

import java.util.zip.ZipFile

import graft.models.Hdf5Reader.Tensor

/** Native runtime for the reference's bundled CATS broad classifier
  * (rubin/cats/processor.py:36-38 loads the TF SavedModel; the sibling
  * `cats_small_nometa_serial.keras` archive carries byte-identical
  * weights plus the architecture JSON, which is what we parse here).
  *
  * Architecture (config.json of the serial archive): two branches over
  * the (395, 4) light-curve tensor —
  *
  *  - CNN: 3x [Conv1D(k=2, same) -> BatchNorm(eps 1e-3) -> swish ->
  *    squeeze-excitation (GlobalAvgPool -> Dense(C/16, relu, no bias)
  *    -> Dense(C, sigmoid, no bias) -> channel-scale)] with widths
  *    64 -> 128 -> 256, then GlobalMaxPool over time;
  *  - RNN: BiLSTM(50, return sequences) -> BiLSTM(150, last state);
  *
  * concat([rnn(300), cnn(256)]) -> Dense(176) -> LeakyReLU(0.3) ->
  * Dense(5) -> softmax. Dropout layers are inference no-ops.
  *
  * The forward pass is computed in double precision over the float32
  * weights; class probabilities differ from TF's float32 execution only
  * at the ~1e-6 level (pinned against an independent NumPy evaluation of
  * the same archive in CatsModelSpec).
  */
final class CatsModel(w: Map[String, Tensor]) extends Serializable {
  import CatsModel._

  private def mat(name: String): Array[Array[Float]] = w(name).matrix
  private def vec(name: String): Array[Float] = w(name).vector

  private val convs = Array.tabulate(3) { i =>
    val base = if (i == 0) "conv1d" else s"conv1d_$i"
    val k = w(s"/layers/$base/vars/0") // (kernel=2, in, out)
    require(k.shape(0) == 2, s"conv kernel ${k.shape.toList}")
    (k.shape(1), k.shape(2), k.data.map(_.toDouble),
      vec(s"/layers/$base/vars/1").map(_.toDouble))
  }
  private val bns = Array.tabulate(3) { i =>
    val base = if (i == 0) "batch_normalization" else s"batch_normalization_$i"
    (vec(s"/layers/$base/vars/0"), vec(s"/layers/$base/vars/1"),
      vec(s"/layers/$base/vars/2"), vec(s"/layers/$base/vars/3"))
  }
  // squeeze-excitation dense pairs (no bias): (64->4->64), (128->8->128), (256->16->256)
  private val seDense = Array.tabulate(3) { i =>
    (mat(s"/layers/dense_${2 * i}/vars/0".replace("dense_0", "dense"))
        .map(_.map(_.toDouble)),
      mat(s"/layers/dense_${2 * i + 1}/vars/0").map(_.map(_.toDouble)))
  }
  private val lstm1 = BiLstm(loadCell(w, "bidirectional/forward_layer"),
    loadCell(w, "bidirectional/backward_layer"))
  private val lstm2 = BiLstm(loadCell(w, "bidirectional_1/forward_layer"),
    loadCell(w, "bidirectional_1/backward_layer"))
  private val headW = mat("/layers/dense_6/vars/0").map(_.map(_.toDouble))
  private val headB = vec("/layers/dense_6/vars/1").map(_.toDouble)
  private val outW = mat("/layers/dense_7/vars/0").map(_.map(_.toDouble))
  private val outB = vec("/layers/dense_7/vars/1").map(_.toDouble)

  /** Classify one padded (seqLen x 4) input tensor (CATS preprocessing,
    * Rubin.catsInputTensor); returns the 5 softmax probabilities.
    */
  def forward(x: Array[Array[Float]]): Array[Double] = {
    val steps = x.length
    var a: Array[Array[Double]] = x.map(_.map(_.toDouble))

    // ---- CNN branch ----
    var cnn: Array[Array[Double]] = a
    for (b <- 0 until 3) {
      val (in, outC, kdata, bias) = convs(b)
      val conv = Array.ofDim[Double](steps, outC)
      var t = 0
      while (t < steps) {
        val row = conv(t)
        var c = 0
        while (c < outC) { row(c) = bias(c); c += 1 }
        var dt = 0
        while (dt < 2) { // 'same' padding for k=2: taps t and t+1, zero past the end
          if (t + dt < steps) {
            val xt = cnn(t + dt)
            var j = 0
            while (j < in) {
              val xv = xt(j)
              val kOff = (dt * in + j) * outC
              c = 0
              while (c < outC) { row(c) += xv * kdata(kOff + c); c += 1 }
              j += 1
            }
          }
          dt += 1
        }
        t += 1
      }
      val (gamma, beta, mean, variance) = bns(b)
      val scale = Array.tabulate(outC)(c =>
        gamma(c) / math.sqrt(variance(c).toDouble + 1e-3))
      val shift = Array.tabulate(outC)(c => beta(c).toDouble - mean(c) * scale(c))
      t = 0
      while (t < steps) {
        val row = conv(t)
        var c = 0
        while (c < outC) {
          val z = row(c) * scale(c) + shift(c)
          row(c) = z / (1.0 + math.exp(-z)) // swish
          c += 1
        }
        t += 1
      }
      // squeeze-excitation: mean over ALL timesteps (no masking), two
      // bias-free denses, per-channel sigmoid gate
      val pooled = new Array[Double](outC)
      t = 0
      while (t < steps) {
        val row = conv(t)
        var c = 0
        while (c < outC) { pooled(c) += row(c); c += 1 }
        t += 1
      }
      var c = 0
      while (c < outC) { pooled(c) /= steps; c += 1 }
      val (w1, w2) = seDense(b)
      val hid = Array.tabulate(w1(0).length) { h =>
        var z = 0.0; var j = 0
        while (j < outC) { z += pooled(j) * w1(j)(h); j += 1 }
        math.max(z, 0.0)
      }
      val gate = Array.tabulate(outC) { g =>
        var z = 0.0; var j = 0
        while (j < hid.length) { z += hid(j) * w2(j)(g); j += 1 }
        1.0 / (1.0 + math.exp(-z))
      }
      t = 0
      while (t < steps) {
        val row = conv(t)
        c = 0
        while (c < outC) { row(c) *= gate(c); c += 1 }
        t += 1
      }
      cnn = conv
    }
    val cnnOut = new Array[Double](cnn(0).length)
    java.util.Arrays.fill(cnnOut, Double.NegativeInfinity)
    for (t <- 0 until steps; c <- cnnOut.indices)
      if (cnn(t)(c) > cnnOut(c)) cnnOut(c) = cnn(t)(c)

    // ---- RNN branch ----
    val h1 = lstm1.sequences(a)
    val rnnOut = lstm2.lastState(h1)

    // ---- head ----
    val cat = rnnOut ++ cnnOut
    val hidden = Array.tabulate(headB.length) { h =>
      var z = headB(h); var j = 0
      while (j < cat.length) { z += cat(j) * headW(j)(h); j += 1 }
      if (z >= 0) z else 0.3 * z // LeakyReLU(alpha=0.3)
    }
    val logits = Array.tabulate(outB.length) { c =>
      var z = outB(c); var j = 0
      while (j < hidden.length) { z += hidden(j) * outW(j)(c); j += 1 }
      z
    }
    val mx = logits.max
    val exps = logits.map(z => math.exp(z - mx))
    val s = exps.sum
    exps.map(_ / s)
  }
}

object CatsModel {

  /** One Keras LSTM cell: kernel (in, 4u), recurrent (u, 4u), bias (4u);
    * gate column order i, f, c-candidate, o.
    */
  final case class LstmCell(kernel0: Array[Array[Float]],
      recurrent0: Array[Array[Float]], bias0: Array[Float]) extends Serializable {
    // pre-widened to double once: the step loops would otherwise pay a
    // float->double conversion on every multiply-accumulate
    private val kernel: Array[Array[Double]] = kernel0.map(_.map(_.toDouble))
    private val recurrent: Array[Array[Double]] = recurrent0.map(_.map(_.toDouble))
    private val bias: Array[Double] = bias0.map(_.toDouble)
    val units: Int = recurrent0.length

    /** Run over the sequence (optionally reversed); returns all hidden
      * states in PROCESSING order.
      */
    def run(x: Array[Array[Double]], reverse: Boolean): Array[Array[Double]] = {
      val n = x.length
      val h = new Array[Double](units)
      val c = new Array[Double](units)
      val out = new Array[Array[Double]](n)
      val gates = new Array[Double](4 * units)
      var step = 0
      while (step < n) {
        val xt = x(if (reverse) n - 1 - step else step)
        var g = 0
        while (g < 4 * units) { gates(g) = bias(g); g += 1 }
        var j = 0
        while (j < xt.length) {
          val xv = xt(j); val kr = kernel(j)
          g = 0
          while (g < 4 * units) { gates(g) += xv * kr(g); g += 1 }
          j += 1
        }
        j = 0
        while (j < units) {
          val hv = h(j); val rr = recurrent(j)
          g = 0
          while (g < 4 * units) { gates(g) += hv * rr(g); g += 1 }
          j += 1
        }
        var u = 0
        while (u < units) {
          val i = 1.0 / (1.0 + math.exp(-gates(u)))
          val f = 1.0 / (1.0 + math.exp(-gates(units + u)))
          val cand = math.tanh(gates(2 * units + u))
          val o = 1.0 / (1.0 + math.exp(-gates(3 * units + u)))
          c(u) = f * c(u) + i * cand
          h(u) = o * math.tanh(c(u))
          u += 1
        }
        out(step) = h.clone()
        step += 1
      }
      out
    }
  }

  final case class BiLstm(fwd: LstmCell, bwd: LstmCell) extends Serializable {
    /** return_sequences=true: per-step [fwd(t) ++ bwd(t)] with the
      * backward outputs restored to forward time order (Keras
      * Bidirectional concat merge).
      */
    def sequences(x: Array[Array[Double]]): Array[Array[Double]] = {
      val f = fwd.run(x, reverse = false)
      val b = bwd.run(x, reverse = true)
      val n = x.length
      Array.tabulate(n)(t => f(t) ++ b(n - 1 - t))
    }

    /** return_sequences=false: [last fwd state ++ last bwd state]. */
    def lastState(x: Array[Array[Double]]): Array[Double] = {
      val f = fwd.run(x, reverse = false)
      val b = bwd.run(x, reverse = true)
      f.last ++ b.last
    }
  }

  private def loadCell(w: Map[String, Tensor], base: String): LstmCell =
    LstmCell(w(s"/layers/$base/cell/vars/0").matrix,
      w(s"/layers/$base/cell/vars/1").matrix,
      w(s"/layers/$base/cell/vars/2").vector)

  /** Load from a Keras v3 `.keras` archive (a zip holding
    * model.weights.h5).
    */
  def load(kerasPath: String): CatsModel = {
    val zf = new ZipFile(kerasPath)
    try {
      val entry = zf.getEntry("model.weights.h5")
      require(entry != null, s"$kerasPath has no model.weights.h5")
      val in = zf.getInputStream(entry)
      val bytes = in.readAllBytes()
      in.close()
      new CatsModel(Hdf5Reader.read(bytes))
    } finally zf.close()
  }
}
