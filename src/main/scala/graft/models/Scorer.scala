package graft.models

/** Model-scoring abstraction for the classifier modules (SURVEY.md §7.2
  * step 7). The reference scores with sklearn/PyTorch/TF/ONNX models
  * shipped as binary artifacts; a JVM engine would run them via ONNX
  * Runtime, but that dependency is not available in this environment, so
  * scoring is factored behind [[Scorer]]:
  *
  *  - production: an ONNX-backed implementation drops in without
  *    touching any module code;
  *  - here/tests: pure-Scala evaluators below (logistic, random forest,
  *    isolation forest) with deterministic parameters.
  *
  * The tree evaluators are real implementations — given the reference's
  * exported tree parameters they reproduce sklearn semantics — only the
  * *parameters* are stand-ins.
  */
trait Scorer extends Serializable {
  def score(features: Array[Double]): Double
}

/** Marker wrapper for deterministic stand-in parameters (every
  * [[StubModels]] product) — operators surface engagement as a
  * `*_is_stub` sibling column so a stand-in can never silently pose as
  * a trained model.
  */
final case class StandIn(inner: Scorer) extends Scorer {
  def score(features: Array[Double]): Double = inner.score(features)
}

object Scorer {
  def isStandIn(s: Scorer): Boolean = s.isInstanceOf[StandIn]
}

/** Logistic regression: sigmoid(w . x + b). */
final case class LogisticScorer(weights: Array[Double], bias: Double) extends Scorer {
  def score(x: Array[Double]): Double = {
    var z = bias
    var i = 0
    while (i < weights.length && i < x.length) { z += weights(i) * x(i); i += 1 }
    1.0 / (1.0 + math.exp(-z))
  }
}

/** Binary decision tree in flat-array form (sklearn's tree_ layout):
  * children index -1 marks a leaf; `value` holds the leaf output.
  */
final case class DecisionTree(feature: Array[Int], threshold: Array[Double],
    left: Array[Int], right: Array[Int], value: Array[Double]) extends Serializable {
  def eval(x: Array[Double]): Double = {
    var node = 0
    while (left(node) != -1) {
      node = if (x(feature(node)) <= threshold(node)) left(node) else right(node)
    }
    value(node)
  }

  /** Leaf depth reached by x (for isolation forests). */
  def pathLength(x: Array[Double]): Int = {
    var node = 0
    var depth = 0
    while (left(node) != -1) {
      node = if (x(feature(node)) <= threshold(node)) left(node) else right(node)
      depth += 1
    }
    depth
  }
}

/** Random forest: mean of tree outputs (sklearn regressor/proba form). */
final case class RandomForestScorer(trees: Array[DecisionTree]) extends Scorer {
  def score(x: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < trees.length) { s += trees(i).eval(x); i += 1 }
    s / trees.length
  }
}

/** Isolation forest with sklearn's decision_function convention:
  * negative = more anomalous (score = 0.5 - 2^(-E[h]/c(n))).
  */
final case class IsolationForestScorer(trees: Array[DecisionTree],
    subSampleSize: Int) extends Scorer {
  private val cn = IsolationForestScorer.averagePathLength(subSampleSize)

  def score(x: Array[Double]): Double = {
    var h = 0.0
    var i = 0
    while (i < trees.length) { h += trees(i).pathLength(x); i += 1 }
    val eh = h / trees.length
    0.5 - math.pow(2.0, -eh / cn)
  }
}

object IsolationForestScorer {
  /** c(n): average path length of unsuccessful BST search (sklearn's
    * _average_path_length small-n special cases included).
    */
  def averagePathLength(n: Int): Double =
    if (n <= 1) 0.0
    else if (n == 2) 1.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n
}

/** Deterministic stand-in parameters derived from a name — NOT a trained
  * model; a clearly-marked placeholder so pipelines are runnable and
  * reproducible offline. Swap for real exported parameters in
  * production.
  */
object StubModels {

  private def rng(name: String) =
    new java.util.Random(name.hashCode.toLong * 0x9e3779b97f4a7c15L)

  def logistic(name: String, nFeatures: Int): StandIn = {
    val r = rng(name)
    StandIn(LogisticScorer(Array.fill(nFeatures)(r.nextGaussian() * 0.5), r.nextGaussian()))
  }

  /** Small random-split forest over nFeatures in [lo, hi] value range. */
  def forest(name: String, nFeatures: Int, nTrees: Int = 16,
      depth: Int = 4): StandIn = {
    val r = rng(name)
    StandIn(RandomForestScorer(Array.fill(nTrees)(randomTree(r, nFeatures, depth))))
  }

  def isolationForest(name: String, nFeatures: Int, nTrees: Int = 32,
      depth: Int = 8): StandIn = {
    val r = rng(name)
    StandIn(IsolationForestScorer(
      Array.fill(nTrees)(randomTree(r, nFeatures, depth)), 256))
  }

  /** Deterministic stand-in SEQUENCE classifier: masked mean-pool over
    * the timestep channels (ignoring the -999 padding) into a softmax —
    * a placeholder for CNN/RNN sequence models whose weight formats
    * have no in-repo reader (CATS TensorFlow). Runs over the REAL input
    * tensor so the preprocessing contract is exercised end-to-end.
    */
  def seqSoftmax(name: String, nClasses: Int): Array[Array[Float]] => Array[Double] = {
    val r = rng(name)
    val w = Array.fill(nClasses)(Array.fill(4)(r.nextGaussian() * 0.5))
    (x: Array[Array[Float]]) => {
      val pooled = new Array[Double](4)
      var n = 0
      x.foreach { row =>
        if (row(0) != -999f) {
          var j = 0
          while (j < 4) { pooled(j) += row(j); j += 1 }
          n += 1
        }
      }
      if (n > 0) { var j = 0; while (j < 4) { pooled(j) /= n; j += 1 } }
      val logits = w.map(wc => wc.indices.map(j => wc(j) * pooled(j)).sum)
      val mx = logits.max
      val exps = logits.map(z => math.exp(z - mx))
      val s = exps.sum
      exps.map(_ / s)
    }
  }

  private def randomTree(r: java.util.Random, nFeatures: Int, depth: Int): DecisionTree = {
    val nNodes = (1 << (depth + 1)) - 1
    val feature = new Array[Int](nNodes)
    val threshold = new Array[Double](nNodes)
    val left = Array.fill(nNodes)(-1)
    val right = Array.fill(nNodes)(-1)
    val value = new Array[Double](nNodes)
    var i = 0
    while (i < nNodes) {
      if (2 * i + 2 < nNodes) {
        feature(i) = r.nextInt(nFeatures)
        threshold(i) = r.nextGaussian()
        left(i) = 2 * i + 1
        right(i) = 2 * i + 2
      }
      value(i) = r.nextDouble()
      i += 1
    }
    DecisionTree(feature, threshold, left, right, value)
  }
}
