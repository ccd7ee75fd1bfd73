package graft.models

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

/** Reader for XGBoost's UBJSON model snapshot (the `save_raw("ubj")`
  * bytes a pickled `xgboost.core.Booster` carries in its `handle`
  * field), plus a pure-Scala gbtree evaluator.
  *
  * Both formats are public: UBJSON is an open spec (ubjson.org; draft
  * 12 — big-endian scalars, `[$type#count` optimized containers) and
  * the XGBoost model schema is documented in the project's
  * doc/model.schema (trees as flat `left_children`/`right_children`/
  * `split_indices`/`split_conditions` arrays; leaves store their value
  * in `split_conditions`; `default_left` routes missing values;
  * `binary:logistic` applies `sigmoid(logit(base_score) + sum(leaves))`).
  *
  * The reference scores its superluminous module with exactly such a
  * bundled artifact (ztf/superluminous/processor.py:225-235,
  * superluminous_classifier.joblib).
  */
object Ubjson {

  /** Parse one UBJSON value. Objects become LinkedHashMap[String, Any];
    * untyped arrays Vector[Any]; strongly-typed arrays decode to the
    * matching primitive Array (Float kept as Float — XGBoost writes f32
    * splits and the comparison semantics depend on it).
    */
  def parse(bytes: Array[Byte]): Any = {
    val p = new Parser(bytes)
    p.value(p.marker())
  }

  private final class Parser(b: Array[Byte]) {
    private var i = 0
    private val bb = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)

    def marker(): Byte = { val m = b(i); i += 1; m }
    private def peek: Byte = b(i)

    private def i8(): Int = { val v = b(i); i += 1; v.toInt }
    private def u8(): Int = { val v = b(i) & 0xff; i += 1; v }
    private def i16(): Int = { val v = bb.getShort(i); i += 2; v.toInt }
    private def i32(): Int = { val v = bb.getInt(i); i += 4; v }
    private def i64(): Long = { val v = bb.getLong(i); i += 8; v }
    private def f32(): Float = { val v = bb.getFloat(i); i += 4; v }
    private def f64(): Double = { val v = bb.getDouble(i); i += 8; v }

    private def length(): Int = (value(marker()): @unchecked) match {
      case n: Int => n
      case n: Long => n.toInt
    }

    private def str(): String = {
      val n = length()
      val s = new String(b, i, n, "UTF-8")
      i += n
      s
    }

    def value(m: Byte): Any = m match {
      case 'i' => i8()
      case 'U' => u8()
      case 'I' => i16()
      case 'l' => i32()
      case 'L' => i64()
      case 'd' => f32()
      case 'D' => f64()
      case 'S' => str()
      case 'T' => true
      case 'F' => false
      case 'Z' => null
      case '{' => obj()
      case '[' => arr()
      case other => sys.error(s"ubjson: unsupported marker '${other.toChar}' at offset $i")
    }

    private def obj(): mutable.LinkedHashMap[String, Any] = {
      val out = new mutable.LinkedHashMap[String, Any]()
      while (peek != '}') out += (str() -> value(marker()))
      i += 1
      out
    }

    private def arr(): Any = {
      var tpe: Byte = 0
      var count = -1
      if (peek == '$') { i += 1; tpe = marker() }
      if (peek == '#') { i += 1; count = length() }
      if (tpe != 0) {
        require(count >= 0, "ubjson: typed array without count")
        (tpe: @unchecked) match {
          case 'd' => Array.fill(count)(f32())
          case 'D' => Array.fill(count)(f64())
          case 'l' => Array.fill(count)(i32())
          case 'L' => Array.fill(count)(i64())
          case 'i' => Array.fill(count)(i8())
          case 'U' => Array.fill(count)(u8())
          case 'I' => Array.fill(count)(i16())
        }
      } else if (count >= 0) {
        Vector.fill(count)(value(marker()))
      } else {
        val buf = Vector.newBuilder[Any]
        while (peek != ']') buf += value(marker())
        i += 1
        buf.result()
      }
    }
  }
}

/** One gbtree regression tree in XGBoost's flat-array layout. Arrays are
  * parallel over node id; `left == -1` marks a leaf whose value sits in
  * `cond`. Missing features (NaN) follow `defaultLeft`.
  */
final case class XgbTree(splitIndex: Array[Int], cond: Array[Float],
    left: Array[Int], right: Array[Int], defaultLeft: Array[Boolean])
    extends Serializable {
  /** Leaf value for x (margin contribution). Inputs are compared in f32,
    * matching XGBoost's DMatrix representation.
    */
  def eval(x: Array[Double]): Float = {
    var node = 0
    while (left(node) != -1) {
      val f = x(splitIndex(node)).toFloat
      node =
        if (java.lang.Float.isNaN(f)) { if (defaultLeft(node)) left(node) else right(node) }
        else if (f < cond(node)) left(node)
        else right(node)
    }
    cond(node)
  }
}

/** Binary-logistic gbtree ensemble: sigmoid(logit(base) + sum of leaf
  * values). `featureNames` gives the training column order (the
  * reference selects `features[clf.feature_names_in_]` before scoring);
  * `optimalThreshold` is the classifier's bundled decision threshold.
  */
final case class XgbBinaryModel(trees: Array[XgbTree], baseScore: Double,
    featureNames: Vector[String], optimalThreshold: Double) extends Scorer {

  private val baseMargin = math.log(baseScore / (1.0 - baseScore))

  def margin(x: Array[Double]): Double = {
    var m = baseMargin
    var i = 0
    while (i < trees.length) { m += trees(i).eval(x); i += 1 }
    m
  }

  def score(x: Array[Double]): Double = 1.0 / (1.0 + math.exp(-margin(x)))
}

object XgbUbjson {
  import PickleReader.PyObject

  /** The superluminous model's training feature order (embedded
    * feature_names of superluminous_classifier.joblib) — used by the
    * stub fallback when the bundle is absent so the vector layout stays
    * identical either way.
    */
  val TrainingFeatureOrder: Vector[String] = Vector(
    "amplitude", "rise_time", "fall_time", "Tmin", "Tmax", "t_color",
    "chi2_rainbow", "snr_amplitude", "snr_rise_time", "snr_fall_time",
    "snr_Tmin", "snr_Tmax", "snr_t_color", "max_slope", "z", "x0", "x1",
    "c", "chi2_salt", "flux_amplitude", "skew", "distnr", "duration",
    "std_flux", "q15", "q85", "ebv")

  /** Load an XGBClassifier joblib/pickle whose `_Booster.handle` holds
    * the UBJSON snapshot (the layout xgboost's sklearn wrapper pickles).
    */
  def loadClassifierPickle(path: String): XgbBinaryModel = {
    val clf = PickleReader.load(path).asInstanceOf[PyObject]
    val booster = clf.field("_Booster").asInstanceOf[PyObject]
    val raw = booster.field("handle").asInstanceOf[Array[Byte]]
    val threshold = clf.fieldOpt("optimal_threshold") match {
      case Some(d: Double) => d
      case _ => 0.5
    }
    fromSnapshot(raw, threshold)
  }

  /** Parse the UBJSON memory snapshot ({Config, Model} layout). */
  def fromSnapshot(raw: Array[Byte], optimalThreshold: Double): XgbBinaryModel = {
    val top = Ubjson.parse(raw).asInstanceOf[mutable.LinkedHashMap[String, Any]]
    val learner = top("Model").asInstanceOf[mutable.LinkedHashMap[String, Any]]("learner")
      .asInstanceOf[mutable.LinkedHashMap[String, Any]]
    val names = learner("feature_names") match {
      case v: Vector[Any @unchecked] => v.map(_.asInstanceOf[String])
      case null => Vector.empty[String]
    }
    val modelParam = learner("learner_model_param")
      .asInstanceOf[mutable.LinkedHashMap[String, Any]]
    // model params are serialized as strings ("5E-1")
    val baseScore = modelParam("base_score").asInstanceOf[String].toDouble
    val objective = learner("objective").asInstanceOf[mutable.LinkedHashMap[String, Any]]
    require(objective("name") == "binary:logistic",
      s"unsupported objective ${objective("name")}")
    val model = learner("gradient_booster").asInstanceOf[mutable.LinkedHashMap[String, Any]]("model")
      .asInstanceOf[mutable.LinkedHashMap[String, Any]]
    val trees = model("trees").asInstanceOf[Vector[Any]].map { t =>
      val m = t.asInstanceOf[mutable.LinkedHashMap[String, Any]]
      def ints(k: String): Array[Int] = m(k) match {
        case a: Array[Int] => a
        case a: Array[Long] => a.map(_.toInt)
      }
      XgbTree(
        splitIndex = ints("split_indices"),
        cond = m("split_conditions").asInstanceOf[Array[Float]],
        left = ints("left_children"),
        right = ints("right_children"),
        defaultLeft = ints("default_left").map(_ != 0))
    }.toArray
    XgbBinaryModel(trees, baseScore, names, optimalThreshold)
  }
}
