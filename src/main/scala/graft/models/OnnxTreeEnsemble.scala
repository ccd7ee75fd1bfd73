package graft.models

import java.io.{ByteArrayOutputStream, InputStream}
import java.util.zip.ZipFile

/** Minimal ONNX TreeEnsembleRegressor reader.
  *
  * The reference ships its active-anomaly-detection isolation forests as
  * ONNX graphs (ztf/anomaly_detection/processor.py:223-238, model zips
  * under data/models/anomaly_detection/) and scores them with
  * onnxruntime. ONNX is an open protobuf format, and the exported graphs
  * contain a single `ai.onnx.ml.TreeEnsembleRegressor` node, so a
  * dependency-free reader only needs (a) the protobuf wire format and
  * (b) the TreeEnsemble attribute layout — both public specs.
  *
  * Scope: exactly what the bundled models use — BRANCH_LEQ splits, LEAF
  * sinks, single target, post_transform NONE, SUM aggregation. Anything
  * else fails loudly rather than mis-scoring.
  */
object OnnxTreeEnsemble {

  // ---- protobuf wire-format primitives -------------------------------

  /** Cursor over a length-delimited protobuf region. */
  private final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end

    def varint(): Long = {
      var x = 0L; var s = 0
      while (true) {
        val b = buf(pos); pos += 1
        x |= (b & 0x7fL) << s
        if ((b & 0x80) == 0) return x
        s += 7
      }
      x
    }

    /** Returns (fieldNumber, wireType). */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }

    def skipOrSub(wireType: Int): Reader = wireType match {
      case 0 => varint(); null
      case 1 => pos += 8; null
      case 2 =>
        val len = varint().toInt
        val sub = new Reader(buf, pos, pos + len)
        pos += len
        sub
      case 5 => pos += 4; null
      case other => sys.error(s"unsupported protobuf wire type $other at $pos")
    }

    def bytes(): Array[Byte] = {
      val len = varint().toInt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }

    def float32(): Float = {
      val bits = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      java.lang.Float.intBitsToFloat(bits)
    }
  }

  // ---- TreeEnsemble attribute extraction -----------------------------

  /** Repeated-int64 attribute: either packed (wire type 2) or one
    * varint per occurrence (wire type 0).
    */
  private final class IntsBuilder {
    val out = new scala.collection.mutable.ArrayBuffer[Long](1 << 16)
    def add(wireType: Int, r: Reader): Unit = wireType match {
      case 0 => out += r.varint()
      case 2 =>
        val sub = r.skipOrSub(2)
        while (sub.hasNext) out += sub.varint()
      case other => sys.error(s"ints attr: unexpected wire type $other")
    }
  }

  /** Repeated-float attribute: packed or one fixed32 per occurrence
    * (onnxmltools emits the non-packed form).
    */
  private final class FloatsBuilder {
    val out = new scala.collection.mutable.ArrayBuffer[Float](1 << 16)
    def add(wireType: Int, r: Reader): Unit = wireType match {
      case 5 => out += r.float32()
      case 2 =>
        val sub = r.skipOrSub(2)
        while (sub.hasNext) out += sub.float32()
      case other => sys.error(s"floats attr: unexpected wire type $other")
    }
  }

  private final case class RawAttr(
      ints: Array[Long], floats: Array[Float], strings: Array[String],
      s: String, i: Long)

  /** Walks ModelProto → graph(7) → node(1) and returns the attribute map
    * of the single TreeEnsembleRegressor node.
    */
  private def parseAttrs(model: Array[Byte]): Map[String, RawAttr] = {
    val top = new Reader(model, 0, model.length)
    var graph: Reader = null
    while (top.hasNext) {
      val (fld, wt) = top.tag()
      if (fld == 7 && wt == 2) graph = top.skipOrSub(wt) else top.skipOrSub(wt)
    }
    require(graph != null, "ONNX: no graph")

    var node: Reader = null
    while (graph.hasNext) {
      val (fld, wt) = graph.tag()
      if (fld == 1 && wt == 2 && node == null) node = graph.skipOrSub(wt)
      else graph.skipOrSub(wt)
    }
    require(node != null, "ONNX: no node in graph")

    var opType = ""
    val attrs = scala.collection.mutable.Map.empty[String, RawAttr]
    val nodeAttrs = scala.collection.mutable.ArrayBuffer.empty[Reader]
    while (node.hasNext) {
      val (fld, wt) = node.tag()
      if (fld == 4 && wt == 2) opType = new String(node.bytes(), "UTF-8")
      else if (fld == 5 && wt == 2) nodeAttrs += node.skipOrSub(wt)
      else node.skipOrSub(wt)
    }
    require(opType == "TreeEnsembleRegressor",
      s"ONNX: expected TreeEnsembleRegressor, got '$opType'")

    for (a <- nodeAttrs) {
      var name = ""
      val ints = new IntsBuilder; val floats = new FloatsBuilder
      val strs = scala.collection.mutable.ArrayBuffer.empty[String]
      var sval = ""; var ival = 0L
      while (a.hasNext) {
        val (fld, wt) = a.tag()
        fld match {
          case 1 => name = new String(a.bytes(), "UTF-8")
          case 3 => ival = a.varint()
          case 4 => sval = new String(a.bytes(), "UTF-8")
          case 7 => floats.add(wt, a)
          case 8 => ints.add(wt, a)
          case 9 => strs += new String(a.bytes(), "UTF-8")
          case _ => a.skipOrSub(wt)
        }
      }
      attrs(name) = RawAttr(ints.out.toArray, floats.out.toArray, strs.toArray, sval, ival)
    }
    attrs.toMap
  }

  // ---- scorer construction -------------------------------------------

  /** Parse a serialized ONNX model into a [[TreeEnsembleScorer]]. */
  def fromBytes(model: Array[Byte]): TreeEnsembleScorer = {
    val attrs = parseAttrs(model)
    def ints(n: String) = attrs(n).ints
    def floats(n: String) = attrs(n).floats

    require(attrs("n_targets").i == 1, "only single-target ensembles supported")
    val post = attrs.get("post_transform").map(_.s).getOrElse("NONE")
    require(post == "NONE", s"unsupported post_transform $post")
    val agg = attrs.get("aggregate_function").map(_.s).getOrElse("SUM")
    require(agg == "SUM", s"unsupported aggregate_function $agg")

    val treeIds = ints("nodes_treeids")
    val nodeIds = ints("nodes_nodeids")
    val featIds = ints("nodes_featureids")
    val values = floats("nodes_values")
    val modes = attrs("nodes_modes").strings
    val trueIds = ints("nodes_truenodeids")
    val falseIds = ints("nodes_falsenodeids")

    val leafWeight = new scala.collection.mutable.LongMap[Float]()
    val tTree = ints("target_treeids"); val tNode = ints("target_nodeids")
    val tW = floats("target_weights")
    var k = 0
    while (k < tTree.length) {
      leafWeight((tTree(k) << 32) | tNode(k)) = tW(k); k += 1
    }

    val nTrees = (treeIds.max + 1).toInt
    val counts = new Array[Int](nTrees)
    k = 0
    while (k < treeIds.length) { counts(treeIds(k).toInt) += 1; k += 1 }

    val trees = Array.tabulate(nTrees) { t =>
      new EnsembleTree(new Array[Int](counts(t)), new Array[Float](counts(t)),
        new Array[Int](counts(t)), new Array[Int](counts(t)), new Array[Float](counts(t)))
    }
    k = 0
    while (k < treeIds.length) {
      val t = treeIds(k).toInt
      val n = nodeIds(k).toInt // node ids are 0..count-1 within each tree
      val tree = trees(t)
      modes(k) match {
        case "BRANCH_LEQ" =>
          tree.feature(n) = featIds(k).toInt
          tree.threshold(n) = values(k)
          tree.ifTrue(n) = trueIds(k).toInt
          tree.ifFalse(n) = falseIds(k).toInt
        case "LEAF" =>
          tree.ifTrue(n) = -1
          tree.weight(n) = leafWeight.getOrElse((treeIds(k) << 32) | nodeIds(k),
            sys.error(s"leaf ($t,$n) has no target weight"))
        case other => sys.error(s"unsupported node mode $other")
      }
      k += 1
    }
    new TreeEnsembleScorer(trees)
  }

  /** Load from a plain .onnx file. */
  def fromFile(path: String): TreeEnsembleScorer =
    fromBytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** Load one entry of a model zip (the reference distributes forests as
    * anomaly_detection_forest_AAD*.zip holding forest_{g,r}_*.onnx).
    */
  def fromZipEntry(zipPath: String, entryName: String): TreeEnsembleScorer = {
    val zf = new ZipFile(zipPath)
    try {
      val entry = zf.getEntry(entryName)
      require(entry != null, s"$entryName not in $zipPath")
      fromBytes(readAll(zf.getInputStream(entry)))
    } finally zf.close()
  }

  private def readAll(in: InputStream): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }
}

/** One tree in flat-array form indexed by ONNX nodeid. `ifTrue(n) == -1`
  * marks a leaf whose contribution is `weight(n)`.
  */
final class EnsembleTree(
    val feature: Array[Int], val threshold: Array[Float],
    val ifTrue: Array[Int], val ifFalse: Array[Int],
    val weight: Array[Float]) extends Serializable

/** SUM-aggregated regression forest with onnxruntime semantics: inputs
  * cast to float32, BRANCH_LEQ compares `x <= threshold` in float32, and
  * NaN fails the comparison (missing_value_tracks_true is unset in the
  * bundled models, so NaN rows take the false branch).
  */
final class TreeEnsembleScorer(val trees: Array[EnsembleTree]) extends Scorer {
  def nTrees: Int = trees.length
  def nNodes: Int = { var s = 0; var i = 0; while (i < trees.length) { s += trees(i).feature.length; i += 1 }; s }

  def score(features: Array[Double]): Double = {
    val x = new Array[Float](features.length)
    var i = 0
    while (i < features.length) { x(i) = features(i).toFloat; i += 1 }
    var sum = 0.0
    var t = 0
    while (t < trees.length) {
      val tree = trees(t)
      var n = 0
      while (tree.ifTrue(n) != -1) {
        n = if (x(tree.feature(n)) <= tree.threshold(n)) tree.ifTrue(n) else tree.ifFalse(n)
      }
      sum += tree.weight(n)
      t += 1
    }
    sum
  }
}
