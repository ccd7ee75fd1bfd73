package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.models.{AnomalyModels, OnnxTreeEnsemble}

/** Loads the reference-bundled ONNX isolation forests and pins their
  * evaluation against scores computed by an independent Python
  * implementation of the same wire format + TreeEnsembleRegressor
  * semantics (golden values below). Auto-cancels when the reference
  * model zip is absent.
  */
class OnnxTreeEnsembleSpec extends AnyFunSuite {

  private val zipPath = "/root/reference/fink_science/data/models/" +
    "anomaly_detection/anomaly_detection_forest_AAD_beta.zip"

  private def available: Boolean = new java.io.File(zipPath).isFile

  /** Deterministic feature-vector source shared with the Python golden
    * generator: a 63-bit LCG mapped to [-1, 1).
    */
  private final class Lcg(seed: Long) {
    private var x = seed & Long.MaxValue
    def nextFeature(): Float = {
      x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue
      (x.toDouble / (1L << 62).toDouble - 1.0).toFloat
    }
    def vector(n: Int): Array[Double] =
      Array.fill(n)(nextFeature().toDouble)
  }

  test("forest_g structure: 150 trees, 155484 nodes") {
    assume(available, "reference model zip not present")
    val g = OnnxTreeEnsemble.fromZipEntry(zipPath, "forest_g_AAD_beta.onnx")
    assert(g.nTrees === 150)
    assert(g.nNodes === 155484)
  }

  test("forest_r structure: 150 trees, 140902 nodes") {
    assume(available, "reference model zip not present")
    val r = OnnxTreeEnsemble.fromZipEntry(zipPath, "forest_r_AAD_beta.onnx")
    assert(r.nTrees === 150)
    assert(r.nNodes === 140902)
  }

  test("forest_g scores match the independent Python evaluation") {
    assume(available, "reference model zip not present")
    val g = OnnxTreeEnsemble.fromZipEntry(zipPath, "forest_g_AAD_beta.onnx")
    val lcg = new Lcg(12345L)
    val expected = Seq(
      -0.04669765786093194, -0.044577431690413505,
      -0.048958266619592905, -0.05210037445795024)
    for (e <- expected) {
      val got = g.score(lcg.vector(25))
      assert(math.abs(got - e) < 1e-12, s"expected $e got $got")
    }
  }

  test("forest_r scores match the independent Python evaluation") {
    assume(available, "reference model zip not present")
    val r = OnnxTreeEnsemble.fromZipEntry(zipPath, "forest_r_AAD_beta.onnx")
    val lcg = new Lcg(54321L)
    val expected = Seq(
      -0.04892769327852875, -0.05052308473386802,
      -0.04636204754933715, -0.04987848831660813)
    for (e <- expected) {
      val got = r.score(lcg.vector(25))
      assert(math.abs(got - e) < 1e-12, s"expected $e got $got")
    }
  }

  test("NaN input takes the false branch, matching onnxruntime") {
    assume(available, "reference model zip not present")
    val g = OnnxTreeEnsemble.fromZipEntry(zipPath, "forest_g_AAD_beta.onnx")
    val nan = Array.fill(25)(Double.NaN)
    val s = g.score(nan)
    assert(!s.isNaN) // every tree still reaches a leaf
  }

  test("AnomalyModels.load wires fid1->forest_r and fid2->forest_g") {
    assume(available, "reference model zip not present")
    val (fid1, fid2) = AnomalyModels.load(zipPath)
    val r = OnnxTreeEnsemble.fromZipEntry(zipPath, "forest_r_AAD_beta.onnx")
    val x = new Lcg(99L).vector(25)
    assert(fid1.score(x) === r.score(x))
    assert(fid1.score(x) !== fid2.score(x))
  }
}
