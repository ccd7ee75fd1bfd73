package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.models.{PickleReader, RefModels, SklearnModels}

/** Pins the pickle reader + sklearn extractors against probabilities
  * computed by an independent Python implementation of the same
  * traversal (tree arrays read via a stub unpickler, predict_proba from
  * first principles — golden values inline). Auto-cancels when the
  * reference model bundle is absent.
  */
class SklearnModelsSpec extends AnyFunSuite {

  private def modelsPresent = new java.io.File(RefModels.dir).isDirectory

  /** The shared deterministic probe vector: ((i*2654435761) mod 1000)/500 - 1. */
  private def probe(n: Int): Array[Double] =
    Array.tabulate(n)(i => ((i * 2654435761L) % 1000) / 500.0 - 1.0)

  test("rf.sav: 1000 trees, 4 classes, proba matches Python golden") {
    assume(modelsPresent)
    val rf = RefModels.mulensForest.get
    assert(rf.trees.length === 1000)
    assert(rf.classes === Vector("CONSTANT", "CV", "ML", "VARIABLE"))
    val p = rf.proba(probe(47))
    val golden = Seq(0.17590119549976266, 0.2182389034793219,
      0.28453470089973354, 0.3213252001211822)
    for ((g, i) <- golden.zipWithIndex)
      assert(math.abs(p(i) - g) < 1e-12, s"class $i: ${p(i)} vs $g")
    assert(math.abs(p.sum - 1.0) < 1e-12)
  }

  test("pca.sav: 44 components over 47 features") {
    assume(modelsPresent)
    val pca = RefModels.mulensPca.get
    assert(pca.components.length === 44)
    assert(pca.components(0).length === 47)
    assert(pca.mean.length === 47)
  }

  test("KN_model_1PC.pkl: RobustScaler + 50-tree RF, golden proba") {
    assume(modelsPresent)
    val (scaler, rf) = RefModels.kilonova.get
    assert(rf.trees.length === 50)
    assert(rf.classes === Vector(false, true))
    assert(scaler.center.length === 8)
    val x = Array(0.3, -1.2, 0.05, 4.0, 0.7, -0.1, 2.5, 13.0)
    val p = rf.proba(scaler.transform(x))(1)
    assert(math.abs(p - 0.76) < 1e-12, s"got $p")
  }

  test("al-loop model: 12 sigmoid features in our layout, golden proba") {
    assume(modelsPresent)
    val al = RefModels.alSnia.get
    assert(al.trees.length === 1000)
    assert(al.classes === Vector(false, true))
    val p = al.proba(probe(12))
    assert(math.abs(p(0) - 0.584) < 1e-12 && math.abs(p(1) - 0.416) < 1e-12,
      s"got ${p.toSeq}")
  }

  test("model_orphans.pkl (joblib): GB classifier with sklearn init") {
    assume(modelsPresent)
    val gb = RefModels.orphans.get
    assert(gb.trees.length === 100)
    assert(gb.learningRate === 0.1)
    // init_ = log-odds of the training prior (20:1 here)
    assert(math.abs(gb.initLogOdds - math.log(1.0 / 20.0)) < 1e-9)
    val s = gb.score(probe(12))
    assert(s > 0.0 && s < 1.0)
  }

  test("kilonova PCs: 3 components on a 401-sample grid, unit-norm peak") {
    assume(modelsPresent)
    val pcs = RefModels.kilonovaPcs.get
    assert(pcs.length === 3)
    assert(pcs.forall(_.length === 401))
    // kndetect templates peak at |1| (PC2 dips to -1 instead)
    assert(pcs.forall(p => p.map(math.abs).max > 0.999 &&
      p.map(math.abs).max <= 1.0 + 1e-9))
  }
}
