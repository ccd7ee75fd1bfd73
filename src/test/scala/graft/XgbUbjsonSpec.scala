package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import graft.models.{RefModels, XgbUbjson}

/** Pins the native XGBoost-UBJSON reader against an independent NumPy
  * evaluation of the same bundled artifact
  * (tools/slsn_xgb_fixture.py -> src/test/resources/slsn_xgb_expected
  * .json: 64 deterministic feature vectors, NaN routing included).
  */
class XgbUbjsonSpec extends AnyFunSuite {

  private val fixturePath = "src/test/resources/slsn_xgb_expected.json"

  private lazy val fixture = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(new File(fixturePath))
  }

  private def model = RefModels.superluminousXgb

  test("superluminous XGBoost model parses from the bundled joblib") {
    assume(model.isDefined, "model bundle absent")
    val m = model.get
    assert(m.trees.length === fixture.get("num_trees").asInt)
    assert(m.trees.map(_.left.length).sum === fixture.get("total_nodes").asInt)
    assert(m.baseScore === fixture.get("base_score").asDouble)
    assert(math.abs(m.optimalThreshold -
      fixture.get("optimal_threshold").asDouble) < 1e-9)
    val names = fixture.get("feature_names")
    assert(m.featureNames.length === names.size)
    m.featureNames.zipWithIndex.foreach { case (n, i) =>
      assert(n === names.get(i).asText)
    }
    // the stub-fallback layout must match the real model's
    assert(m.featureNames === XgbUbjson.TrainingFeatureOrder)
  }

  test("predict_proba matches the independent NumPy eval on 64 vectors") {
    assume(model.isDefined, "model bundle absent")
    val m = model.get
    val cases = fixture.get("cases")
    var k = 0
    while (k < cases.size) {
      val c = cases.get(k)
      val xNode = c.get("x")
      val x = Array.tabulate(xNode.size)(i =>
        if (xNode.get(i).isNull) Double.NaN else xNode.get(i).asDouble)
      assert(math.abs(m.margin(x) - c.get("margin").asDouble) < 1e-9,
        s"margin mismatch on case $k")
      assert(math.abs(m.score(x) - c.get("proba").asDouble) < 1e-12,
        s"proba mismatch on case $k")
      k += 1
    }
  }

  test("scores are probabilities and the threshold is in range") {
    assume(model.isDefined, "model bundle absent")
    val m = model.get
    assert(m.optimalThreshold > 0 && m.optimalThreshold < 1)
    val p = m.score(Array.fill(27)(0.0))
    assert(p > 0 && p < 1)
  }
}
