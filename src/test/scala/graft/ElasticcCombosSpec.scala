package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import graft.models.{RefModels, SnnFeatures, SnnModel, TorchReader}

/** The ELAsTiCC one-hot combo universe, validated against the bundled
  * model's own metadata: cli_args.json's training_features is the
  * ground truth for both the universe (63 combos) and the column
  * order; the LSTM input dimension must equal 13 + |universe|.
  */
class ElasticcCombosSpec extends AnyFunSuite {

  private val Filters = Seq("u", "g", "r", "i", "z", "Y") // list_filters order
  private val dir = RefModels.dir + "/snn_models/elasticc_binary_broad/SN_vs_other"
  private def available = new File(dir, "model.pt").isFile

  test("derived universe matches cli_args training_features exactly") {
    assume(new File(dir, "cli_args.json").isFile, "model bundle absent")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val args = mapper.readTree(new File(dir, "cli_args.json"))
    val training = args.get("training_features")
    val expected = (0 until training.size).map(training.get(_).asText)
    val photometric = Filters.map("FLUXCAL_" + _) ++
      Filters.map("FLUXCALERR_" + _) ++ Seq("delta_time")
    val derived = photometric ++ SnnFeatures.comboUniverse(Filters)
    assert(derived.length === expected.length,
      s"${derived.length} vs ${expected.length}")
    derived.zip(expected).zipWithIndex.foreach { case ((d, e), i) =>
      assert(d === e, s"column $i")
    }
  }

  test("universe size matches the LSTM input dimension (13 + combos)") {
    assume(available, "model bundle absent")
    val sd = TorchReader.stateDict(TorchReader.load(s"$dir/model.pt"))
    val inDim = sd("rnn_layer.weight_ih_l0").size(1)
    assert(inDim === 13 + SnnFeatures.comboUniverse(Filters).length)
    assert(SnnFeatures.comboUniverse(Filters).length === 63)
  }

  test("every band combination one-hots at its own column") {
    assume(available, "model bundle absent")
    val model = SnnModel.load(dir)
    val combos = SnnFeatures.comboUniverse(Filters)
    // one synthetic night per subset: exactly that subset observed
    Filters.toSet.subsets().filter(_.nonEmpty).foreach { sub =>
      val bands = Filters.filter(sub.contains)
      val mjd = bands.indices.map(_ => 60000.4).toArray
      val flux = bands.indices.map(i => 1000.0 + i).toArray
      val err = bands.indices.map(_ => 10.0).toArray
      val steps = SnnFeatures.timestepsFlux(mjd, bands.toArray, flux, err, Filters)
      assert(steps.length === 1)
      val row = SnnFeatures.featureMatrix(model, steps, Filters)(0)
      assert(row.length === 13 + combos.length)
      val hot = row.drop(13).zipWithIndex.filter(_._1 == 1.0).map(_._2)
      assert(hot.toSeq === Seq(combos.indexOf(bands.mkString)),
        s"subset ${bands.mkString} hot at ${hot.toSeq}")
    }
  }

  test("multi-night multi-combo series scores deterministically in (0,1)") {
    assume(available, "model bundle absent")
    val model = SnnModel.load(dir)
    // 4 nights sweeping different combos: ugrizY, gY, riz, u
    val mjd = Array(60000.3, 60000.4, 60000.5, 60000.55, 60000.6, 60000.62,
      60003.4, 60003.5, 60007.3, 60007.35, 60007.4, 60012.8)
    val bands = Array("u", "g", "r", "i", "z", "Y", "g", "Y", "r", "i", "z", "u")
    val flux = Array(500.0, 900.0, 1300.0, 1600.0, 1400.0, 1200.0,
      1800.0, 1500.0, 2400.0, 2600.0, 2200.0, 900.0)
    val err = flux.map(_ * 0.05)
    val p1 = SnnFeatures.probClass0Flux(model, mjd, bands, flux, err, Filters)
    val p2 = SnnFeatures.probClass0Flux(model, mjd, bands, flux, err, Filters)
    assert(p1 === p2)
    assert(p1 > 0 && p1 < 1)
    // shuffled row order describes the same physical series
    val perm = Array(11, 3, 7, 0, 9, 5, 1, 8, 4, 10, 2, 6)
    val p3 = SnnFeatures.probClass0Flux(model,
      perm.map(mjd), perm.map(bands), perm.map(flux), perm.map(err), Filters)
    assert(math.abs(p1 - p3) < 1e-12)
  }
}
