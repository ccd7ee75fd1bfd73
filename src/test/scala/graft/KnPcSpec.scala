package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import graft.models.RefModels

/** Pins the native KN_PC_all_bands.npy read (npy envelope + embedded
  * pickle) against an independent NumPy evaluation
  * (tools/kn_pc_fixture.py), and cross-validates the kndetect binning
  * inference the kilonova operator relies on (mixed_pcs.csv 401-sample
  * 0.25 d grid over +-50 d).
  */
class KnPcSpec extends AnyFunSuite {

  private lazy val fixture = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(new File("src/test/resources/kn_pc_expected.json"))
  }

  test("per-band PC matrices parse and PC1 projections match NumPy") {
    assume(RefModels.kilonovaBandPcs.isDefined, "model bundle absent")
    val pcs = RefModels.kilonovaBandPcs.get
    val bands = fixture.get("bands")
    val names = bands.fieldNames()
    var nChecked = 0
    while (names.hasNext) {
      val band = names.next()
      val exp = bands.get(band)
      val m = pcs(band)
      assert(m.length === exp.get("shape").get(0).asInt)
      assert(m(0).length === exp.get("shape").get(1).asInt)
      val pc1 = m(0)
      (0 until 5).foreach { i =>
        assert(math.abs(pc1(i) - exp.get("pc1_head").get(i).asDouble) < 1e-15)
      }
      // the same projection arithmetic as the NumPy fixture
      val f = Array.tabulate(51)(i => math.exp(-math.pow((i - 27.0) / 6.0, 2)))
      var num = 0.0; var den = 0.0
      var i = 0
      while (i < 51) { num += pc1(i) * f(i); den += pc1(i) * pc1(i); i += 1 }
      val coeff = num / den
      assert(math.abs(coeff - exp.get("coeff").asDouble) < 1e-12,
        s"$band coeff $coeff")
      var rss = 0.0
      i = 0
      while (i < 51) {
        val r = f(i) - coeff * pc1(i); rss += r * r; i += 1
      }
      assert(math.abs(math.sqrt(rss / 51) - exp.get("resid_rms").asDouble) < 1e-12)
      nChecked += 1
    }
    assert(nChecked === 6)
  }

  test("binning cross-validation: band PC1 tracks mixed_pcs PC1 at 2d steps") {
    assume(RefModels.kilonovaBandPcs.isDefined && RefModels.kilonovaPcs.isDefined,
      "model bundle absent")
    val mixed1 = RefModels.kilonovaPcs.get.head // 401 samples, 0.25 d grid
    // downsample the 401-sample +-50 d grid by 8 -> 51 samples at 2 d;
    // if the per-band sets lived on a different window the correlation
    // would collapse, so this pins the inferred binning
    val ds = Array.tabulate(51)(i => mixed1(i * 8))
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length
      val ma = a.sum / n; val mb = b.sum / n
      var sab = 0.0; var saa = 0.0; var sbb = 0.0
      var i = 0
      while (i < n) {
        val da = a(i) - ma; val db = b(i) - mb
        sab += da * db; saa += da * da; sbb += db * db; i += 1
      }
      sab / math.sqrt(saa * sbb)
    }
    val pcs = RefModels.kilonovaBandPcs.get
    Seq("g", "r").foreach { band =>
      val c = math.abs(corr(pcs(band)(0), ds))
      assert(c > 0.85, s"$band PC1 vs mixed PC1 corr $c")
    }
  }
}
