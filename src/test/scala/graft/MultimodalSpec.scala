package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("packed documents expose binary payload with intact byte length") {
    val docs = Tables.t(spark, sf, "documents")
    val media = Multimodal.packDocuments(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val feats = Multimodal.extractFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length === docs.count())
    // ascii corpus: byte length == char length
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { f =>
      assert(f.n_bytes === chars(f.id))
      assert(f.mean_byte > 0.0 && f.mean_byte < 256.0)
      assert(f.byte_entropy > 0.0 && f.byte_entropy <= 8.0)
      assert(f.frames >= 1 && f.frames <= 3)
    }
  }
}
