package graft

import graft.multimodal.{MediaKernel, Multimodal}

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

  test("PNG payloads decode to real pixels through the JDK ImageIO") {
    // synthesize a 4x3 PNG with known pixel values
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 4)
      img.setRGB(x, y, (x * 50 << 16) | (y * 80 << 8) | 37)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val payload = bos.toByteArray

    assert(MediaKernel.isDecodableImage(payload))
    val item = Multimodal.MediaItem(7L, payload, "image/png", 4, 3)
    val frames = MediaKernel.decode(item)
    assert(frames.length === 3) // one luminance row per pixel row
    assert(frames.forall(_.length === 4))
    // luma of pixel (x,y) = .299*50x + .587*80y + .114*37
    for (y <- 0 until 3; x <- 0 until 4) {
      val expected = 0.299f * (50 * x) + 0.587f * (80 * y) + 0.114f * 37
      assert(math.abs(frames(y)(x) - expected) < 0.01, s"($x,$y)")
    }
  }

  test("non-image payloads take the deterministic fallback") {
    val item = Multimodal.MediaItem(5L, "plain text bytes".getBytes, "text/plain", 16, 1)
    assert(!MediaKernel.isDecodableImage(item.payload))
    val frames = MediaKernel.decode(item)
    assert(frames.length === (1 + 5 % 3))
    assert(frames.forall(_.nonEmpty))
  }

  test("frameSample edge cases: empty, <=k frames, >k frames, partial tail") {
    // empty payload: no frames, no means (m3 emits n_sampled=0)
    val (idxE, meansE) = MediaKernel.frameSample(Array.emptyByteArray, 64, 4)
    assert(idxE.isEmpty && meansE.isEmpty)
    // 3 frames <= k=4: all kept, partial tail frame averaged over its
    // actual length (n=3 for 130 bytes of 64-byte frames)
    val p = Array.tabulate[Byte](130)(i => (i % 251).toByte)
    val (idx3, means3) = MediaKernel.frameSample(p, 64, 4)
    assert(idx3 === Array(0, 1, 2))
    assert(means3(0) === (0 until 64).map(_ % 251).sum.toDouble / 64)
    assert(means3(2) === (128 until 130).map(_ % 251).sum.toDouble / 2)
    // 10 frames > k: uniform floor(j*(n-1)/(k-1)) with first+last pinned
    val big = Array.fill[Byte](640)(1)
    val (idx10, _) = MediaKernel.frameSample(big, 64, 4)
    assert(idx10 === Array(0, 3, 6, 9))
    // non-ASCII payload: sampled over UTF-8 bytes, not characters
    val utf = "héllo wörld".getBytes("UTF-8")
    val (idxU, meansU) = MediaKernel.frameSample(utf, 64, 4)
    assert(idxU === Array(0))
    assert(meansU(0) === utf.map(_ & 0xff).sum.toDouble / utf.length)
  }
}
