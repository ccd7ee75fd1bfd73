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

  private def pngBytes(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pix(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def media(id: Long, payload: Array[Byte]) =
    Multimodal.MediaItem(id, payload, "image/png", 0, 0)

  test("byteAHash: hand-computed small case, 60-bit range, empty-payload zero") {
    // 3 bytes -> blocks 0,20,40 (j*60/3); means 10,200,10; thr 220/60
    val h = MediaKernel.byteAHash(Array[Byte](10, 200.toByte, 10))
    // only block 20's mean (200) exceeds thr (3.67): means 10 > 3.67 too!
    // 10 > 220/60=3.67 -> bits 0 and 40 also set... compute explicitly:
    // set bits where mean > 220/60 ~ 3.667: all three blocks
    assert(h === ((1L << 0) | (1L << 20) | (1L << 40)))
    assert(MediaKernel.byteAHash(Array.emptyByteArray) === 0L)
    // 60-bit: never touches the sign bit or bits 60..63
    val big = Array.tabulate[Byte](1000)(i => (i * 31).toByte)
    assert((MediaKernel.byteAHash(big) & ~((1L << 60) - 1)) === 0L)
    // deterministic
    assert(MediaKernel.byteAHash(big) === MediaKernel.byteAHash(big.clone()))
  }

  test("imageAHash: brightness-shift invariant, re-encode stable, near-dup within a few bits") {
    def noise(x: Int, y: Int): Int = ((x * 131 + y * 197) % 97) + 60
    val base = pngBytes(40, 30, noise)
    val shifted = pngBytes(40, 30, (x, y) => math.min(255, noise(x, y) + 25))
    val hBase = MediaKernel.imageAHash(media(1, base))
    val hShift = MediaKernel.imageAHash(media(2, shifted))
    // classic aHash property: a global brightness shift moves every
    // cell AND the threshold together, so the hash is unchanged
    assert(hBase === hShift)
    // lossless re-encode of the same pixels -> same hash
    assert(MediaKernel.imageAHash(media(3, pngBytes(40, 30, noise))) === hBase)
    // a small local perturbation flips few bits
    val smudged = pngBytes(40, 30, (x, y) =>
      if (x < 4 && y < 3) 255 else noise(x, y))
    val hSmudge = MediaKernel.imageAHash(media(4, smudged))
    assert(java.lang.Long.bitCount(hBase ^ hSmudge) <= 4)
    // a very different image is far away
    val other = pngBytes(40, 30, (x, y) => if ((x / 10 + y / 10) % 2 == 0) 230 else 20)
    val hOther = MediaKernel.imageAHash(media(5, other))
    assert(java.lang.Long.bitCount(hBase ^ hOther) > 10)
  }

  test("perceptualHash feeds the existing Hamming-LSH banding end to end") {
    import spark.implicits._
    def noise(x: Int, y: Int): Int = ((x * 131 + y * 197) % 97) + 60
    val a = pngBytes(40, 30, noise)
    val aDup = pngBytes(40, 30, (x, y) =>
      if (x < 4 && y < 3) 255 else noise(x, y)) // near-dup of a
    val b = pngBytes(40, 30, (x, y) => if ((x / 10 + y / 10) % 2 == 0) 230 else 20)
    val txt = "plain text payload, not an image".getBytes("UTF-8")
    val mediaDf = Seq(
      (1L, a, "image/png", 0, 0), (2L, aDup, "image/png", 0, 0),
      (3L, b, "image/png", 0, 0), (4L, txt, "text/plain", 0, 0))
      .toDF("id", "payload", "mimetype", "width", "height")
    val hashed = Multimodal.perceptualHash(spark, mediaDf)
    val hs = hashed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // image rows hash in the pixel domain; the text row byte-blocks
    assert(hs(1L) === MediaKernel.imageAHash(media(1, a)))
    assert(hs(4L) === MediaKernel.byteAHash(txt))
    // verify the crafted distances support the banding assertion below
    val dupHam = java.lang.Long.bitCount(hs(1L) ^ hs(2L))
    assert(dupHam <= 4, s"crafted near-dup drifted to hamming $dupHam")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) > 4)
    // d5's banded pair enumeration over the hash column, unchanged
    val pairs = graft.dedup.Dedup.simhashPairs(hashed, "id", maxHamming = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (x, y) => Set(x, y).contains(3L) })
  }
}
