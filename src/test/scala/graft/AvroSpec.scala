package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{AvroReader, AvroWriter}

class AvroSpec extends SparkSpec {

  test("reads the spec-crafted container (deflate, unions, nesting)") {
    val df = AvroReader.read(spark, "src/test/resources/alerts_expected.avro")
    assert(df.count() === 3)
    val schema = df.schema
    assert(schema("objectId").dataType === StringType)
    assert(schema("maybe_mag").dataType === DoubleType && schema("maybe_mag").nullable)
    assert(schema("candidate").dataType.isInstanceOf[StructType])
    assert(schema("props").dataType === MapType(StringType, StringType, false))
    assert(schema("grade").dataType === StringType)
    assert(schema("history").dataType.asInstanceOf[ArrayType]
      .elementType.isInstanceOf[StructType])

    val rows = df.orderBy("candid").collect()
    // candid -103 sorts first (zigzag decode of negatives)
    val r3 = rows(0)
    assert(r3.getAs[String]("objectId") === "ZTF3")
    assert(r3.getAs[Long]("candid") === -103L)
    assert(r3.getAs[Double]("maybe_mag") === 3.125)
    assert(r3.getAs[Map[String, String]]("props") === Map("k1" -> "v1", "k2" -> "v2"))
    assert(r3.getAs[Row]("candidate").getAs[scala.collection.Seq[Int]]("flags").toSeq === Seq(-7))
    assert(r3.getAs[scala.collection.Seq[Row]]("history").length === 2)
    assert(r3.getAs[Float]("ratio") === 1e10f)

    val r1 = rows.find(_.getAs[Long]("candid") == 101L).get
    assert(r1.getAs[String]("grade") === "B")
    assert(r1.getAs[Array[Byte]]("blob").toSeq === Seq[Byte](1, 2))
    assert(new String(r1.getAs[Array[Byte]]("tag16")) === "TAG1")
    assert(r1.getAs[Row]("candidate").getAs[Double]("jd") === 2460000.5)
    val r2 = rows.find(_.getAs[Long]("candid") == 102L).get
    assert(r2.isNullAt(r2.fieldIndex("maybe_mag")))
    assert(r2.getAs[scala.collection.Seq[Row]]("history").isEmpty)
  }

  test("DataFrame round-trips through writer + reader (per-partition files)") {
    val src = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("lang"),
        split(col("text"), " ").as("tokens"))
      .limit(200)
      .repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("avro_rt").toString
    AvroWriter.writeDataFrame(src, dir)
    val back = AvroReader.read(spark, s"$dir/part-*.avro")
    assert(back.count() === 200)
    // exact content equality both directions
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("null codec and nullable fields round-trip") {
    import spark.implicits._
    val src = Seq(
      (1L, Some("a"), Seq(1.0, 2.0)),
      (2L, None, Seq.empty[Double])).toDF("id", "name", "xs")
    val dir = java.nio.file.Files.createTempDirectory("avro_null").toString
    AvroWriter.writeDataFrame(src.coalesce(1), dir, codec = "null")
    val back = AvroReader.read(spark, s"$dir/part-*.avro")
    assert(back.count() === 2)
    assert(back.filter(col("name").isNull).select("id").collect()(0).getLong(0) === 2L)
    assert(back.exceptAll(src).count() === 0)
  }

  test("rewriting a directory clears stale part files from a wider run") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avro_stale").toString
    AvroWriter.writeDataFrame(
      (1L to 100L).toDF("v").repartition(8), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) === 8)
    AvroWriter.writeDataFrame(
      (1L to 10L).toDF("v").repartition(2), dir)
    val files = new java.io.File(dir).listFiles()
    assert(files.count(_.getName.endsWith(".avro")) === 2)
    assert(!files.exists(_.getName.contains(".tmp-")), "temp files left behind")
    assert(AvroReader.read(spark, s"$dir/part-*.avro").count() === 10)
  }

  test("empty glob and schema-evolved directories fail with clear errors") {
    import spark.implicits._
    val e1 = intercept[RuntimeException] {
      AvroReader.read(spark, "/tmp/definitely_absent_dir_x/*.avro")
    }
    assert(e1.getMessage.contains("no files match"))
    val e2 = intercept[RuntimeException] {
      AvroReader.readSplit(spark, "/tmp/definitely_absent_dir_x/*.avro")
    }
    assert(e2.getMessage.contains("no files match"))

    val dir = java.nio.file.Files.createTempDirectory("avro_evolved").toString
    AvroWriter.writeDataFrame(Seq((1L, "a")).toDF("id", "s").coalesce(1), dir)
    // second file under a different name so both survive the glob
    AvroWriter.writeDataFrame(Seq((1L, 2.0)).toDF("id", "d").coalesce(1),
      s"$dir/sub")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/sub/part-0.avro"),
      java.nio.file.Paths.get(s"$dir/part-1.avro"))
    val e3 = intercept[org.apache.spark.SparkException] {
      AvroReader.read(spark, s"$dir/part-*.avro").count()
    }
    assert(e3.getMessage.contains("differs from") ||
      Option(e3.getCause).exists(_.getMessage.contains("differs from")))
  }

  test("readSplit decodes one container across many byte-range splits") {
    val src = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .limit(400)
    val dir = java.nio.file.Files.createTempDirectory("avro_split").toString
    // one file, many small blocks so split boundaries land mid-file
    val schema = graft.sources.AvroWriter.schemaFor(src.schema)
    graft.sources.AvroWriter.write(s"$dir/one.avro", schema,
      src.collect().iterator, "deflate", blockRows = 16)
    val whole = AvroReader.read(spark, s"$dir/one.avro")
    assert(whole.count() === 400)
    // tiny maxSplitBytes forces multiple splits over the single file
    val split = AvroReader.readSplit(spark, s"$dir/one.avro",
      maxSplitBytes = 4096L)
    assert(split.count() === 400)
    assert(split.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(split).count() === 0)
    // degenerate range: splits larger than the file behave like read()
    val big = AvroReader.readSplit(spark, s"$dir/one.avro")
    assert(big.count() === 400)
  }

  test("readSplit loses no block when a boundary lands inside a sync marker") {
    val src = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(120)
    val dir = java.nio.file.Files.createTempDirectory("avro_hazard").toString
    val schema = graft.sources.AvroWriter.schemaFor(src.schema)
    graft.sources.AvroWriter.write(s"$dir/one.avro", schema,
      src.collect().iterator, "null", blockRows = 8)
    val expected = AvroReader.read(spark, s"$dir/one.avro")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val fileLen = new java.io.File(s"$dir/one.avro").length()
    // sweep maxSplitBytes so boundaries land at EVERY offset class mod
    // the block cadence — including inside and adjacent to sync markers
    // (the 16-byte hazard window this regression pins); a dropped or
    // double-read block shows up as a doc_id multiset mismatch
    for (msb <- 200L to math.min(fileLen, 2000L) by 7L) {
      val got = AvroReader.readSplit(spark, s"$dir/one.avro",
        maxSplitBytes = msb)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === expected, s"row multiset diverged at maxSplitBytes=$msb")
    }
    // and sweep the first boundary across the header's trailing sync
    // marker itself: msb in (blocksStart-16, blocksStart] once made BOTH
    // adjacent splits claim the first block (double-read regression)
    // (see snappy interop tests below for the codec axis)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/one.avro"))
    val blocksStart = AvroReader.container(bytes).blocksStart.toLong
    for (msb <- (blocksStart - 24) to (blocksStart + 8)) {
      val got = AvroReader.readSplit(spark, s"$dir/one.avro",
        maxSplitBytes = msb)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === expected, s"row multiset diverged at maxSplitBytes=$msb" +
        s" (blocksStart=$blocksStart)")
    }
  }

  test("snappy containers written by the Avro reference library read back") {
    // ground truth from org.apache.avro's own DataFileWriter (the
    // library spark-avro writes through; ships in /opt/spark/jars) with
    // its snappy codec — the default codec of spark-avro, previously an
    // 'unsupported codec' interop gap
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema: Schema = SchemaBuilder.record("doc").fields()
      .requiredLong("doc_id").requiredString("text").endRecord()
    val dir = java.nio.file.Files.createTempDirectory("avro_snappy").toString
    val f = new java.io.File(s"$dir/ref.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.snappyCodec())
    // small sync interval -> many blocks, so readSplit crosses block
    // boundaries too
    w.setSyncInterval(256)
    w.create(schema, f)
    val n = 300
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("doc_id", i.toLong)
      r.put("text", s"payload $i " + ("x" * (i % 37)))
      w.append(r)
    }
    w.close()
    val got = AvroReader.read(spark, f.getPath)
    assert(got.count() === n)
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until n.toLong))
    assert(got.filter(col("doc_id") === 5).select("text").head.getString(0)
      === "payload 5 xxxxx")
    val split = AvroReader.readSplit(spark, f.getPath, maxSplitBytes = 512)
    assert(split.count() === n)
    assert(split.exceptAll(got).count() === 0)
  }

  test("snappy round-trip through our writer; corrupt CRC is rejected") {
    import spark.implicits._
    val src = (0L until 200L).map(i => (i, s"text $i")).toDF("id", "t")
    val dir = java.nio.file.Files.createTempDirectory("avro_snap_rt").toString
    val schema = graft.sources.AvroWriter.schemaFor(src.schema)
    graft.sources.AvroWriter.write(s"$dir/rt.avro", schema,
      src.collect().iterator, "snappy", blockRows = 16)
    val back = AvroReader.read(spark, s"$dir/rt.avro")
    assert(back.count() === 200)
    assert(back.exceptAll(src).count() === 0 && src.exceptAll(back).count() === 0)
    // the reference library must also read our container
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val rd = new DataFileReader[GenericRecord](
      new java.io.File(s"$dir/rt.avro"), new GenericDatumReader[GenericRecord]())
    var cnt = 0
    while (rd.hasNext) { rd.next(); cnt += 1 }
    rd.close()
    assert(cnt === 200, "org.apache.avro could not read our snappy container")
    // flip one payload byte: CRC verification must reject the block
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/rt.avro"))
    val c = AvroReader.container(bytes)
    bytes(c.blocksStart + 4) = (bytes(c.blocksStart + 4) ^ 0x1).toByte
    val corrupt = java.nio.file.Paths.get(s"$dir/corrupt.avro")
    java.nio.file.Files.write(corrupt, bytes)
    val e = intercept[Throwable] {
      AvroReader.read(spark, corrupt.toString).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null &&
      (m.contains("CRC") || m.contains("FAILED_TO_UNCOMPRESS") ||
        m.contains("corrupt"))), s"unexpected error: $e")
  }

  test("zstandard containers written by the Avro reference library read back") {
    // ground truth from org.apache.avro's own ZstandardCodec (stream
    // frames without a content-size header — the family a one-shot
    // decoder cannot read), crossing block boundaries via readSplit
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema: Schema = SchemaBuilder.record("doc").fields()
      .requiredLong("doc_id").requiredString("text").endRecord()
    val dir = java.nio.file.Files.createTempDirectory("avro_zstd").toString
    val f = new java.io.File(s"$dir/ref.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.zstandardCodec(3))
    w.setSyncInterval(256)
    w.create(schema, f)
    val n = 300
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("doc_id", i.toLong)
      r.put("text", s"payload $i " + ("z" * (i % 37)))
      w.append(r)
    }
    w.close()
    val got = AvroReader.read(spark, f.getPath)
    assert(got.count() === n)
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until n.toLong))
    assert(got.filter(col("doc_id") === 5).select("text").head.getString(0)
      === "payload 5 zzzzz")
    val split = AvroReader.readSplit(spark, f.getPath, maxSplitBytes = 512)
    assert(split.count() === n)
    assert(split.exceptAll(got).count() === 0)
  }

  test("zstandard round-trips through our writer and the reference library reads it") {
    import spark.implicits._
    val src = (0L until 200L).map(i => (i, s"text $i")).toDF("id", "t")
    val dir = java.nio.file.Files.createTempDirectory("avro_zstd_rt").toString
    val schema = graft.sources.AvroWriter.schemaFor(src.schema)
    graft.sources.AvroWriter.write(s"$dir/rt.avro", schema,
      src.collect().iterator, "zstandard", blockRows = 16)
    val back = AvroReader.read(spark, s"$dir/rt.avro")
    assert(back.count() === 200)
    assert(back.exceptAll(src).count() === 0 && src.exceptAll(back).count() === 0)
    // the reference library must also read our container
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val rd = new DataFileReader[GenericRecord](
      new java.io.File(s"$dir/rt.avro"), new GenericDatumReader[GenericRecord]())
    var cnt = 0
    while (rd.hasNext) { rd.next(); cnt += 1 }
    rd.close()
    assert(cnt === 200, "org.apache.avro could not read our zstandard container")
    // and the simple one-shot zstd API (frames WITH a content-size
    // header) must interop with our streaming block decoder too
    val raw = (0 until 64).map(i => s"row $i").mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val oneShot = com.github.luben.zstd.Zstd.compress(raw, 3)
    val c = AvroReader.container(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/rt.avro")))
    val zc = c.copy() // same codec field ("zstandard"), inflate directly
    assert(java.util.Arrays.equals(zc.inflate(oneShot, oneShot.length), raw),
      "one-shot zstd frame did not stream-decode")
  }
}
