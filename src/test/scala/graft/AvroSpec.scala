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
}
