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
}
