package graft

import org.apache.spark.sql.functions._

/** The native Int8Quantize kernel must be bit-identical to the former
  * HOF chain (array_max/transform/floor/least/greatest) — including
  * the edge semantics the chain gets from SQL null-skipping and the
  * long-valued floor: null elements clamp to 127, NaN elements floor
  * to 0, +-Inf clamps, a zero/underflowed scale zeroes the vector, an
  * all-null vector codes all-127, a null vector stays null.
  */
class Int8QuantizeSpec extends SparkSpec {

  test("kernel equals the HOF chain on adversarial vectors") {
    import scala.jdk.CollectionConverters._
    val D = java.lang.Double.valueOf(_: Double)
    val rows: Seq[Seq[java.lang.Double]] = Seq(
      Seq(D(1.0), D(-2.5), D(127.0), D(0.3)),
      Seq(D(0.0), D(0.0)),                       // zero vector
      Seq(D(-0.0), D(0.0)),                      // signed zero
      Seq(D(Double.NaN), D(1.0)),                // NaN scale + NaN elem
      Seq(D(1e300), D(-1e300), D(2.0)),          // huge scale
      Seq(D(Double.PositiveInfinity), D(1.0)),   // Inf scale
      Seq(D(1.0), D(Double.NegativeInfinity)),
      Seq(D(java.lang.Double.MIN_VALUE)),        // subnormal: scale underflows to 0
      Seq(null, D(3.0), null),                   // null elements
      Seq(null, null),                           // all-null (null scale)
      Seq.empty,                                 // empty array
      null                                       // null vector
    )
    val rnd = new scala.util.Random(99)
    val fuzz = (0 until 200).map(_ =>
      Seq.fill(8)(D(math.rint(rnd.nextDouble() * 1000 - 500) / 8.0)))
    val data = (rows ++ fuzz).zipWithIndex.map { case (v, i) =>
      org.apache.spark.sql.Row(i.toLong, if (v == null) null else v)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true))))
    val df = spark.createDataFrame(data.asJava, schema)
    val got = df.select(col("id"),
        graft.sim.Quantize.int8CodeCol(col("v")).as("a"),
        graft.sim.Quantize.int8CodeColHof(col("v")).as("b"))
      .collect()
    got.foreach { r =>
      val a = if (r.isNullAt(1)) null else r.getSeq[Any](1)
      val b = if (r.isNullAt(2)) null else r.getSeq[Any](2)
      // compare via bit images so NaN == NaN and -0.0 != 0.0
      def bits(x: Seq[Any]): Seq[Any] = if (x == null) null else x.map {
        case null => null
        case d: java.lang.Double =>
          java.lang.Double.doubleToRawLongBits(d.doubleValue())
      }
      assert(bits(a) === bits(b), s"id=${r.getLong(0)}: kernel diverges")
    }
  }
}
