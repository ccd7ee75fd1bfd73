package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.graft.GraftFunctions

class GraftExtensionsSpec extends SparkSpec {

  test("register exposes the native expressions to pure SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 7L)) AS c
        |""".stripMargin).head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getInt(1) === 2)
    assert(spark.sql("SELECT native_ln(3.0d)").head().getDouble(0)
      === math.log(3.0))
    // the selection drill's order-preserving bit image, SQL-callable
    val bits = spark.sql(
      "SELECT double_sortable_bits(-0.0d) AS a, double_sortable_bits(0.0d) AS b")
      .head()
    assert(bits.getLong(0) === -1L && bits.getLong(1) === 0L,
      "-0.0 must rank immediately below +0.0")
  }

  test("SQL dot_product equals the Column-API DotProduct on real embeddings") {
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) AS v")
    e.createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      "SELECT vec_id, dot_product(v, v) AS d FROM emb_ext ORDER BY vec_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val viaCol = e.select(org.apache.spark.sql.functions.col("vec_id"),
        graft.dedup.Vec.dot(org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.col("v")).as("d"))
      .orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("the extensions class injects the same function set at session build") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = GraftFunctions.applyTo(ext, GraftFunctions.freshRegistry)
    assert(reg.functionExists(FunctionIdentifier("dot_product")))
    assert(reg.functionExists(FunctionIdentifier("sorted_intersect_count")))
    assert(!GraftFunctions.freshRegistry.functionExists(
      FunctionIdentifier("dot_product")), "builtin registry must be untouched")
  }
}
