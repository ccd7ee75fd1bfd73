package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DotProduct

import graft.dedup.Vec

class DotProductSpec extends SparkSpec {

  test("native dot product matches the HOF fold bit-for-bit") {
    val emb = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = emb.limit(1).select(col("v").as("qv"))
    val both = emb.join(broadcast(q))
      .select(
        DotProduct(col("v"), col("qv")).as("native"),
        Vec.dotHof(col("v"), col("qv")).as("hof"))
    assert(both.filter(!(col("native") <=> col("hof"))).count() === 0)
  }

  test("expression participates in whole-stage codegen") {
    val emb = Tables.t(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
    val plan = emb.select(DotProduct(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators compiled into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [dotproduct"), plan.take(500))
  }

  test("null semantics: null array yields null, length mismatch truncates") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 99.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val r = df.select(DotProduct(col("a"), col("b")).as("d")).collect()
    assert(r(0).getDouble(0) === 11.0)
    assert(r(1).isNullAt(0))
  }
}
