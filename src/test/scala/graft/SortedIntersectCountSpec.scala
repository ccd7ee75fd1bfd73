package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SortedIntersectCount

class SortedIntersectCountSpec extends SparkSpec {

  test("matches size(array_intersect) on sorted hashed shingle sets") {
    val sets = Tables.t(spark, sf, "documents")
      .select(col("doc_id").as("id"),
        graft.dedup.Dedup.hashedShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val pairs = sets.as("a").join(sets.as("b"),
        col("a.id") % 7 === col("b.id") % 7 && col("a.id") < col("b.id"))
      .select(col("a.sh").as("sh1"), col("b.sh").as("sh2"))
    val diff = pairs.select(
        SortedIntersectCount(col("sh1"), col("sh2")).as("merge"),
        size(array_intersect(col("sh1"), col("sh2"))).as("hash"))
      .filter(col("merge") =!= col("hash")).count()
    assert(diff === 0)
  }

  test("duplicates count once; empty and null behave like array_intersect") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 1L, 2L, 5L)), Some(Seq(1L, 2L, 2L, 9L))), // dupes -> {1,2}
      (Some(Seq.empty[Long]), Some(Seq(1L))),
      (None, Some(Seq(1L)))).toDF("a", "b")
    val r = df.select(SortedIntersectCount(col("a"), col("b")).as("c")).collect()
    assert(r(0).getInt(0) === 2)
    assert(r(1).getInt(0) === 0)
    assert(r(2).isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    val sets = Tables.t(spark, sf, "documents")
      .select(graft.dedup.Dedup.hashedShingles(col("text"), 3).as("sh"))
    val plan = sets.select(SortedIntersectCount(col("sh"), col("sh")).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Project [sortedintersectcount") &&
      plan.contains("*(1)"), plan.take(500))
  }
}
