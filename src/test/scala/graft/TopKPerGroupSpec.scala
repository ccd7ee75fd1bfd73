package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.{TopKPerGroup, TopKPerGroupExec}

/** The custom whole-operator extension (LogicalPlan + Strategy +
  * SparkPlan): heap-based per-group top-k. Pins result equality with
  * the window formulation, the sort-free plan shape, small-group
  * totality, and strategy injection via GraftExtensions.
  */
class TopKPerGroupSpec extends SparkSpec {

  private lazy val events = Tables.t(spark, sf, "events")

  test("equals the window row_number formulation under a total ordering") {
    val got = TopKPerGroup(events, 3, Seq(col("user_id")),
        Seq(col("value").desc, col("event_id").asc))
      .select("user_id", "event_id", "value")
      .orderBy("user_id", "event_id")
      .collect().map(_.toSeq)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val exp = events
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("user_id", "event_id", "value")
      .orderBy("user_id", "event_id")
      .collect().map(_.toSeq)
    assert(exp.nonEmpty)
    assert(got === exp)
  }

  test("plan: TopKPerGroupExec over one exchange, no Sort, no Window") {
    val df = TopKPerGroup(events, 2, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id").asc))
    // string-match: AdaptiveSparkPlanExec hides its inner plan from
    // child traversal, but renders it
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TopKPerGroup "), s"custom exec missing:\n$s")
    assert(!s.contains("Window"), "the whole point is no window")
    assert(!s.contains("Sort "), s"heap pass must not sort:\n$s")
    assert(s.contains("Exchange hashpartitioning"),
      "planner must satisfy the clustered distribution with one hash exchange")
  }

  test("groups smaller than k return all their rows; k=1 is per-group argmin") {
    import spark.implicits._
    val tiny = Seq((1L, 10L, 5.0), (1L, 11L, 7.0), (2L, 20L, 1.0))
      .toDF("g", "id", "v")
    val all = TopKPerGroup(tiny, 5, Seq(col("g")), Seq(col("v").asc, col("id").asc))
      .collect()
    assert(all.length === 3, "k above group size keeps every row")
    val top1 = TopKPerGroup(tiny, 1, Seq(col("g")),
        Seq(col("v").desc, col("id").asc))
      .select("g", "id").orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.toSeq === Seq((1L, 11L), (2L, 20L)))
  }

  test("near-unique group keys fail loudly at the partition group cap") {
    import spark.implicits._
    val manyGroups = (0L until 100L).map(i => (i, i)).toDF("g", "v")
      .coalesce(1)
    val ex = intercept[org.apache.spark.SparkException] {
      TopKPerGroup(manyGroups, 1, Seq(col("g")), Seq(col("v").asc),
        maxGroupsPerPartition = 10L).collect()
    }
    assert(ex.getMessage.contains("maxGroupsPerPartition") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxGroupsPerPartition")),
      s"expected the named guard, got: ${ex.getMessage}")
  }

  test("float group keys normalize: -0.0 groups with 0.0 like a window would") {
    import spark.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (1.0, 3L)).toDF("g", "id")
    val got = TopKPerGroup(df, 5, Seq(col("g")), Seq(col("id").asc))
      .groupBy("g").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got === Map(0.0 -> 2L, 1.0 -> 1L),
      "-0.0 and 0.0 must be one group (NormalizeFloatingNumbers semantics)")
  }

  test("GraftExtensions injects the planner strategy") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies =
      org.apache.spark.sql.graft.GraftFunctions.plannerStrategies(ext, spark)
    assert(strategies.contains(org.apache.spark.sql.graft.TopKPerGroupStrategy))
  }
}
