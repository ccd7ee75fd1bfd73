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

  test("near-unique group keys degrade to the spillable sort pass, result window-equivalent") {
    import spark.implicits._
    // 3 rows per group, 100 groups, one partition, cap 10: the heap
    // pass breaches mid-stream and the partition must complete through
    // the sort-based fallback with the exact window-formulation result
    val manyGroups = (0L until 300L).map(i => (i % 100L, i))
      .toDF("g", "v").coalesce(1)
    val got = TopKPerGroup(manyGroups, 2, Seq(col("g")),
        Seq(col("v").desc), maxGroupsPerPartition = 10L)
      .select("g", "v").orderBy("g", "v").collect().map(_.toSeq)
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
    val exp = manyGroups.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2).select("g", "v")
      .orderBy("g", "v").collect().map(_.toSeq)
    assert(exp.length === 200)
    assert(got === exp,
      "degraded partition diverged from the window formulation")
  }

  test("degrade is exact when the breach lands mid-group (pre-breach evictions)") {
    import spark.implicits._
    // group-interleaved input: every group has rows BOTH before and
    // after the breach, so correctness requires the superset argument
    // (heap contents + remainder covers each group's true top-k)
    val rows = (0L until 1000L).map { i => (i % 50L, (i * 7919L) % 1000L) }
    val df = rows.toDF("g", "v").coalesce(1)
    val got = TopKPerGroup(df, 3, Seq(col("g")),
        Seq(col("v").asc, col("g").asc), maxGroupsPerPartition = 5L)
      .select("g", "v").orderBy("g", "v").collect().map(_.toSeq)
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc, col("g").asc)
    val exp = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).select("g", "v")
      .orderBy("g", "v").collect().map(_.toSeq)
    assert(got === exp)
  }

  test("empty group list is a named argument error pointing at orderBy+limit") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("g", "v")
    val ex = intercept[IllegalArgumentException] {
      TopKPerGroup(df, 1, Seq.empty, Seq(col("v").asc))
    }
    assert(ex.getMessage.contains("orderBy"),
      s"guard must name the global formulation: ${ex.getMessage}")
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
