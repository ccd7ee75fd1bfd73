package graft

import org.apache.spark.sql.functions._

import graft.functions.ScaleJoins

class ScaleJoinsSpec extends SparkSpec {

  test("bucketed tables join without an exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val li = Tables.t(s, sf, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.t(s, sf, "orders").select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    ScaleJoins.writeBucketed(li, "li_b", "l_orderkey", 8)
    ScaleJoins.writeBucketed(o, "o_b", "l_orderkey", 8)
    val joined = s.table("li_b").join(s.table("o_b"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(300))
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle:\n" + plan.take(600))
    // correctness: same count as the plain join
    assert(joined.count() === li.join(o, "l_orderkey").count())
    s.sql("DROP TABLE li_b"); s.sql("DROP TABLE o_b")
  }

  test("salted join is exact and splits hot keys") {
    import spark.implicits._
    // heavily skewed left side: one hot key
    val left = (1 to 10000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "payload")
    val right = Seq((1L, "hot"), (2L, "a"), (30L, "b")).toDF("k", "label")
    val plain = left.join(right, "k")
    val salted = ScaleJoins.saltedJoin(left, right, "k", salts = 8,
      saltSource = "payload")
    assert(salted.count() === plain.count())
    // every original row pair appears exactly once
    assert(salted.groupBy("k", "payload").count()
      .filter(col("count") > 1).count() === 0)
  }
}
