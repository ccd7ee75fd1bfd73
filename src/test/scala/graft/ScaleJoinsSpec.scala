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

  test("intervalJoin: matches the theta-join, half-open bounds, multi-bucket spans") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextInt(200).toLong))
      .toDF("pid", "p")
    // intervals of length 0..12: some empty, some spanning several
    // width-5 buckets
    val ivs = (1 to 80).map { i =>
      val s = rnd.nextInt(200).toLong
      (1000L + i, s, s + rnd.nextInt(13))
    }.toDF("iid", "lo", "hi")
    val got = ScaleJoins.intervalJoin(pts, "p", ivs, "lo", "hi", bucketWidth = 5L)
      .select("pid", "iid")
    val want = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid")
    assert(got.count() === want.count())
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
    // each matching pair appears exactly once (no per-bucket duplicates)
    assert(got.groupBy("pid", "iid").count().filter(col("count") > 1).count() === 0)
    // half-open: point at start matches, point at end does not
    val one = Seq((1L, 10L)).toDF("pid", "p")
    val iv = Seq((9L, 10L, 12L)).toDF("iid", "lo", "hi")
    assert(ScaleJoins.intervalJoin(one, "p", iv, "lo", "hi", 5L).count() === 1)
    val atEnd = Seq((1L, 12L)).toDF("pid", "p")
    assert(ScaleJoins.intervalJoin(atEnd, "p", iv, "lo", "hi", 5L).count() === 0)
  }

  test("asofJoin: backward inclusive match, unmatched nulls, whole-row carry") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 15L, "e2"), (1L, 20L, "e3"),
      (2L, 5L, "e4"), (3L, 7L, "e5"))
      .toDF("k", "lts", "tag")
    val right = Seq((1L, 10L, Some(1.0)), (1L, 15L, None), (1L, 18L, Some(3.0)),
      (2L, 99L, Some(9.9)))
      .toDF("k", "rts", "v")
    val out = ScaleJoins.asofJoin(left, right, "k", "lts", "rts",
        Seq("rts", "v"))
      .orderBy("k", "lts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    // e1: right AT 10 matches (inclusive); e2: the ts=15 row matches
    // even though its v is null — whole-row carry must NOT resurrect
    // the older v=1.0; e3: latest at 18; e4: future-only right -> null;
    // e5: keyless -> null
    assert(out(0) === ((1L, 10L, "e1", 10L, 1.0)))
    assert(out(1)._4 === 15L)
    assert(out(1)._5.isNaN)
    assert(out(2) === ((1L, 20L, "e3", 18L, 3.0)))
    assert(out(3)._4 === -1L && out(3)._5.isNaN)
    assert(out(4)._4 === -1L && out(4)._5.isNaN)
  }

  test("asofJoin plan: one shuffle on the key, no join node, output == |left|") {
    import spark.implicits._
    val left = (1 to 500).map(i => (i.toLong % 7, i.toLong, i)).toDF("k", "lts", "p")
    val right = (1 to 200).map(i => (i.toLong % 7, i.toLong * 2, i * 1.0))
      .toDF("k", "rts", "v")
    val joined = ScaleJoins.asofJoin(left, right, "k", "lts", "rts", Seq("v"))
    val plan = joined.queryExecution.executedPlan.toString
    // union-and-carry: a window over the key, never a join operator
    // (a range join here would explode per-key cross products)
    assert(!plan.contains("Join"), plan.take(600))
    assert(plan.contains("Window"), plan.take(600))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles === 1, s"expected exactly one key shuffle:\n${plan.take(800)}")
    assert(joined.count() === left.count())
  }
}
