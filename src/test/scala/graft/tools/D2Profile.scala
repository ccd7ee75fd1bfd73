package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.dedup.Dedup

/** Stage-level profiling harness for d2 (test tree only — not part of
  * the library surface). Run:
  *   sbt "Test/runMain graft.tools.D2Profile /root/testdata/sf0.1"
  */
object D2Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.t(spark, dir, "documents")
    docs.count()
    val threshold = 0.5

    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      println(s"== run $i ==")
      val sets = time("sets cache") {
        val s = docs.select(col("doc_id").as("id"),
            Dedup.hashedShingles(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0)
          .select(col("id"), col("sh"), size(col("sh")).as("nsh"))
          .cache()
        s.count(); s
      }
      val pref = time("pref cache") {
        val ex = sets.select(col("id"), col("nsh"), explode(col("sh")).as("g"))
        val freq = ex.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
        val p = ex.join(freq, "g")
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("id")).orderBy(col("cnt"), col("g"))))
          .filter(col("rn") <= (col("nsh") - ceil(col("nsh") * threshold) + 1) &&
            col("cnt") >= 2)
          .select(col("id"), col("nsh"), col("g"), col("rn"))
          .cache()
        println(s"   pref rows: ${p.count()}")
        p
      }
      val cand = time("cand groupBy") {
        val minOverlap = (col("a.nsh") + col("b.nsh")) * (threshold / (1.0 + threshold))
        val c = pref.as("a").join(pref.as("b"),
            col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
              least(col("a.nsh"), col("b.nsh")) >=
                greatest(col("a.nsh"), col("b.nsh")) * threshold &&
              (lit(1) + least(col("a.nsh") - col("a.rn"), col("b.nsh") - col("b.rn"))) >=
                minOverlap)
          .groupBy(col("a.id").as("d1"), col("b.id").as("d2"))
          .agg(first(col("a.nsh")).as("n1"), first(col("b.nsh")).as("n2"),
            count(lit(1)).as("kpre"),
            max(col("a.rn")).as("ra"), max(col("b.rn")).as("rb"))
          .filter(col("kpre") + least(col("n1") - col("ra"), col("n2") - col("rb")) >=
            (col("n1") + col("n2")) * (threshold / (1.0 + threshold)))
          .select(col("d1"), col("d2"), col("n1"), col("n2"))
          .cache()
        println(s"   cand rows: ${c.count()}")
        c
      }
      time("verify") {
        val v = cand
          .join(sets.select(col("id").as("d1"), col("sh").as("sh1")), "d1")
          .join(sets.select(col("id").as("d2"), col("sh").as("sh2")), "d2")
          .withColumn("inter",
            org.apache.spark.sql.graft.SortedIntersectCount(col("sh1"), col("sh2")))
          .withColumn("jac", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
          .filter(col("jac") >= threshold)
          .select(col("d1"), col("d2"), col("jac"))
          .orderBy("d1", "d2")
        println(s"   out rows: ${v.count()}")
      }
    }
    spark.stop()
  }
}
