package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.dedup.Dedup

// temporary profiling harness for d2 — not part of the library surface
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.t(spark, dir, "documents")
    docs.count()

    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      println(s"== run $i ==")
      val threshold = 0.5
      val sets = time("sets cache") {
        val s = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0)
          .select(col("id"), col("sh"), size(col("sh")).as("nsh"))
          .cache()
        s.count(); s
      }
      val ex = sets.select(col("id"), explode(col("sh")).as("g"))
      val freq = ex.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      val ranked = time("ranked cache") {
        val r = ex.join(freq, "g")
          .groupBy(col("id"))
          .agg(sort_array(collect_list(struct(col("cnt"), col("g")))).as("ranked"))
          .withColumn("nsh", size(col("ranked")))
          .withColumn("npref",
            (col("nsh") - ceil(col("nsh") * threshold) + 1).cast("int"))
          .select(col("id"), col("nsh"),
            explode(expr("slice(ranked, 1, npref)")).as("st"))
          .filter(col("st.cnt") >= 2)
          .select(col("id"), col("nsh"), col("st.g").as("g"))
          .cache()
        println(s"   ranked rows: ${r.count()}")
        r
      }
      val cand = time("cand distinct") {
        val c = ranked.as("a").join(ranked.as("b"),
            col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
              least(col("a.nsh"), col("b.nsh")) >=
                greatest(col("a.nsh"), col("b.nsh")) * threshold)
          .select(col("a.id").as("d1"), col("b.id").as("d2")).distinct()
          .cache()
        println(s"   cand rows: ${c.count()}")
        c
      }
      time("verify") {
        val v = cand
          .join(sets.select(col("id").as("d1"), col("sh").as("sh1"), col("nsh").as("n1")), "d1")
          .join(sets.select(col("id").as("d2"), col("sh").as("sh2"), col("nsh").as("n2")), "d2")
          .filter(least(col("n1"), col("n2")) >= greatest(col("n1"), col("n2")) * threshold)
          .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
          .withColumn("jac", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
          .filter(col("jac") >= threshold)
          .select(col("d1"), col("d2"), col("jac"))
        println(s"   out rows: ${v.count()}")
      }
    }
    spark.stop()
  }
}
