package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (r17): q1's single-scan aggregate — split count and the
  * repartition-before-agg headroom at sf0.1.
  */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.t(spark, sfDir, "lineitem")
    li.count()
    println(s"scan partitions: ${li.rdd.getNumPartitions}, rows: ${li.count()}")
    def q1(df: org.apache.spark.sql.DataFrame) = {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
      def sumd(c: org.apache.spark.sql.Column) = sum(dec(c)).cast("double")
      df.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sumd(col("l_quantity")).as("sum_qty"),
          sumd(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }
    for (rep <- 0 until 3; (tag, df) <- Seq(
        "asis" -> li, "repart32" -> li.repartition(32))) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      q1(df).queryExecution.toRdd.foreach(_ => ())
      println(f"== $tag rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
