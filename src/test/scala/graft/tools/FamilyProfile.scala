package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the text-family shared materialization vs standalone runs. */
object FamilyProfile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.t(spark, dir, "documents")
    docs.count()
    val isBench = col("doc_id") % 97 === 0
    def med(f: => Unit): Double = {
      val ts = (0 until 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    val tStandalone = med {
      graft.text.TfIdf.topTerm(docs, "doc_id", "text")
        .queryExecution.toRdd.foreach(_ => ())
      graft.SparkEntry.queries("t3_token_stats")(spark, dir)
        .queryExecution.toRdd.foreach(_ => ())
      graft.text.Decontaminate.flags(docs, "doc_id", "text", isBench, 4)
        .queryExecution.toRdd.foreach(_ => ())
    }
    val tFamily = med {
      val fam = graft.text.TextFamily.run(docs, "doc_id", "text",
        "source", isBench, 4)
      try {
        fam.topTerm.queryExecution.toRdd.foreach(_ => ())
        fam.tokenStats.queryExecution.toRdd.foreach(_ => ())
        fam.decontamination.queryExecution.toRdd.foreach(_ => ())
      } finally fam.unpersist()
    }
    println(f"standalone sum: $tStandalone%.2f s, family: $tFamily%.2f s " +
      f"(${tStandalone / tFamily}%.2fx)")
    spark.stop()
  }
}
