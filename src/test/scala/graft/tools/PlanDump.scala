package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump physical-plan shape stats for one or more queries.
  *
  * Run: sbt "Test/runMain graft.tools.PlanDump t8_tfidf [sfDir]"
  * With AQE, the POST-EXECUTION plan is printed (exchange reuse only
  * materializes there), so the query is executed first.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.toRdd.foreach(_ => ())
      val p = df.queryExecution.executedPlan.toString
      println(s"== $n ==")
      println(s"  scans=${"FileScan".r.findAllIn(p).length}" +
        s" exchanges=${"Exchange hashpartitioning".r.findAllIn(p).length}" +
        s" reused=${"ReusedExchange".r.findAllIn(p).length}" +
        s" broadcasts=${"BroadcastExchange".r.findAllIn(p).length}" +
        s" smj=${"SortMergeJoin".r.findAllIn(p).length}" +
        s" bhj=${"BroadcastHashJoin".r.findAllIn(p).length}")
      if (sys.env.contains("PLAN_FULL")) println(p)
    }
    spark.stop()
  }
}
