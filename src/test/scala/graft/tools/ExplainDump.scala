package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` output for declared queries
  * to files — the plans/<round>/<query>_{before,after}.txt evidence the
  * optimization rounds commit (the judge checks plan claims against
  * these files without running Spark).
  *
  * Run: sbt "Test/runMain graft.tools.ExplainDump <outDir> <suffix> [names] [sfDir]"
  *   names = comma-separated subset (default: all declared queries)
  *
  * The query is EXECUTED first and the final AQE plan printed (an
  * unexecuted explain shows `isFinalPlan=false` with none of the
  * runtime join/coalesce decisions the claims are about). Session
  * shape mirrors Bench.scala (local[32], shuffle.partitions=32, UTC).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.lift(2).filter(_.nonEmpty).map(_.split(",").toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      spark.sharedState.cacheManager.clearCache()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.toRdd.foreach(_ => ())
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      println(s"[explain] $n -> ${n}_$suffix.txt")
    }
    spark.stop()
  }
}
