// dev scratch (r16): run ONE driver-board query cold in a fresh
// session with the Bench materialization protocol (toRdd.foreach) —
// the cold-reference measurement discipline BASELINE.md's adjudication
// table requires (a query issued after other work in the same session
// is warm-context and recognizable by undercutting its stage sum).
// Usage: runMain graft.tools.ColdQuery <queryName> [sfDir]
package graft.tools

import org.apache.spark.sql.SparkSession

object ColdQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: ColdQuery <queryName> [sfDir]"))
    val dir = if (args.length > 1) args(1) else "/tmp/sf100"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    val t0 = System.nanoTime()
    q(spark, dir).queryExecution.toRdd.foreach(_ => ())
    println(f"[cold] $name $dir ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
