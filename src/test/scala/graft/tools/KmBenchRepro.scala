package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: reproduce the Bench flow for s7 (fresh-session, 5 reps,
  * cache cleared per rep) with per-job wall times, switchable arm.
  */
object KmBenchRepro {
  def main(args: Array[String]): Unit = {
    val arm = args.lift(0).getOrElse("expr") // expr | join
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, e.time)
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val ms = e.time - jobs.getOrDefault(e.jobId, e.time)
        lines.add(f"    job ${e.jobId}%3d ${ms}%6d ms")
      }
    })
    graft.Tables.names.foreach { n =>
      try graft.Tables.t(spark, sfDir, n).count() catch { case _: Throwable => }
    }
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    for (rep <- 0 until 5) {
      spark.sharedState.cacheManager.clearCache()
      lines.clear()
      val t0 = System.nanoTime()
      val df =
        if (arm == "expr")
          graft.sim.Similarity.kmeansCells(emb, "vec_id", "embedding", 8, 3)
        else
          graft.sim.Similarity.kmeansCellsJoin(emb, "vec_id", "embedding", 8, 3)
      df.select(col("id").as("vec_id"), col("cell")).orderBy("vec_id")
        .queryExecution.toRdd.foreach(_ => ())
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"== $arm rep$rep: $s%.3f s")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
