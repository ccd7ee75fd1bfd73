// dev scratch (r17): stage-level timing of the d6 sf1 regression —
// which stage absorbs the extra ~22 s on the expression-arm build.
// Usage: runMain graft.tools.D6StageProbe [sfDir]
package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object D6StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
        println(f"[stage] id=${i.stageId}%3d tasks=${i.numTasks}%3d " +
          f"wall=${ms.getOrElse(-1L)}%6d ms cpu=${i.taskMetrics.executorCpuTime / 1000000}%6d ms " +
          f"run=${i.taskMetrics.executorRunTime}%6d ms  ${i.name.take(60)}")
      }
    })
    val emb = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val pairs = graft.dedup.Dedup.embeddingDupPairs(
      emb, "vec_id", "embedding", 0.95)
    val t0 = System.nanoTime()
    val n = pairs.count()
    println(f"[d6plan] pairs=$n wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    Thread.sleep(500)
    spark.stop()
  }
}
