// dev scratch (r17): stage-width audit of the text-side pair family —
// after the d6 AQE-coalesce find (SCALE_r17 §7), check whether the
// exact pair statements' quadratic stages also run byte-coalesced at
// small corpora.
// Usage: runMain graft.tools.PairStageProbe <query> [sfDir]
package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
object PairStageProbe {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("d14_containment")
    val dir = args.lift(1).getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
        if (ms.getOrElse(0L) > 300)
          println(f"[stage] id=${i.stageId}%3d tasks=${i.numTasks}%3d " +
            f"wall=${ms.getOrElse(-1L)}%6d ms cpu=${i.taskMetrics.executorCpuTime / 1000000}%6d ms" +
            f"  ${i.name.take(45)}")
      }
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(q)(spark, dir).count()
    println(f"[pairprobe] $q rows=$n wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    Thread.sleep(500)
    spark.stop()
  }
}
