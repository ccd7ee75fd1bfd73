// dev scratch (r17): d6-body stage profile under both assignment arms
// — where do the reduce tasks of the within-cell self-join land, and
// why does the expression arm serialize where the join arm spread.
// Usage: runMain graft.tools.D6StageProbe2 [sfDir] [expr|join]
package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object D6StageProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val arm = args.lift(1).getOrElse("expr")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
        println(f"[stage:$arm] id=${i.stageId}%3d tasks=${i.numTasks}%3d " +
          f"wall=${ms.getOrElse(-1L)}%6d ms cpu=${i.taskMetrics.executorCpuTime / 1000000}%6d ms" +
          f"  ${i.name.take(50)}")
      }
    })
    val emb = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cells = graft.sim.Similarity.autoCells(emb, "vec_id")
    val Vec = graft.dedup.Vec
    val a0 =
      if (arm == "join")
        graft.sim.Similarity.assignCellsJoin(emb, "vec_id", "embedding", cells)
      else graft.sim.Similarity.assignCells(emb, "vec_id", "embedding", cells)
    val assigned = a0
      .withColumn("nrm", sqrt(Vec.dot(col("v"), col("v"))))
      .filter(col("nrm") > 0.0)
      .cache()
    val t0 = System.nanoTime()
    val pairs = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("cos", Vec.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= 0.95)
      .count()
    println(f"[d6p2:$arm] pairs=$pairs wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    Thread.sleep(500)
    spark.stop()
  }
}
