package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r17): per-phase timing of the kmeansCells arms. */
object KmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    sc.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        stages.add(f"    stage ${i.stageId}%4d ${ms}%6d ms  tasks=${i.numTasks}%3d  ${i.name.takeWhile(_ != '\n').take(70)}")
      }
    })
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    emb.count()
    def timed(tag: String)(f: => Unit): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"== $tag: $s%.2f s")
      stages.forEach(l => println(l))
    }
    for (rep <- 0 until 2) {
      timed(s"new expr arm rep$rep") {
        graft.sim.Similarity.kmeansCells(emb, "vec_id", "embedding", 8, 3)
          .select(col("id").as("vec_id"), col("cell")).orderBy("vec_id")
          .queryExecution.toRdd.foreach(_ => ())
      }
      timed(s"old join arm rep$rep") {
        graft.sim.Similarity.kmeansCellsJoin(emb, "vec_id", "embedding", 8, 3)
          .select(col("id").as("vec_id"), col("cell")).orderBy("vec_id")
          .queryExecution.toRdd.foreach(_ => ())
      }
    }
    spark.stop()
  }
}

/** Dump the executed plan of one expression-arm iteration pass. */
object KmPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val codes0 = graft.sim.Quantize.int8Codes(emb, "vec_id", "embedding")
    val seedRows = codes0.filter(col("id") < 8)
      .select(col("id"), col("q")).collect()
    val cb = org.apache.spark.sql.graft.Codebook.build(seedRows.map { r =>
      r.getLong(0) -> r.getSeq[Any](1).map {
        case d: java.lang.Double => d.doubleValue()
        case x: java.lang.Number => x.doubleValue()
      }.toArray
    })
    val bc = spark.sparkContext.broadcast(cb)
    val sums = codes0.select(col("q"),
        org.apache.spark.sql.graft.NearestCodebookCell(col("q"), bc).as("cell"))
      .select(col("cell"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("x").cast("long")).as("s"), count(lit(1)).as("n"))
    sums.collect()
    println(sums.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
