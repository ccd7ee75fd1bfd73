// dev scratch (r17): end-to-end reproducer for the memberless-super
// defect (see DegenerateSeedSearch). 66 seed cells (> TwoLevelGate),
// supers 0..8; supers 0/1/2 are ulp-perturbed near-identical vectors
// whose FP sqDist pattern (d01<0, d02<d01, d12>d02) leaves super 1
// with NO tagged members under the pre-fix tag rule; a probe vector
// ROUTES to super 1. Pre-fix expected: expression arm crashes
// (ArrayIndexOutOfBounds via empty members), join arm and oracle
// silently DROP the probe row.
// Usage: runMain graft.tools.DegenerateSeedRepro
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DegenerateSeedRepro {
  def b(l: Long): Double = java.lang.Double.longBitsToDouble(l)
  val c0 = Array(b(4610334938539176752L), b(4612361558371493477L),
    b(4614162998222441676L), b(4617202927970916761L))
  val c1 = Array(b(4610334938539176754L), b(4612361558371493477L),
    b(4614162998222441677L), b(4617202927970916765L))
  val c2 = Array(b(4610334938539176754L), b(4612361558371493479L),
    b(4614162998222441677L), b(4617202927970916764L))
  val probe = Array(b(4610334938539176756L), b(4612361558371493477L),
    b(4614162998222441678L), b(4617202927970916759L))

  def corpus(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    val far = (3 to 8).map(s => Array.fill(4)(100.0 * s))
    val fillers = (9 to 65).map { i =>
      val s = 3 + (i % 6)
      Array.fill(4)(100.0 * s + 0.001 * i)
    }
    val rows = Seq(0L -> c0, 1L -> c1, 2L -> c2) ++
      far.zipWithIndex.map { case (v, i) => (3L + i) -> v } ++
      fillers.zipWithIndex.map { case (v, i) => (9L + i) -> v } ++
      Seq(100L -> probe)
    import spark.implicits._
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = corpus(spark)
    println(s"[repro] input rows = ${df.count()} (expect 67)")
    try {
      val n = graft.sim.Similarity
        .assignCellsJoin(df, "id", "vec", 66).count()
      println(s"[repro] JOIN arm rows = $n " +
        (if (n == 67) "(no drop)" else s"(DROPPED ${67 - n})"))
    } catch { case e: Throwable =>
      println(s"[repro] JOIN arm THREW: ${e.getClass.getSimpleName}") }
    try {
      val a = graft.sim.Similarity.assignCells(df, "id", "vec", 66)
      val n = a.count()
      val pc = a.filter(col("id") === 100L).select(col("cell")).collect()
      println(s"[repro] EXPR arm rows = $n probeCell=${pc.map(_.getLong(0)).mkString}")
    } catch { case e: Throwable =>
      println(s"[repro] EXPR arm THREW: ${e.getClass.getSimpleName}: " +
        s"${Option(e.getMessage).getOrElse("").take(120)}") }
    spark.stop()
  }
}
