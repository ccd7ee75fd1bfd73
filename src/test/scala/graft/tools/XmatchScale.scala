// dev scratch (VERDICT r14 #1/#7): re-measure the crossmatch family at
// the stress decades under the exchange-free broadcast-indexed per-row
// probe, and split x1's cost into ENGINE (scan -> probe -> project) vs
// BENCH PROTOCOL (the driver's total-order orderBy on the full result).
// Bench stress protocol: toRdd.foreach materialization, reps as given
// (1 for sf100), System.gc() between queries to nudge shuffle-file GC.
// Usage: runMain graft.tools.XmatchScale [sfDir] [reps]
package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object XmatchScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String) = graft.Tables.t(spark, dir, n)
    t("events").count(); t("part").count() // warm IO

    def alerts = t("events").select(
      col("event_id").as("id"),
      (col("event_id") % 36000) / 100.0 as "ra",
      (col("event_id") % 17000) / 100.0 - 85.0 as "dec")
    def labCat = t("part").select(
      ((col("p_partkey") % 36000) / 100.0 + lit(0.3 / 3600.0)).as("cra"),
      ((col("p_partkey") % 17000) / 100.0 - 85.0).as("cdec"),
      col("p_brand").as("lab"))
    def mapCat = t("part").select(
      ((col("p_partkey") % 36000) / 100.0 + lit(0.3 / 3600.0)).as("cra"),
      ((col("p_partkey") % 17000) / 100.0 - 85.0).as("cdec"),
      map(lit("brand"), trim(col("p_brand")),
        lit("container"), trim(col("p_type"))).as("payload"))

    def x1 = graft.xmatch.CrossMatch.label(alerts, labCat, 2.0,
        "id", "ra", "dec", "cra", "cdec", "lab", "match_label")
      .select(col("id"), col("match_label"))
    def x2 = graft.xmatch.CrossMatch.closestWithin(alerts, mapCat, 2.0,
        "id", "ra", "dec", "cra", "cdec", Seq("payload"),
        Map("payload" -> map(lit("brand"), lit("None"),
          lit("container"), lit("None"))))
      .select(col("id"),
        element_at(col("payload"), "brand").as("brand"),
        element_at(col("payload"), "container").as("container"))

    def med(tag: String)(f: => DataFrame): Double = {
      val ts = (0 until reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val m = ts(ts.length / 2)
      println(f"[x] $tag%-26s $m%8.2f s  (reps=$reps)")
      m
    }
    println(s"[x] dir=$dir")
    val e = med("x1 engine (no sort)")(x1)
    val p = med("x1 protocol (orderBy id)")(x1.orderBy("id"))
    println(f"[x] x1 split: engine=$e%.2f s, protocol sort adds ${p - e}%.2f s (${100 * (p - e) / p}%.0f%% of the protocol number)")
    med("x2 engine (no sort)")(x2)
    med("x2 protocol (orderBy id)")(x2.orderBy("id"))
    spark.stop()
  }
}
