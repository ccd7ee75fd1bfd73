// dev scratch (r18, VERDICT r17 #7): measure the ivfPqTopKAll gate
// BOUNDARY — a query table between the old flat gate (2^16) and the
// new entry-budget gate (2^17 at nsub=4 x kcent=8) — on both arms:
// AUTO (broadcast-ADC map-only) vs forced join (maxBroadcastQueries=0),
// reporting wall time and peak driver heap so the MaxAdcEntries budget
// is kept or resized on evidence. Run WITHOUT SPARK_DRIVER_MEM so the
// default heap is what is tested.
// Usage: runMain graft.tools.PqGateProbe [nq] [dim] [arm=both|bcast|join]
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PqGateProbe {
  def main(args: Array[String]): Unit = {
    val nq = args.headOption.map(_.toInt).getOrElse(100000)
    val dim = args.lift(1).map(_.toInt).getOrElse(16)
    val arm = args.lift(2).getOrElse("both")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[pqgate] Xmx = ${Runtime.getRuntime.maxMemory() / (1 << 20)} MB, " +
      s"nq = $nq, dim = $dim")
    // deterministic synthetic vectors: v[j] = hash-ish mix of (id, j)
    val corpus = spark.range(2L * nq).select(col("id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "j -> cast(pmod(id * 37 + j * 101 + (id + j) % 13, 97) as double)" +
        " / 97.0 - 0.5)").as("v"))
      .repartition(32).cache()
    corpus.count()
    val queries = corpus.filter(col("id") < nq)
    def run(tag: String, gate: Long): Unit = {
      val t0 = System.nanoTime()
      val out = graft.sim.ProductQuantize.ivfPqTopKAll(
        corpus, "id", "v", queries, "id", "v", k = 3,
        maxBroadcastQueries = gate, knownQueryCount = nq)
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val peak = java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
        .stream().filter(_.getType == java.lang.management.MemoryType.HEAP)
        .mapToLong(p => p.getPeakUsage.getUsed).sum() / (1 << 20)
      println(f"[pqgate] $tag rows=$n wall=$wall%.1f s peak-heap=$peak MB")
    }
    if (arm == "both" || arm == "bcast") run("bcast(auto-gate)", -1L)
    if (arm == "both" || arm == "join") run("join(forced)", 0L)
    spark.stop()
  }
}
