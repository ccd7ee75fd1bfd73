// dev scratch (SCALE_r14, VERDICT r13 #8): exercise closeComponents'
// driver union-find at the 2^24 edge gate BOUNDARY with the
// worst-case node count (2 nodes per edge — disjoint 2-cliques), and
// report peak driver heap so the gate is kept or resized on evidence.
// Run WITHOUT SPARK_DRIVER_MEM so the 8g default is what is tested.
// Usage: runMain graft.tools.GateHeadroom [log2Edges]
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object GateHeadroom {
  def main(args: Array[String]): Unit = {
    val log2 = args.headOption.map(_.toInt).getOrElse(24)
    val nEdges = 1L << log2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[g] Xmx = ${Runtime.getRuntime.maxMemory() / (1 << 20)} MB, " +
      s"edges = $nEdges (2^$log2), nodes = ${2 * nEdges}")
    // disjoint 2-cliques: d1=2i, d2=2i+1 — maximal distinct-node count
    // for the edge volume, the union-find's worst sizing case
    val edges = spark.range(nEdges)
      .select((col("id") * 2).as("d1"), (col("id") * 2 + 1).as("d2"))
    val t0 = System.nanoTime()
    val labels = graft.dedup.Dedup.closeComponents(edges,
      knownCount = Some(nEdges))
    val n = labels.count()
    val wall = (System.nanoTime() - t0) / 1e9
    // peak heap across all pools, as the GC saw it (collection peaks)
    val peak = java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
      .stream().filter(_.getType == java.lang.management.MemoryType.HEAP)
      .mapToLong(p => p.getPeakUsage.getUsed).sum() / (1 << 20)
    println(f"[g] labels = $n (expect ${2 * nEdges}), wall = $wall%.1f s, " +
      s"peak heap across pools = $peak MB")
    spark.stop()
  }
}
