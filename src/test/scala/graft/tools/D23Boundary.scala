// dev scratch (round 16, extending VERDICT r15 next #3): the planted
// probe that drove the d23 semantics chain. Its first run (old seed)
// read recall 1.0 at EVERY severity — implausible, which exposed the
// degenerate `id < ncells` centroid seed (~1 cell on a thinned frame).
// With the seed honestly fixed it measured the re-derived-IVF caveat's
// true worst case (same-cell recall 0.41 on this corpus), which
// motivated replacing re-derivation with the thinned-view contract
// (full-corpus cell count + centroid seed), under which this probe
// must read same-cell 1.0000 / cross-cell 0.0000 / extra 0 exactly.
//
// The corpus engages the adversarial regime cheaply:
// n deterministic dim-16 vectors in K noisy clusters, with the noise
// amplitude tuned so same-cluster cosines STRADDLE the threshold
// (E[cos] ~ 1/(1 + eps^2 * dim/3) ~ t) — maximally borderline pairs —
// plus identical-copy duplicate families. At n=450k, r=10 the sample
// is ~45k vectors -> autoCells = 10 > the 8-cell floor: the sample
// IVF is derived from SAMPLE centroids and genuinely re-cuts the
// space, while the full-corpus IVF has ~109 cells. Truth stays
// brute-force tractable (~1e9 dim-16 cosines).
// K (the planted cluster count) is the severity dial: with K well
// above the sample's cell count (default 40 vs ~11 cells) whole
// clusters map to one sample cell and loss needs two centroids inside
// one cluster's threshold radius; with K BELOW the sample cell count
// (e.g. 8) the sample index MUST cut within cosine-coherent clusters —
// the worst case for the re-derived-IVF caveat.
// Usage: runMain graft.tools.D23Boundary [n] [rateInv] [threshold] [K]
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object D23Boundary {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(450000L)
    val r = if (args.length > 1) args(1).toInt else 10
    val t = if (args.length > 2) args(2).toDouble else 0.4
    val K = if (args.length > 3) args(3).toInt else 40
    val dim = 16
    // E[cos(same-cluster)] ~ 1/(1 + eps^2 * dim/3): eps=0.53 centers
    // the same-cluster cosine distribution near t=0.4, so a large
    // fraction of pairs are borderline on BOTH sides of the threshold
    val eps = 0.53
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic unit centers: K cluster directions + 20 family
    // directions off one seeded stream
    val rnd = new scala.util.Random(4242)
    def unit(): Seq[Double] = {
      val raw = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / nrm).toSeq
    }
    val centers = (0 until K).map(_ => unit())
    val famDirs = (0 until 20).map(_ => unit())

    val cent = typedLit(centers)
    // component j = center[id % K][j] + eps * U[-1,1] from a
    // deterministic hash of (id, j) — fully reproducible, no RNG state
    val vecCols = (0 until dim).map { j =>
      (element_at(element_at(cent, (col("id") % K).cast("int") + 1), j + 1) +
        lit(eps) * (pmod(xxhash64(col("id"), lit(j)), lit(1000000L))
          .cast("double") / 500000.0 - 1.0)).cast("float")
    }
    val noisy = spark.range(n).select(col("id").as("vec_id"),
      array(vecCols: _*).as("embedding"))
    // 20 identical-copy families x 60 members (the co-location class —
    // structurally recall-1.0 under any index; kept so the corpus
    // resembles the operator's real target)
    val famLit = typedLit(famDirs.map(_.map(_.toFloat)))
    val fams = spark.range(1200).select((col("id") + 10000000L).as("vec_id"),
      element_at(famLit, ((col("id") / 60) % 20).cast("int") + 1)
        .as("embedding"))
    val emb = noisy.unionByName(fams)

    println(s"[b] planted corpus n=$n (+1200 family copies) K=$K dim=$dim " +
      s"eps=$eps rateInv=$r threshold=$t")
    D23Fidelity.measure(spark, emb, r, t)
    spark.stop()
  }
}
