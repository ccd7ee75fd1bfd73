// dev scratch (SCALE_r14): push d3/d19 past realistic duplicate
// density with a planted viral family, and confirm d6's new worst-cell
// refusal fires end-to-end on a real corpus (VERDICT r13 #1/#4).
// Usage: runMain graft.tools.ViralStress [sfDir] [familySize]
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ViralStress {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val fam = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f
      println(f"[v] $n%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }

    // a viral TEXT family: `fam` byte-identical copies of one real doc,
    // new ids far above the corpus key space
    val docs = graft.Tables.t(spark, dir, "documents")
    val seedText = docs.filter(col("doc_id") === 0L)
      .select(col("text")).head().getString(0)
    val viral = spark.range(fam)
      .select((col("id") + 900000000L).as("doc_id"), lit(seedText).as("text"))
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(viral)

    // d3: the pair report at viral density — candidate volume C(fam,2)
    // concentrated in the family's 4 band buckets; the claim under
    // test is that the shuffled-hash, sort-free candidate path holds
    val d3 = time(s"d3 pairs (family=$fam)") {
      graft.dedup.Dedup.minhashLshPairs(corpus, "doc_id", "text", 0.7).count()
    }
    println(s"[v] d3 verified pairs = $d3 (family closure alone = " +
      s"${fam.toLong * (fam - 1) / 2})")

    // d19: the bounded sibling — SAME candidate relation, bounded heap
    // ranking; its intermediate tracks d3's, its output stays 3/doc
    val d19 = time(s"d19 topk (family=$fam)") {
      graft.dedup.Dedup.minhashLshTopK(corpus, "doc_id", "text", 0.7, 3).count()
    }
    println(s"[v] d19 rows = $d19")

    // capped-fallback equality at sf10 volume (VERDICT r14 #2): a
    // bucketCap far under the family size pushes the viral band
    // buckets through the spilling Column-form ownership path; the
    // verified pair count must match the in-bucket kernel route to
    // the digit (the DedupSpec boundary case, now at stress volume)
    val sets = graft.dedup.Dedup.signedSets(corpus, "doc_id", "text", 12, 3)
    val d3capped = time(s"d3 pairs CAPPED (bucketCap=4096)") {
      graft.dedup.Dedup.minhashLshPairsFromSets(sets, 0.7,
        bucketCap = 4096).count()
    }
    sets.unpersist()
    println(s"[v] d3 capped pairs = $d3capped " +
      (if (d3capped == d3) "== kernel route (EXACT)" else s"!= kernel $d3 MISMATCH"))

    // the exact degree statement refuses at sf10's own density (the
    // d2/d14 refusal family); the SAMPLED degree is the compute-relief
    // path that still answers — rateInv=10 thins pair volume 100x
    time("d17 exact-degree refusal (natural sf10 density)") {
      try {
        graft.dedup.Dedup.ngramJaccardDegree(corpus, "doc_id", "text", 0.5)
        println("[v] d17 DID NOT REFUSE")
      } catch {
        case e: graft.dedup.PairVolumeException =>
          println(s"[v] d17 refused: est=${e.estimatedPairs} bound=${e.bound}")
      }
    }
    val d21 = time("d21 sampled degree (rateInv=10, viral corpus)") {
      graft.dedup.Dedup.sampledJaccardDegree(corpus, "doc_id", "text",
        0.5, 10).count()
    }
    println(s"[v] d21 rows = $d21 (degree survey over ~1/10 of the corpus)")

    // d6: the embedding pair report must REFUSE at viral density now —
    // `fam` identical vectors share a nearest centroid, so the
    // worst-cell C(n,2) pre-flight trips the default bound
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val seedVec = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val viralEmb = spark.range(math.max(fam, 30000).toLong)
      .select((col("id") + 900000000L).as("vec_id"),
        typedLit(seedVec).as("embedding"))
    val embCorpus = emb.select(col("vec_id"), col("embedding"))
      .unionByName(viralEmb)
    time("d6 viral refusal") {
      try {
        graft.dedup.Dedup.embeddingDupPairs(embCorpus, "vec_id", "embedding", 0.4)
        println("[v] d6 DID NOT REFUSE — guard failed to fire")
      } catch {
        case e: graft.dedup.PairVolumeException =>
          println(s"[v] d6 refused: est=${e.estimatedPairs} bound=${e.bound}")
      }
    }
    // the embedding family's sampled sibling answers the refused
    // corpus: 1/10 thins the viral family's worst cell ~100x
    val d23 = time("d23 sampled embedding pairs (rateInv=10)") {
      graft.dedup.Dedup.sampledEmbeddingDupPairs(embCorpus, "vec_id",
        "embedding", 0.4, 10).count()
    }
    println(s"[v] d23 rows = $d23")
    spark.stop()
  }
}
