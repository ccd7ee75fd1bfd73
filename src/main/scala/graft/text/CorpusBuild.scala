package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, SweepCheckpoint}

/** The end-to-end corpus-construction chain a training-data pipeline
  * runs at 100 TB, composed as ONE operator from the production
  * pieces (each independently oracle-verified):
  *
  *   1. C4-style quality cascade ([[TextOps.qualityFilter]]) —
  *      map-only, runs FIRST because it is the cheapest stage and
  *      shrinks the shuffle-heavy dedup input;
  *   2. exact + near dedup ([[Dedup.dedupPipeline]]), keeping one
  *      representative per verified cluster — every candidate step
  *      joins on a bucketing key, output linear in the input;
  *   3. benchmark decontamination ([[Decontaminate.flags]]) over the
  *      surviving representatives only (the fewest docs reach the
  *      gram join), bench side count-gated broadcast with the pinned
  *      sort-merge fallback;
  *   4. shard packing ([[ShardPack.pack]]) per `groupCol` over the
  *      final keep set — window partitions bounded by the group key
  *      (route through [[ShardPack.packBucketed]] instead when one
  *      group can hold a large fraction of the corpus).
  *
  * Returns one row per RETAINED doc: (idCol, groupCol, n_tokens,
  * shard). The benchmark set is a separate relation — eval data never
  * enters the corpus, it only vetoes grams.
  *
  * The chain composes LAZILY, so the quality-kept relation is
  * recomputed by the dedup input, the representative join, and the
  * packer (three corpus passes; the cascade itself is a cheap map).
  * At 100 TB a production run materializes stage boundaries instead —
  * persist the kept/clean tables between stages and feed them back
  * in; the operator deliberately does not cache internally because a
  * lazily-returned result cannot own a cache lifecycle (the r5
  * lesson).
  */
object CorpusBuild {

  def build(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, groupCol: String, maxHamming: Int = 4,
      ngram: Int = 4, budgetTokens: Long = 2000L,
      requireTerminal: Boolean = true,
      sweep: SweepCheckpoint = SweepCheckpoint.Local,
      maxBroadcastBenchDocs: Long = 1L << 13): DataFrame = {
    val (keep, _) = TextOps.qualityFilter(col(textCol),
      requireTerminal = requireTerminal)
    val kept = docs.filter(keep)
    val clusters = Dedup.dedupPipeline(kept, idCol, textCol, maxHamming,
      sweep = sweep)
    // the cluster label is the component's min doc id, so the labeled
    // doc with cluster == id IS the cluster's one representative
    val reps = kept.join(
      clusters.filter(col("cluster") === col(idCol)).select(col(idCol)),
      Seq(idCol))
    val unioned = reps
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        lit(false).as("__is_bench"))
      .unionByName(bench.select(col(idCol).as("doc_id"),
        col(textCol).as("__text"), lit(true).as("__is_bench")))
    val clean = reps.join(
      Decontaminate.flags(unioned, "doc_id", "__text", col("__is_bench"),
          ngram, maxBroadcastBenchDocs)
        .filter(!col("contaminated"))
        .select(col("doc_id").as(idCol)),
      Seq(idCol))
    ShardPack.pack(clean, idCol, textCol, groupCol, budgetTokens)
  }
}
