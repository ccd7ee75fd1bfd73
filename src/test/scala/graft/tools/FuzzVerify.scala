package graft.tools

import org.apache.spark.sql.SparkSession

/** Spark side of the cross-engine fuzz harness (tools/fuzz.py): runs
  * the document-only oracle queries over every generated corpus under
  * the given root in one session, writing results + the oracle SQL for
  * the python DuckDB comparator.
  *
  * Run: sbt "Test/runMain graft.tools.FuzzVerify /tmp/fuzz"
  */
object FuzzVerify {
  private val queries = Seq("d1_dedup_exact", "d2_dedup_ngram_jaccard",
    "d3_dedup_minhash_lsh", "d4_simhash", "d5_simhash_forest",
    "d8_simhash_assign", "d9_simhash_clusters", "d10_dedup_pipeline",
    "t1_lang_id",
    "t2_quality_score", "t3_token_stats", "t4_fingerprint",
    "t5_winnow_fingerprint", "t6_regex_tokens", "t7_repetition",
    "t8_tfidf", "t9_filter_cascade", "t10_shard_pack", "d7_decontaminate", "m1_media_meta",
    "m2_media_features", "m3_frame_sample", "d6_dedup_embedding",
    "s1_knn_bruteforce", "s2_knn_ivf", "s3_knn_srp", "s4_quantize",
    "s5_knn_batch", "s6_knn_srp_batch", "s7_kmeans_cells",
    "t11_shard_pack_bucketed", "p1_corpus_build",
    "d11_incremental_dedup", "m4_perceptual_hash",
    "p2_split_assign", "p3_mixture_sample",
    "t12_stratified_sample", "t13_unigram_surprisal",
    "t14_normalize", "t15_pii_redact", "t16_bigram_surprisal",
    "t17_kmv_distinct", "t18_vocab_overlap", "t19_cms_heavy_hitters",
    "d12_bloom_decontaminate", "d13_semantic_dedup", "d14_containment",
    "p4_weighted_sample", "p5_event_ingest", "p6_ccnet_carve",
    "d15_lsh_cluster_summary", "d16_containment_degree",
    "d17_jaccard_degree", "s8_pq_adc", "s9_pq_rerank", "s10_ivfpq_batch",
    "d18_winnow_overlap", "d21_sampled_degree", "d22_sampled_containment",
    "d23_sampled_embedding")

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/fuzz")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-fuzz")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // optional comma-separated subset for re-running a fixed query
    // over existing corpora (the rest of the results stay valid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = queries.filter(q => only.forall(_.contains(q)))
    val corpora = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("c")).sortBy(_.getName)
    for (corpus <- corpora; name <- selected) {
      graft.SparkEntry.queries(name)(spark, corpus.getPath)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(s"${corpus.getPath}/$name")
      // bound per-operator caches to one query (30 corpora x 24
      // queries would otherwise pile up cached shingle/band tables)
      spark.sharedState.cacheManager.clearCache()
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    queries.foreach(q => node.put(q, graft.SparkEntry.oracleSql(q)))
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "oracle_sql.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    println(s"fuzz: wrote ${corpora.length} corpora x ${queries.length} queries")
    spark.stop()
  }
}
