package graft

/** Plan-shape regression tests: the physical plans the scale design
  * depends on (SURVEY.md §4). These fail if a future change silently
  * de-optimizes a scan, join, or aggregation strategy.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q4: filters and column pruning reach the parquet scan") {
    val p = plan("q4_filter_pushdown")
    assert(p.contains("PushedFilters: ["), "no pushed filters")
    assert(p.contains("l_shipdate"), "shipdate filter missing from scan")
    // only the 4 referenced columns are read
    val schema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!schema.contains("l_orderkey"), "scan reads unused columns")
  }

  test("q2: dimension joins broadcast; fact table does not shuffle for the join") {
    val p = plan("q2_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).length === 2, p.take(400))
    assert(!p.contains("SortMergeJoin"))
  }

  test("x1 crossmatch: per-row broadcast-index probe — no join, no agg, " +
      "only the protocol sort exchanges") {
    val p = plan("x1_crossmatch")
    assert(p.contains("closest_catalog_probe"), "expect the broadcast-index probe")
    assert(!p.contains("Join"), "crossmatch must be join-free (r15)")
    assert(!p.contains("HashAggregate"),
      "closest-match must not exchange the alert payload (r15)")
    assert(!p.contains("Window "), "closest-match must not window-sort")
    // the ONLY exchange is the output orderBy's range partitioning
    assert(!p.contains("Exchange hashpartitioning"),
      "no hash exchange above the scan")
  }

  test("q1: aggregation is partially applied map-side") {
    val p = plan("q1_agg")
    assert(p.contains("partial"), "no map-side partial aggregation")
  }

  test("q6: global top-k avoids a full sort") {
    val p = plan("q6_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(300))
  }

  test("x2 map-payload crossmatch: per-row probe, join- and agg-free") {
    val p = plan("x2_mangrove_payload")
    assert(p.contains("closest_catalog_probe"), "expect the broadcast-index probe")
    assert(!p.contains("Join"), "crossmatch must be join-free (r15)")
    assert(!p.contains("HashAggregate"))
    assert(!p.contains("Window "), "payload pick must not window-sort")
  }

  test("crossmatch without the protocol sort: ZERO exchanges above the scan") {
    import org.apache.spark.sql.functions._
    val alerts = spark.read.parquet(s"$sf/events.parquet").select(
      col("event_id").as("id"),
      (col("event_id") % 36000) / 100.0 as "ra",
      (col("event_id") % 17000) / 100.0 - 85.0 as "dec")
    val cat = spark.read.parquet(s"$sf/part.parquet").select(
      ((col("p_partkey") % 36000) / 100.0).as("cra"),
      ((col("p_partkey") % 17000) / 100.0 - 85.0).as("cdec"),
      col("p_brand").as("lab"))
    val out = graft.xmatch.CrossMatch.label(alerts, cat, 2.0,
      "id", "ra", "dec", "cra", "cdec", "lab", "m")
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"crossmatch itself must never exchange:\n${p.take(600)}")
    assert(!p.contains("Join") && !p.contains("HashAggregate"))
  }

  test("f3/f5 packet operators: single shuffle (the packet groupBy), no joins") {
    for (q <- Seq("f3_transient_flags", "f5_fast_transient_rate")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must be join-free")
      // one hash-aggregate pair (partial + final) around one exchange
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges <= 2, s"$q has $exchanges exchanges:\n${p.take(400)}")
    }
  }

  test("f6/f7 blazar family: join-free packet aggregations") {
    for (q <- Seq("f6_fluence_ratio", "f7_std_flux")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must be join-free")
      assert(p.contains("partial"), s"$q expects map-side partial aggregation")
    }
  }

  test("d2 verification: merge-intersect expression inside codegen, no array_intersect") {
    val p = plan("d2_dedup_ngram_jaccard")
    assert(p.contains("sortedintersectcount"), "verify must use the merge kernel")
    assert(!p.contains("array_intersect"), "hash-build intersection crept back")
    assert(!p.contains("CartesianProduct"))
  }

  test("d5 simhash forest: join-free — one bucket shuffle into the per-bucket kernel") {
    val p = plan("d5_simhash_forest")
    assert(!p.contains("Join"), "forest must not self-join the band table")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("MapGroups"), "per-bucket union-find kernel missing")
  }

  test("s1 knn: single scan + broadcast of the query vector, top-k without full sort") {
    val p = SparkEntry.queries("s1_knn_bruteforce")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject") || p.contains("Limit"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin")
      || p.contains("BroadcastExchange"))
  }

  test("t7 repetition: partial-aggregatable hash aggregates, no window sort, no cartesian") {
    val p = plan("t7_repetition")
    assert(p.contains("partial"), "gram counting must partial-aggregate map-side")
    assert(!p.contains("Window "), "per-doc argmax must be min_by, not a window sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("t8 tfidf: partial-aggregatable dictionary build, min_by winner, no cartesian") {
    val p = plan("t8_tfidf")
    assert(p.contains("partial"), "term/df counting must partial-aggregate map-side")
    assert(!p.contains("Window "), "per-doc winner must be min_by, not a window sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("d7 decontamination: benchmark side broadcasts, corpus never shuffles on the gram") {
    val p = plan("d7_decontaminate")
    assert(p.contains("BroadcastHashJoin"), "gram overlap must broadcast the benchmark")
    // the only sort-merge join allowed is the 1:1 doc_id restore (linear,
    // output-keyed); a gram-keyed SMJ would shuffle the whole corpus on
    // the gram and defeat the broadcast design
    p.linesIterator.filter(_.contains("SortMergeJoin")).foreach { l =>
      assert(l.contains("doc_id"), s"gram-keyed sort-merge join crept in: $l")
    }
    assert(!p.contains("CartesianProduct"))
  }

  test("q18 rollup: one Expand + partial-aggregatable pass, not a union of scans") {
    val p = plan("q18_rollup")
    assert(p.contains("Expand"), "rollup must expand grouping sets in-plan")
    assert(p.contains("partial"), "rollup aggregate must partial-apply map-side")
    assert("FileScan".r.findAllIn(p).length === 1,
      "rollup must not rescan the table per subtotal level")
  }

  test("t9 filter cascade is map-only; t10 packs with one hash exchange") {
    // t9: the whole rule battery is one projection over the scan — the
    // only exchange allowed is the presentation orderBy's range shuffle
    val p9 = plan("t9_filter_cascade")
    assert("hashpartitioning".r.findAllIn(p9).isEmpty,
      "t9 must not hash-shuffle — the cascade is per-row")
    assert(!p9.contains("SortMergeJoin") && !p9.contains("BroadcastHashJoin"),
      "t9 must not join")
    // t10: exactly one hash exchange (the per-source window), no joins
    val p10 = plan("t10_shard_pack")
    assert("hashpartitioning".r.findAllIn(p10).length === 1,
      "t10 needs exactly the one per-group exchange")
    assert(!p10.contains("Join"), "t10 must not join")
    // t11: the data-scale window hashes on (source, bucket) — bounded
    // partitions under source skew — and the offset table comes back
    // as a BROADCAST join, never a data-side shuffle join
    val p11 = plan("t11_shard_pack_bucketed")
    assert(p11.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("bucket#")),
      "t11's window must partition on the sub-bucket")
    assert(p11.contains("BroadcastHashJoin"),
      "t11's offset renumber must broadcast the tiny offset table")
    assert(!p11.contains("SortMergeJoin"),
      "t11 must not shuffle-join the data side")
  }

  test("s5/s6 batched ANN: corpus joins the probe set by key, no all-pairs product") {
    for (q <- Seq("s5_knn_batch", "s6_knn_srp_batch")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian product")
      // the corpus-side candidate join must be a HASH equi-join on the
      // bucketing key (cell/bucket); only the broadcast-tiny query-prep
      // frames (planes, centroids, dim) may nested-loop
      assert(p.linesIterator.exists(l => l.contains("BroadcastHashJoin") &&
        (l.contains("cell#") || l.contains("bucket#"))),
        s"$q corpus join is not keyed on the cell/bucket")
    }
  }

  test("s3 srp: plane table and query row broadcast, top-k without full sort") {
    val p = plan("s3_knn_srp")
    assert(p.contains("TakeOrderedAndProject") || p.contains("Limit"))
    assert(p.contains("BroadcastExchange"), "planes/query must broadcast")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("s11 two-level cells: assignment is MAP-ONLY (r17 nearest_cell expression)") {
    // VERDICT r13 #6 kept ncells=125 > TwoLevelGate so the two-level
    // branch stays permanently exercised. r17: the assignment is a
    // single scalar expression per row against the broadcast centroid
    // index — NO join, NO exchange, NO aggregate anywhere in the
    // assignment (the former shape shipped every vector through one
    // hash aggregate per level; SCALE_r17 §6). The two-level route
    // now lives INSIDE the kernel, pinned by SimilaritySpec's
    // routed-brute-force equality, not by plan shape.
    // the s11 QUERY keeps its own per-cell summary aggregate; the
    // assignment segment below it must be join-free (the expression
    // directly above the scan)
    val p = plan("s11_twolevel_cells")
    assert(p.contains("nearest_cell"), s"kernel expression missing:\n${p.take(400)}")
    Seq("SortMergeJoin", "CartesianProduct", "BroadcastHashJoin",
      "BroadcastNestedLoopJoin").foreach(op =>
      assert(!p.contains(op), s"assignment plan still contains $op"))
    // a bare assignment frame is fully map-only: no join, no
    // aggregate, no exchange — nothing but the projection on the scan
    val single = graft.sim.Similarity.assignCells(
        graft.Tables.t(spark, sf, "embeddings"), "vec_id", "embedding", 8)
      .queryExecution.executedPlan.toString
    assert(single.contains("nearest_cell"))
    Seq("Join", "HashAggregate", "Exchange").foreach(op =>
      assert(!single.contains(op), s"bare assignment still contains $op"))
    // the retained join arm (streaming / oversized / corrupt-seed
    // route) still builds its historical shape
    val legacy = graft.sim.Similarity.assignCellsJoin(
        graft.Tables.t(spark, sf, "embeddings"), "vec_id", "embedding", 8)
      .queryExecution.executedPlan.toString
    assert(legacy.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) === 1)
  }

  test("s7 kmeans: the final assignment is ONE map-only corpus pass") {
    // r17: training runs driver-side over broadcast codebooks, so the
    // RETURNED assignment plan is a single scan + scalar argmin
    // projection — no join, no aggregate, no window; the only
    // exchange is the caller's orderBy
    val p = plan("s7_kmeans_cells")
    assert("FileScan".r.findAllIn(p).length === 1,
      s"final assignment re-scans the corpus:\n${p.take(400)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"),
      "assignment must be the broadcast-codebook expression, not a join")
    assert(p.contains("nearest_codebook_cell"),
      "argmin must be the map-only kernel")
    assert(!p.contains("Window "), "argmin must not be a window sort")
  }

  test("s8 pq: map-only encode + broadcast ADC lookup, TakeOrdered top-k") {
    // r17: codebooks and the (nsub x kcent) distance table are
    // driver-built and broadcast; search is one scan -> pq_encode ->
    // adc_distance -> TakeOrdered. No join, no unique-key aggregate,
    // nothing corpus-sized exchanges.
    val p = plan("s8_pq_adc")
    assert("FileScan".r.findAllIn(p).length === 1,
      s"ADC search re-scans the corpus:\n${p.take(400)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"))
    assert(p.contains("pq_encode") && p.contains("adc_distance"),
      "scoring must be the broadcast-table lookup kernels")
    assert(p.contains("TakeOrderedAndProject") || p.contains("Limit"))
  }

  test("q20 interval join: bucketed equi-join, never a nested-loop range join") {
    val p = plan("q20_interval_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range predicate must ride a bucket equi-join, not a nested loop")
    assert(p.linesIterator.exists(l =>
      (l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("__bk#")),
      "join must key on the coarse bucket")
  }

  test("p5 event ingest twin: struct-min hash aggregate, no window sort, no join") {
    val p = plan("p5_event_ingest")
    assert(!p.contains("Window"),
      "winner-per-fp must be a min-struct aggregate, not a window sort")
    assert(!p.contains("Join"), "the batch twin is a single-table pipeline")
    assert(p.contains("partial"),
      "fp aggregation must partial-apply map-side")
  }

  test("p6 carve: broadcast threshold join, no window over the corpus") {
    val p = plan("p6_ccnet_carve")
    assert(!p.contains("Window"),
      "rank selection must come from the drill thresholds, not a window")
    assert(p.contains("BroadcastHashJoin"),
      "the per-stratum thresholds must broadcast")
  }

  test("t19 cms: grid aggregate partial-applies; single-row sketch broadcasts") {
    val p = plan("t19_cms_heavy_hitters")
    assert(p.contains("partial_cms_sketch"),
      "sketch must build map-side partial grids")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the one-row sketch must broadcast onto the candidate tokens")
    assert(!p.contains("CartesianProduct"))
  }
}
