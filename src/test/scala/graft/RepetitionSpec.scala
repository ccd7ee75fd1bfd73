package graft

import org.apache.spark.sql.functions._
import graft.text.{Decontaminate, Repetition}

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals on hand-computed documents") {
    val docs = Seq(
      (0L, "a b a b c"), // top 2-gram "a b" x2, no duplicated 3-gram
      (1L, "x x x x"),   // "x x" x3; "x x x" duplicated (x2, len 5)
      (2L, "solo"),      // < 2 tokens: null gram, zero fractions
      (3L, "")           // empty text: zero chars, zero fractions
    ).toDF("doc_id", "text")
    val r = Repetition.signals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()

    assert(r(0).getString(1) === "a b")
    assert(r(0).getDouble(2) === 2 * 3 / 9.0)
    assert(r(0).getDouble(3) === 0.0)

    assert(r(1).getString(1) === "x x")
    assert(r(1).getDouble(2) === 3 * 3 / 7.0)
    assert(r(1).getDouble(3) === 2 * 5 / 7.0)

    assert(r(2).isNullAt(1) && r(2).getDouble(2) === 0.0)
    assert(r(3).isNullAt(1) && r(3).getDouble(2) === 0.0 && r(3).getDouble(3) === 0.0)
  }

  test("top2 tie breaks to the lexicographically smallest gram") {
    val docs = Seq((0L, "b a b a")).toDF("doc_id", "text")
    // grams: "b a" x2, "a b" x1 -> "b a" wins on count;
    // "c d c d e" -> "c d" x2 beats "d c" x1; but "a b a b" has
    // "a b" x2 and "b a" x1. Equal-count tie: "a b a" has "a b" and
    // "b a" both x1 -> smallest is "a b".
    val tie = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(Repetition.signals(docs, "doc_id", "text")
      .select("top2_gram").as[String].head() === "b a")
    assert(Repetition.signals(tie, "doc_id", "text")
      .select("top2_gram").as[String].head() === "a b")
  }

  test("decontamination flags docs sharing 4-grams with the benchmark") {
    val docs = Seq(
      (0L, "a b c d e"),       // benchmark (id % 97 == 0)
      (1L, "z a b c d q"),     // shares "a b c d"
      (2L, "p q r s t u"),     // clean
      (3L, "a b c")            // too short for any 4-gram
    ).toDF("doc_id", "text")
    val r = Decontaminate.flags(docs, "doc_id", "text",
      col("doc_id") % 97 === 0, 4).orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(r(0).getLong(1) === 1L && r(0).getLong(2) === 1L && r(0).getBoolean(3))
    assert(r(1).getLong(1) === 0L && !r(1).getBoolean(3))
    assert(r(2).getLong(1) === 0L && !r(2).getBoolean(3))
  }

  test("tf-idf top term on hand-computed documents, tie to smallest term") {
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"), // tf and df equal for both -> tie on term
      (2L, "cherry date date date")
    ).toDF("doc_id", "text")
    val r = graft.text.TfIdf.topTerm(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getString(1) === "apple")
    assert(r(0).getDouble(2) === (2.0 / 3.0) * math.log(3.0 / 1.0))
    assert(r(1).getString(1) === "banana")
    assert(r(1).getDouble(2) === (1.0 / 2.0) * math.log(3.0 / 2.0))
    assert(r(2).getString(1) === "date")
    assert(r(2).getDouble(2) === (3.0 / 4.0) * math.log(3.0 / 1.0))
  }

  test("duplicated docs are fully contaminated against a duplicate benchmark") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (5L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val r = Decontaminate.flags(docs, "doc_id", "text",
      col("doc_id") === 0, 4).collect()
    assert(r.length === 1)
    // 9 tokens -> 6 distinct 4-grams, all matched against doc 0
    assert(r(0).getLong(1) === 6L && r(0).getBoolean(3))
  }

  test("quality filter cascade: first failing rule wins, keepers pass all") {
    val docs = Seq(
      (0L, "one two"),                                  // too_short
      (1L, "a aa b cc d e f g"),                        // word_shape (avg < 3)
      (2L, "call 5551234567 now 123456 ok 99999 yes."), // digit_heavy
      (3L, "this sentence has enough proper words but no ending"),
      (4L, "this sentence looks like clean training text.")
    ).toDF("doc_id", "text")
    val (keep, reason) = graft.text.TextOps.qualityFilter(col("text"))
    val r = docs.select(col("doc_id"), keep.as("k"), reason.as("why"))
      .orderBy("doc_id").collect()
    assert(r.map(x => Option(x.getString(2)).orNull).toSeq ===
      Seq("too_short", "word_shape", "digit_heavy", "no_terminal_punct", null))
    assert(r.map(_.getBoolean(1)).toSeq ===
      Seq(false, false, false, false, true))
  }

  test("shard packing: contiguous non-splitting shards under the budget rule") {
    val docs = Tables.t(spark, sf, "documents")
    val out = graft.text.ShardPack.pack(docs, "doc_id", "text", "source", 500L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._2)
      var cum = 0L
      sorted.foreach { case (_, id, nt, shard) =>
        assert(shard === cum / 500L, s"$src/$id: shard from preceding mass")
        cum += nt
      }
      // shards are contiguous from 0
      val shards = sorted.map(_._4).distinct.sorted.toList
      assert(shards === (0L to shards.max).toList, s"$src shards not contiguous")
    }
  }

  test("text family runs t8/t3/d7/t13 off one token table with identical results") {
    val docs = Tables.t(spark, sf, "documents")
    val isBench = col("doc_id") % 97 === 0
    val fam = graft.text.TextFamily.run(docs, "doc_id", "text",
      groupCol = "source", isBench = isBench, gramN = 4)
    try {
      assert(fam.topTerm.orderBy("doc_id").collect() ===
        graft.text.TfIdf.topTerm(docs, "doc_id", "text")
          .orderBy("doc_id").collect())
      assert(fam.tokenStats.orderBy("source").collect() ===
        SparkEntry.queries("t3_token_stats")(spark, sf).collect())
      assert(fam.decontamination.orderBy("doc_id").collect() ===
        Decontaminate.flags(docs, "doc_id", "text", isBench, 4)
          .orderBy("doc_id").collect())
      assert(fam.surprisal.orderBy("doc_id").collect() ===
        graft.text.UnigramLm.surprisal(docs, "doc_id", "text")
          .orderBy("doc_id").collect())
    } finally fam.unpersist()
  }

  test("a fat bench predicate takes the shuffle-join path, identical output") {
    val docs = Tables.t(spark, sf, "documents")
    // a careless predicate selecting ~a third of the corpus as the
    // "benchmark" must not be broadcast (VERDICT r5 #2)
    val fat = col("doc_id") % 3 === 0
    val guarded = Decontaminate.flags(docs, "doc_id", "text", fat, 4,
      maxBroadcastBenchDocs = 10)
    val p = guarded.queryExecution.executedPlan.toString()
    // the doc_id-keyed zero-match restore may broadcast its small
    // aggregated side; the GRAM-keyed overlap join must not
    p.linesIterator.filter(_.contains("BroadcastHashJoin")).foreach { l =>
      assert(!l.contains("[g#"), s"fat bench side was broadcast: $l")
    }
    assert(p.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("[g#")),
      "guarded overlap should shuffle-join on the gram key")
    val broadcasted = Decontaminate.flags(docs, "doc_id", "text", fat, 4,
      maxBroadcastBenchDocs = Long.MaxValue)
    val a = guarded.orderBy("doc_id").collect().toSeq
    val b = broadcasted.orderBy("doc_id").collect().toSeq
    assert(a === b, "join-strategy fallback changed the results")
  }

  test("a gram-heavy bench set falls back even under the doc gate (ADVICE r6: payload-denominated bound)") {
    val docs = Tables.t(spark, sf, "documents")
    // few bench DOCS (well under the doc gate) — but the broadcast
    // payload is their GRAM table, so the gram bound must gate too
    val bench = col("doc_id") % 97 === 0
    val guarded = Decontaminate.flags(docs, "doc_id", "text", bench, 4,
      maxBroadcastBenchGrams = 8)
    val p = guarded.queryExecution.executedPlan.toString()
    assert(p.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("[g#")),
      "gram-heavy bench side should shuffle-join on the gram key")
    val normal = Decontaminate.flags(docs, "doc_id", "text", bench, 4)
    assert(guarded.orderBy("doc_id").collect().toSeq ===
      normal.orderBy("doc_id").collect().toSeq,
      "gram-gate fallback changed the results")
  }

  test("bench-size hints skip the gate pass without changing results") {
    val docs = Tables.t(spark, sf, "documents")
    val bench = col("doc_id") % 97 === 0
    val unhinted = Decontaminate.flags(docs, "doc_id", "text", bench, 4)
    // truthful small hints keep the broadcast path
    val hinted = Decontaminate.flags(docs, "doc_id", "text", bench, 4,
      knownBenchDocs = 16, knownBenchGrams = 1000)
    assert(hinted.orderBy("doc_id").collect().toSeq ===
      unhinted.orderBy("doc_id").collect().toSeq)
    // an over-the-gate doc hint forces the shuffle fallback
    val big = Decontaminate.flags(docs, "doc_id", "text", bench, 4,
      knownBenchDocs = 1L << 40)
    assert(big.queryExecution.executedPlan.toString().linesIterator.exists(
      l => l.contains("SortMergeJoin") && l.contains("[g#")),
      "an over-the-gate hint should take the shuffle path")
    assert(big.orderBy("doc_id").collect().toSeq ===
      unhinted.orderBy("doc_id").collect().toSeq)
    // TextFamily forwards the hints to its shared-token d7
    val fam = graft.text.TextFamily.run(docs, "doc_id", "text",
      groupCol = "source", isBench = bench, gramN = 4,
      knownBenchDocs = 16, knownBenchGrams = 1000)
    try {
      assert(fam.decontamination.orderBy("doc_id").collect().toSeq ===
        unhinted.orderBy("doc_id").collect().toSeq)
    } finally fam.unpersist()
  }
}
