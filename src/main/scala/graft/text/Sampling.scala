package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic corpus-curation operators: train/val/test split
  * assignment and stratified sampling. Both key every decision on the
  * cross-engine md5 hash family ([[Hashing.hash60]]) of the document
  * id, so results are a pure function of the data — reproducible
  * across runs, engines, partitionings and arrival orders, and stable
  * under incremental corpus growth (a document's split never changes
  * when other documents are added, the property that keeps eval
  * contamination impossible across corpus versions; contrast
  * `rand()`-based splitting, where adding one row reshuffles
  * everything downstream of it).
  *
  * Scale shape: split assignment is MAP-ONLY (no shuffle at any
  * corpus size). Stratified sampling never sorts a whole stratum on
  * one task: a salted two-phase top-k bounds every window partition
  * by ~|stratum|/salts before a tiny second phase over <= k*salts
  * survivors per stratum.
  */
object Sampling {

  /** Assign each document to a named split by hash bucket.
    *
    * `bucket = hash60(id, seed) mod granularity`; `weights` are
    * apportioned to contiguous bucket ranges by rounded cumulative
    * boundary (so a 0.9/0.05/0.05 split at granularity 1000 is
    * buckets [0,900), [900,950), [950,1000) — the realized fractions
    * are exact at the bucket level, and converge to the weights at
    * rate 1/granularity). Map-only; columns (bucket, split) append.
    */
  def assignSplits(docs: DataFrame, idCol: String,
      splits: Seq[(String, Double)], seed: Int = 0,
      granularity: Int = 10000): DataFrame = {
    require(splits.nonEmpty, "assignSplits needs at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val cuts = splits.map(_._2)
      .scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * granularity))
    // last boundary pinned to granularity so rounding never orphans
    // the top bucket
    val bounds = cuts.init :+ granularity.toLong
    val bucket = Hashing.hash60(col(idCol).cast("string"), seed) %
      granularity
    val split = bounds.zip(splits.map(_._1)).reverse
      .foldLeft(lit(splits.last._1): Column) { case (acc, (hi, name)) =>
        when(col("bucket") < hi, name).otherwise(acc)
      }
    docs.withColumn("bucket", bucket).withColumn("split", split)
  }

  /** Deterministic mixture sampling: keep each document with a
    * per-SOURCE rate — the data-mixing step that turns raw source
    * proportions into a training distribution (upweight curated
    * sources, downsample the crawl; the temperature-sampling recipe
    * reduced to per-source rates). `keep = hash60(id, seed) mod
    * granularity < round(rate * granularity)`: map-only at any corpus
    * size, no shuffle, and — like [[assignSplits]] — a document's
    * keep/drop never changes as the corpus grows, so a mixture re-run
    * over a grown corpus is a superset of the previous sample (the
    * anti-rand() property again). Sources missing from `rates` get
    * `defaultRate`. Nested sampling stays independent across seeds
    * (hash-family members), and because [[assignSplits]] uses the same
    * family a different seed keeps mixture and split decisions
    * independent.
    *
    * Returns kept rows with their `bucket` appended (the realized rate
    * is exact at bucket resolution, converging at 1/granularity).
    */
  def mixtureSample(docs: DataFrame, idCol: String, mixCol: String,
      rates: Seq[(String, Double)], defaultRate: Double = 0.0,
      seed: Int = 0, granularity: Int = 10000): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 1),
      "mixture rates must be in [0, 1]")
    val bucket = Hashing.hash60(col(idCol).cast("string"), seed) %
      granularity
    val cut = rates.reverse
      .foldLeft(lit(math.round(defaultRate * granularity)): Column) {
        case (acc, (k, r)) =>
          when(col(mixCol) === k, lit(math.round(r * granularity)))
            .otherwise(acc)
      }
    docs.withColumn("bucket", bucket).filter(col("bucket") < cut)
  }

  /** Weighted sample WITHOUT replacement (Efraimidis & Spirakis, IPL
    * 2006, algorithm A-ES): take the k documents with the largest
    * `ln(u_i) / w_i`, where `u_i = (hash60(id, seed) + 1) / 2^60` is
    * the document's deterministic uniform draw — provably equivalent
    * to drawing k documents one at a time with probability
    * proportional to weight, but embarrassingly parallel. This is the
    * quality-weighted subcorpus carve (weight = quality score, token
    * count, dedup cluster mass, ...) that turns "sample 1M documents
    * preferring high quality" into one top-k.
    *
    * The log-domain key replaces the paper's `u^(1/w)` — the same
    * ordering (ln is monotone) without underflow for large weights.
    * Like every operator here, the draw is keyed on the cross-engine
    * md5 family, so the sample is a pure function of the data: stable
    * across runs, partitionings, and engines (rand() would be none of
    * these), though NOT under corpus growth — weighted selection is
    * inherently competitive, unlike [[assignSplits]]/[[mixtureSample]]
    * whose per-doc decisions are growth-stable by design.
    *
    * Scale shape: the key is map-only; selection is a global top-k —
    * Spark plans orderBy+limit as TakeOrderedAndProject (per-partition
    * k-heap + driver merge of ~partitions x k rows), so no global sort
    * at any corpus size. Caller keeps k driver-sized (same contract as
    * every top-k here). Rows with non-positive weight can never be
    * drawn (P proportional to w) and are excluded up front.
    *
    * Output: (id, w, skey) — the k winners, skey descending.
    *
    * Edge: the uniform draw u = (hash60+1)/2^60 lies in (0, 1] — when
    * hash60 hits its maximum (P = 2^-60 per row), u = 1.0 exactly and
    * skey = ln(1)/w = 0, the global maximum, so that row wins a slot
    * regardless of weight. Kept as-is deliberately: the oracle SQL
    * mirrors the same formula term-for-term, so the result is still
    * cross-engine exact, and the bias is statistically invisible.
    */
  def weightedSample(docs: DataFrame, idCol: String, weight: Column,
      k: Int, seed: Int = 0): DataFrame = {
    require(k > 0, "weightedSample needs k > 0")
    val twoPow60 = 1152921504606846976.0 // exact in double
    val u = (Hashing.hash60(col("id").cast("string"), seed) + lit(1L))
      .cast("double") / lit(twoPow60)
    docs.select(col(idCol).as("id"), weight.cast("double").as("w"))
      .filter(col("w") > 0.0)
      .withColumn("skey", org.apache.spark.sql.graft.NativeLn(u) / col("w"))
      .orderBy(col("skey").desc, col("id").asc)
      .limit(k)
  }

  /** Deterministic k-per-stratum sample: the k documents with the
    * smallest (hash60(id, seed), id) per `strataCol` value — a fixed,
    * reproducible "random" sample per stratum (language, source,
    * quality band) for eval-set carving or per-stratum inspection.
    *
    * Logical result == `row_number() over (partition by strata order
    * by hash, id) <= k`, but the plan never sorts a stratum on one
    * task: phase 1 takes a per-(stratum, salt) top-k (window
    * partitions bounded by ~|stratum|/salts — safe when one stratum
    * is half the corpus), phase 2 re-ranks the <= k*salts survivors
    * per stratum (tiny by construction). Phase-1 correctness: the
    * stratum-global top-k rows each rank <= k within their own salt
    * cell, so phase 1 never discards a global winner.
    *
    * Output: strata, id, rk (1..k by the hash order).
    */
  def stratifiedSample(docs: DataFrame, idCol: String, strataCol: String,
      k: Int, seed: Int = 0, salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0)
    val hashed = docs
      .select(col(strataCol).as("strata"), col(idCol).as("id"))
      .withColumn("hkey", Hashing.hash60(col("id").cast("string"), seed))
      .withColumn("salt", pmod(col("hkey"), lit(salts)))
    val wLocal = Window.partitionBy(col("strata"), col("salt"))
      .orderBy(col("hkey"), col("id"))
    val wGlobal = Window.partitionBy(col("strata"))
      .orderBy(col("hkey"), col("id"))
    hashed
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= k)
      .withColumn("rk", row_number().over(wGlobal))
      .filter(col("rk") <= k)
      .select(col("strata"), col("id"), col("rk"))
  }
}
