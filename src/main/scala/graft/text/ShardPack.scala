package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign documents to contiguous training
  * shards of ~`budgetTokens` tokens each, in a deterministic order —
  * the step that turns a cleaned corpus into fixed-size training-data
  * files. A document goes to the shard its PRECEDING token mass fills:
  * `shard = floor((cumsum(nt) - nt) / budget)`, so shard boundaries
  * never split a document and every shard except the last carries at
  * least `budget - max_doc_tokens + 1` tokens.
  *
  * Scale shape: one window prefix-sum per `groupCol` partition (hash
  * shuffle + in-partition sort on the id). The group column bounds the
  * sequential span: packing is per-(source) here, per-(source, date)
  * or per-bucket in a 100 TB pipeline — the mechanism is identical and
  * no global total order is ever required. The prefix sum is the only
  * non-map stage.
  */
object ShardPack {

  def pack(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs // null text counts as empty (one token) — a NULL token count
      // would poison the prefix sum and every later shard id
      .withColumn("n_tokens",
        TextOps.tokenCount(coalesce(col(textCol), lit(""))))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(budgetTokens))
          .cast("long").as("shard"))
  }

  /** Multi-level packing — the mechanism for the 100 TB sequential-span
    * problem [[pack]] delegates to its caller's group key: a skewed
    * group (one source holding half the corpus) makes the per-group
    * prefix sum a single sorted partition of that size. Here every doc
    * first lands in a deterministic sub-bucket (`hash(id) mod
    * nBuckets`, the cross-engine md5 family so oracles reproduce it),
    * the prefix sum runs per (group, bucket) — window partitions are
    * bounded by ~|group|/nBuckets whatever the source skew — and shard
    * ids are then renumbered GLOBALLY unique via a per-(group, bucket)
    * offset table: one tiny aggregate (groups x buckets rows), an
    * exclusive prefix sum over it, broadcast back. Shard boundaries
    * still never split a document, every shard except each bucket's
    * last still carries >= budget - max_doc_tokens + 1 tokens, and the
    * only data-scale wide stages are the bucketed window and one
    * partial-aggregatable max — the offset table's single-partition
    * window is groups x buckets rows, not data.
    *
    * Output: (id, group, bucket, n_tokens, shard_local, shard) with
    * `shard` unique across the whole output, and each (group, bucket)
    * occupying a disjoint id RANGE in (group, bucket) order. Within a
    * range, ids are consecutive only while every document fits the
    * budget: a single over-budget document advances the running token
    * sum by more than `budgetTokens`, so `floor(cum/budget)` skips the
    * intermediate values and leaves unused shard ids (holes) — by
    * construction, since shards never split a document. Consumers must
    * treat `shard` as an opaque grouping key, not a dense sequence.
    */
  def packBucketed(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, budgetTokens: Long, nBuckets: Int): DataFrame = {
    import graft.functions.Hashing
    val wLocal = Window.partitionBy(col(groupCol), col("bucket"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = docs
      .withColumn("bucket",
        Hashing.hash60(col(idCol).cast("string"), 0) % nBuckets)
      .withColumn("n_tokens",
        TextOps.tokenCount(coalesce(col(textCol), lit(""))))
      .withColumn("cum", sum(col("n_tokens")).over(wLocal))
      .select(col(idCol), col(groupCol), col("bucket"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(budgetTokens))
          .cast("long").as("shard_local"))
    // shards per (group, bucket) -> exclusive running offset; the
    // unpartitioned window is over the TINY aggregate only
    val wOff = Window.orderBy(col(groupCol), col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col(groupCol), col("bucket"))
      .agg((max(col("shard_local")) + lit(1L)).as("nsh"))
      .withColumn("off", coalesce(sum(col("nsh")).over(wOff), lit(0L)))
      .select(col(groupCol), col("bucket"), col("off"))
    local.join(broadcast(offsets), Seq(groupCol, "bucket"))
      .select(col(idCol), col(groupCol), col("bucket"), col("n_tokens"),
        col("shard_local"),
        (col("shard_local") + col("off")).as("shard"))
  }
}
