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
}
