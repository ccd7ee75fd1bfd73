package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join utilities for the 100 TB execution model (SURVEY.md §4,
  * BASELINE.md): bucketing for shuffle-free co-located joins and salting
  * for skewed keys. These are harness-level tools — the science modules
  * themselves are map-only — but any production deployment joining alert
  * tables against large history/object tables needs both.
  */
object ScaleJoins {

  /** Persist a DataFrame bucketed (and sorted) by the join key. A later
    * equi-join between two tables bucketed the same way needs no
    * exchange: Catalyst proves the partitioning requirement is already
    * satisfied (and with sorted buckets, no sort either).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted join for a skewed left key: the left side gets a
    * deterministic salt in [0, salts) derived from other row content,
    * the right side is replicated `salts` times, and the join runs on
    * (key, salt) — splitting each hot key across `salts` reducers.
    * Exact: every original pair appears exactly once.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, saltSource: String): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
