package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Point-in-interval join at scale: every left row whose `pointCol`
    * falls in a right row's half-open [`startCol`, `endCol`) interval.
    * A raw range predicate gives Catalyst no equi-key, so the plan
    * collapses to a broadcast-nested-loop / cartesian product —
    * O(|L| x |R|) comparisons however selective the predicate. Coarse
    * bucketing restores an equi-join: each right interval explodes to
    * the `bucketWidth`-wide buckets it touches, each left point maps
    * to its single bucket, the join runs on the bucket key, and the
    * exact predicate filters within the bucket. Each matching pair
    * meets in exactly one bucket (the point's), so no dedup is needed.
    *
    * Cost: |R| x (interval/bucketWidth + 2) shuffled rows and only
    * same-bucket comparisons — pick `bucketWidth` on the order of the
    * typical interval length. Columns must be numeric (day numbers,
    * epoch seconds); callers convert timestamps first, which also pins
    * the timezone semantics on one side. All-integer comparisons keep
    * the join cross-engine exact.
    */
  def intervalJoin(left: DataFrame, pointCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "intervalJoin needs a positive bucketWidth")
    require(!left.columns.toSet.exists(right.columns.toSet),
      "intervalJoin left/right column names must be disjoint")
    val bw = lit(bucketWidth)
    val l = left.withColumn("__bk", floor(col(pointCol) / bw).cast("long"))
    // end is exclusive: an interval ending exactly on a bucket boundary
    // does not reach into that bucket
    val r = right.withColumn("__bk",
      explode(sequence(floor(col(startCol) / bw).cast("long"),
        floor((col(endCol) - lit(1)) / bw).cast("long"))))
    l.join(r, Seq("__bk"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bk")
  }

  /** Backward as-of join: each left row picks up the right row with the
    * LARGEST right timestamp <= its own, per key (the time-series
    * enrichment join — "state as of this event" — that neither Spark
    * nor the reference has natively; DuckDB's ASOF JOIN is the oracle).
    *
    * Spark-first shape: NOT a range join (a theta-join on `ts <= ts`
    * explodes to per-key cross products that the optimizer can't
    * bound) — instead the classic union-and-carry: tag both inputs,
    * union them into one (key, ts)-sorted stream, and carry the most
    * recent right payload forward with `last(ignoreNulls) over rows
    * unbounded preceding`. ONE shuffle on the key and a per-key sort —
    * the cost of a sort-merge join — with output exactly |left| rows
    * whatever the right-side history density. Running-state windows
    * are partial-friendly (no full materialization per key); a
    * heavy-hitter key serializes into one task like any per-key
    * window — pre-filter the right side's history depth when a key's
    * combined rows exceed a task (the salting answer does not apply:
    * as-of needs the whole per-key history visible).
    *
    * Tie semantics: a right row AT the left row's timestamp matches
    * (inclusive, like DuckDB's `ON l.ts >= r.ts`); right rows sort
    * before left rows at equal timestamps to make that so. Right rows
    * must be unique per (key, ts) — duplicate right timestamps have no
    * defined winner in any as-of engine; aggregate first.
    *
    * `rightCols` are appended under their own names (caller ensures no
    * clash with left columns); unmatched left rows carry nulls.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin needs at least one right column")
    val leftCols = left.columns.toSeq
    require(!rightCols.exists(leftCols.contains),
      s"asofJoin right columns ${rightCols.mkString(",")} clash with left")
    // tagged union on a common schema. The right payload travels as ONE
    // struct (null on left rows) so last(ignoreNulls) carries a whole
    // right ROW: per-column carry would resurrect older values under
    // legitimately-null right fields.
    val payType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rpay", lit(null).cast(payType))
      .select(Seq(col(key), col("__ts"), col("__side"), col("__rpay")) ++
        leftCols.filterNot(_ == key).map(col): _*)
    val taggedRight = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__rpay", struct(rightCols.map(col): _*))
      .select(Seq(col(key), col("__ts"), col("__side"), col("__rpay")) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn("__carried", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__carried").getField(c).as(c)): _*)
  }
}
