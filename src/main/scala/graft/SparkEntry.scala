package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query packs (each a [[graft.queries.QueryPack]]) contribute
  * (query, oracle-SQL) pairs; names must be unique across packs.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(Relational, PipelineQueries, AlertQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A composite slice of the engine: series assembly + detection
    * counting + when-cascade classification + crossmatch + aggregation.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val flags = AlertQueries.queries("f2_roid_cascade")(spark, dir)
    val labels = AlertQueries.queries("x1_crossmatch")(spark, dir)
    val events = graft.Tables.t(spark, dir, "events")
      .select(col("event_id").as("id"), col("user_id"))
    events
      .join(labels, "id")
      .join(flags, "user_id")
      .groupBy(col("flag"), (col("match_label") =!= "Unknown").as("matched"))
      .agg(count(lit(1)).as("n"))
      .orderBy("flag", "matched")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
