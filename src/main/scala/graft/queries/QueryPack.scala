package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named set of driver-checkable queries.
  *
  * Contract (see the driver spec in /root/repo and `graft.Verify`):
  *  - `queries`: name -> (spark, sfDir) => DataFrame
  *  - `oracles`: name -> equivalent ANSI SQL runnable by DuckDB over the
  *    same parquet tables. Omitted names get a weaker rows-only check.
  *
  * Determinism rules used throughout (the driver hash-compares values):
  *  - Every query ends in a total-order `ORDER BY` (unique key included).
  *  - Floating aggregates are computed in DECIMAL (exact, order-insensitive
  *    under Spark's nondeterministic shuffle reduce order) and cast to
  *    DOUBLE only at the end, so Spark and DuckDB produce bit-identical
  *    doubles.
  *  - Column names are aliased identically on both sides.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Exact decimal view of a 2-decimal-ish double column. */
  protected def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Order-insensitive exact sum of a double column, as double. */
  protected def sumd(c: Column): Column = sum(dec(c)).cast("double")

  /** DuckDB-side equivalents. */
  protected def sqlDec(e: String): String = s"CAST($e AS DECIMAL(18,4))"
  protected def sqlSumd(e: String): String =
    s"CAST(SUM(${sqlDec(e)}) AS DOUBLE)"
}
