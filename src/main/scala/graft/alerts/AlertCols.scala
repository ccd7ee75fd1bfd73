package graft.alerts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core alert-table column conventions (SURVEY.md §1).
  *
  * An alert table is a DataFrame of nested alert packets; enrichment
  * appends columns. The load-bearing convention is `concat_col`
  * (SURVEY.md §1.4, after fink-utils' concat_col used throughout the
  * reference, e.g. ztf/random_forest_snia/processor.py:113): for a field
  * X, `cX = history.X ++ [current.X]` — the per-alert time series as an
  * array column, nulls inside meaning upper limits / non-detections.
  *
  * Everything here is a native Catalyst expression: the array projection
  * `prv_candidates.X` and `concat` run inside whole-stage codegen, with
  * nested-schema pruning pushing only the needed struct fields into the
  * parquet scan.
  */
object AlertCols {

  /** ZTF packet layout. */
  val ZtfCurrent = "candidate"
  val ZtfHistory = "prv_candidates"

  /** Rubin packet layout (rubin/slsn/processor.py:66-69). */
  val RubinCurrent = "diaSource"
  val RubinHistory = "prvDiaSources"

  /** cX = history.X ++ [current.X]; null history treated as empty. */
  def concatCol(df: DataFrame, column: String, prefix: String = "c",
      current: String = ZtfCurrent, history: String = ZtfHistory): DataFrame =
    df.withColumn(prefix + column,
      concat(
        coalesce(col(s"$history.$column"), array().cast(df.select(col(s"$history.$column")).schema.head.dataType)),
        array(col(s"$current.$column"))))

  /** Apply concatCol over several fields at once. */
  def withHistory(df: DataFrame, columns: Seq[String], prefix: String = "c",
      current: String = ZtfCurrent, history: String = ZtfHistory): DataFrame =
    columns.foldLeft(df)((d, c) => concatCol(d, c, prefix, current, history))

  /** Count of real detections in a measurement array: entries that are
    * neither null (absent) nor NaN (upper limit). Matches the reference's
    * `np.sum(np.array(x) == np.array(x))` (ztf/nalerthist/processor.py:66).
    */
  def detectionCount(arr: Column): Column =
    size(filter(arr, x => x.isNotNull && !isnan(x)))

  /** Spark-NaN-safe numeric predicate guard: true iff c is a real number. */
  def isReal(c: Column): Column = c.isNotNull && !isnan(c)
}
