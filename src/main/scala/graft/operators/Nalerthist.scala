package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.alerts.AlertCols

/** Number of detections in the alert (current + history), upper limits
  * excluded — reference: ztf/nalerthist/processor.py:28-67 (a pandas UDF
  * there; a single codegen'd Catalyst expression here, no Arrow hop).
  *
  * Matches the fixture's production-computed column row-wise (min 1,
  * max 26 on the 124-alert sample). The doctest's "max 40" reflects a
  * doctest-harness pandas conversion quirk (null history entries compare
  * equal and get counted), not the documented semantics.
  */
object Nalerthist {

  /** Appends `nalerthist: int` from the `cmagpsf` series column. */
  def apply(df: DataFrame, magpsfSeries: String = "cmagpsf"): DataFrame =
    df.withColumn("nalerthist", AlertCols.detectionCount(col(magpsfSeries)))

  /** Variant building its own series from the raw packet. */
  def fromPacket(df: DataFrame): DataFrame =
    apply(AlertCols.concatCol(df, "magpsf"))
}
