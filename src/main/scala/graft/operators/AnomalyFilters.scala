package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-model custom pre-filters for anomaly scoring — reference:
  * ztf/anomaly_detection/processor.py:73-82 (raw SQL predicate strings,
  * including spherical trig; applied as DataFrame filters so Catalyst
  * pushes them below the scoring kernel).
  */
object AnomalyFilters {

  /** The reference's published filters, keyed by model suffix. The
    * `_varvara` filter keeps alerts within ~60 degrees of the north
    * galactic pole via the spherical cosine formula.
    */
  val filters: Map[String, String] = Map(
    "_beta" -> "objectId LIKE '%ZTF21%'",
    "_varvara" -> ("ABS(" +
      "SIN(RADIANS(dec)) * SIN(RADIANS(27.12825)) + " +
      "COS(RADIANS(dec)) * COS(RADIANS(27.12825)) * " +
      "COS(RADIANS(ra - 192.85948))" +
      ") > 0.5"))

  /** Apply the filter registered for `model` (no-op when absent). */
  def apply(df: DataFrame, model: String): DataFrame =
    filters.get(model).map(df.filter).getOrElse(df)
}
