package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.alerts.AlertCols.{detectionCount, isReal}

/** Solar-system-object flag (`roid`), 0-3 — reference:
  * ztf/asteroids/processor.py:29-167 (pandas UDF); here a pure Catalyst
  * when-cascade over the packet + the `cjd`/`cmagpsf` series columns.
  *
  * The reference applies masks sequentially (last write wins):
  *   0. flags = 0
  *   1. ndethist == 1                        -> 1
  *   2. sgscore1 < 0.76 && ndethist <= 2     -> 2
  *   3. 0 < distpsnr1 < 5                    -> 0   (overrides 1,2)
  *   4. nalerthist == 2 && last jd gap > 30' -> 0   (overrides 1,2)
  *   5. ndethist == 2 && nalerthist == 1     -> 0   (overrides 1,2)
  *   6. MPC match (ssdistnr in [0,5), |distpsnr1| > ssdistnr,
  *      ndethist <= 5, nalerthist <= 5)      -> 3   (overrides all)
  * which inverts into the when-cascade below (first match wins).
  *
  * NaN discipline: numpy comparisons with NaN are false; Spark orders NaN
  * larger than any double, so every >= / > against a possibly-NaN column
  * is guarded with isReal (NaN < x is already false in both engines).
  *
  * Matches the fixture's production-computed `roid` column row-wise
  * ({0: 123, 3: 1} on the 124-alert sample). The doctest's 3/3 golden
  * counts reflect the doctest harness's upper-limit-counting quirk (see
  * Nalerthist), not production semantics.
  */
object Asteroids {

  private val thirtyMinutes = 30.0 / (24.0 * 60.0)

  def roidFlag(cjd: Column, cmagpsf: Column, ndethist: Column,
      sgscore1: Column, ssdistnr: Column, distpsnr1: Column): Column = {
    val nalerthist = detectionCount(cmagpsf)
    val lastGap = element_at(cjd, -1) - element_at(cjd, -2)

    val mpcMatch = isReal(ssdistnr) && ssdistnr >= 0.0 && ssdistnr < 5.0 &&
      isReal(distpsnr1) && (abs(distpsnr1) - ssdistnr > 0.0) &&
      ndethist <= 5 && nalerthist <= 5
    val nearPs1 = distpsnr1 < 5.0 && distpsnr1 > 0.0
    val longTrend = nalerthist === 2 && lastGap > thirtyMinutes
    val veryLongTrend = ndethist === 2 && nalerthist === 1
    val finkSso = sgscore1 < 0.76 && ndethist <= 2
    val firstDet = ndethist === 1

    when(mpcMatch, 3)
      .when(nearPs1 || longTrend || veryLongTrend, 0)
      .when(finkSso, 2)
      .when(firstDet, 1)
      .otherwise(0)
  }

  /** Appends `roid: int`; expects `cjd`/`cmagpsf` series columns. */
  def apply(df: DataFrame): DataFrame =
    df.withColumn("roid", roidFlag(
      col("cjd"), col("cmagpsf"),
      col("candidate.ndethist"), col("candidate.sgscore1"),
      col("candidate.ssdistnr"), col("candidate.distpsnr1")))
}
