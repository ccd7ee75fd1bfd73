package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alert classification cascade (after the public fink-filters
  * classification scheme consumed by the hostless module's gate,
  * ztf/hostless_detection/processor.py:165-188, and by downstream
  * consumers of `finkclass`). Priority order: confirmed solar-system
  * objects, tracklets (satellite glints), early-SN-Ia and SN candidates,
  * kilonova and microlensing candidates, then the SIMBAD crossmatch
  * type, else Unknown. Thresholds follow the published Fink convention
  * (score > 0.5, quality cuts on drb/classtar, short history for early
  * types).
  */
object FinkClassification {

  private val unknownTypes =
    Seq("Unknown", "Transient", "Fail", "")

  def classify(
      cdsxmatch: Column, roid: Column, mulensScore: Column,
      snnSnia: Column, snnSnVsAll: Column, rfSnia: Column,
      ndethist: Column, drb: Column, classtar: Column,
      jd: Column, jdstarthist: Column, rfKn: Column,
      tracklet: Column): Column = {
    val highQuality = drb > 0.5 && classtar > 0.4
    val young = jd - jdstarthist < 20
    val earlySnIa = rfSnia > 0.5 && snnSnia > 0.5 && highQuality &&
      ndethist <= 20 && young
    val snCandidate = snnSnia > 0.5 && snnSnVsAll > 0.5 && highQuality
    val kilonova = rfKn > 0.5 && snnSnVsAll > 0.5 && highQuality && young
    val microlensing = mulensScore > 0.5
    val knownSimbad = !cdsxmatch.isin(unknownTypes: _*) && cdsxmatch.isNotNull

    when(roid === 3, lit("Solar System MPC"))
      .when(roid === 2, lit("Solar System candidate"))
      .when(tracklet.isNotNull && tracklet =!= "", lit("Tracklet"))
      .when(kilonova, lit("Kilonova candidate"))
      .when(earlySnIa, lit("Early SN Ia candidate"))
      .when(snCandidate, lit("SN candidate"))
      .when(microlensing, lit("Microlensing candidate"))
      .when(knownSimbad, cdsxmatch)
      .otherwise(lit("Unknown"))
  }

  /** Append `finkclass` from the standard enrichment columns. */
  def apply(df: DataFrame): DataFrame =
    df.withColumn("finkclass", classify(
      col("cdsxmatch"), col("roid"), col("mulens"),
      col("snn_snia_vs_nonia"), col("snn_sn_vs_all"), col("rf_snia_vs_nonia"),
      col("candidate.ndethist"), col("candidate.drb"), col("candidate.classtar"),
      col("candidate.jd"), col("candidate.jdstarthist"), col("rf_kn_vs_nonkn"),
      col("tracklet")))
}
