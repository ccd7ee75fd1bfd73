package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.alerts.AlertCols.detectionCount

/** Pre-classifier selection gates (SURVEY.md §2.3 "selection cuts") as
  * pure Catalyst boolean columns — the reference computes these inside
  * each pandas UDF (e.g. ztf/random_forest_snia/processor.py:37-74,
  * ztf/snn/processor.py:36-81, ztf/kilonova/processor.py:131-138); here
  * they are plan-level predicates Catalyst can push below expensive
  * kernels (the reference's own advice:
  * ztf/hostless_detection/processor.py:44-46).
  */
object SelectionCuts {

  /** SIMBAD types acceptable as extra-galactic SN hosts (after
    * fink-utils' return_list_of_eg_host, public fink-utils repo;
    * consumed at ztf/snn/processor.py:78-79).
    */
  val egHostTypes: Seq[String] = Seq(
    "Unknown", "Candidate_SN*", "SN", "Transient", "Fail") ++ Seq(
    "galaxy", "Galaxy", "EmG", "Seyfert", "Seyfert_1", "Seyfert_2",
    "BlueCompG", "StarburstG", "LSB_G", "HII_G", "High_z_G", "GinPair",
    "GinGroup", "BClG", "GinCl", "PartofG")

  def isEgHost(cdsxmatch: Column): Column =
    cdsxmatch.isin(egHostTypes: _*)

  /** Early-SN-Ia gate (random_forest_snia): >= minpoints real
    * detections, short history, extra-galactic host.
    */
  def sniaGate(cmagpsf: Column, ndethist: Column, cdsxmatch: Column,
      minPoints: Int = 4, maxNdethist: Int = 20): Column =
    (detectionCount(cmagpsf) >= minPoints) &&
      (ndethist <= maxNdethist) && isEgHost(cdsxmatch)

  /** SNN gate: >= minpoints, young (last jd - jdstarthist bounded), not
    * a confirmed SSO, extra-galactic host.
    */
  def snnGate(cmagpsf: Column, cjd: Column, jdstarthist: Column,
      roid: Column, cdsxmatch: Column,
      minPoints: Int = 2, maxDuration: Double = 90): Column =
    (detectionCount(cmagpsf) >= minPoints) &&
      (element_at(cjd, -1) - jdstarthist <= maxDuration) &&
      (roid =!= 3) && isEgHost(cdsxmatch)

  /** Kilonova gate: like snia but tighter on history length. */
  def kilonovaGate(cmagpsf: Column, ndethist: Column, cdsxmatch: Column,
      minPoints: Int = 2, maxNdethist: Int = 20): Column =
    sniaGate(cmagpsf, ndethist, cdsxmatch, minPoints, maxNdethist)
}
