package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Transient vetting features — 7 boolean columns over the raw packet.
  * Reference: ztf/transient_features/processor.py:34-473 (already pure
  * Spark SQL there; transcribed to Column expressions, with the
  * intermediate `withColumn`s folded into local expressions so the plan
  * stays a single Project).
  *
  * Null semantics follow SQL three-valued logic exactly as the reference
  * does (e.g. `faint` is null when magpsf is null).
  */
object TransientFeatures {

  val featureColumns: Seq[String] = Seq(
    "faint", "positivesubtraction", "real", "pointunderneath",
    "brightstar", "variablesource", "stationary")

  private def c(field: String): Column = col(s"candidate.$field")

  /** Negative-sentinel cleanup: distances < 0 mean "absent" -> 99. */
  private def cleanDist(field: String): Column =
    when(c(field) < 0, 99).otherwise(c(field))

  /** Guarded magnitude: non-positive means "absent" -> 99. */
  private def posMag(field: String): Column =
    when(c(field) > 0, c(field)).otherwise(lit(99))

  private def isPos(e: Column): Column =
    e.cast("string").isin("1", "t", "true")

  def apply(df: DataFrame): DataFrame = {
    val originalCols = df.columns.toSeq

    val mNow = c("magpsf")
    val tNow = c("jd")
    val age = c("jd") - c("jdstarthist")
    val prv = col("prv_candidates")

    val distnr = cleanDist("distnr")
    val distpsnr1 = cleanDist("distpsnr1")
    val distpsnr2 = cleanDist("distpsnr2")
    val distpsnr3 = cleanDist("distpsnr3")

    // first valid PS1 magnitude in r -> i -> g priority, else 99
    val ps1mag =
      when(c("srmag1") > 0 && c("srmag1") < 30, c("srmag1"))
        .when(c("simag1") > 0 && c("simag1") < 30, c("simag1"))
        .when(c("sgmag1") > 0 && c("sgmag1") < 30, c("sgmag1"))
        .otherwise(lit(99))
    val ps1maxmag = least(posMag("srmag1"), posMag("simag1"),
      posMag("sgmag1"), posMag("szmag1"))

    // history entries that passed (positive, bright) in the last 30d
    val prevpasscount = size(filter(prv, cand =>
      (tNow - cand.getField("jd") < 30) &&
        (tNow - cand.getField("jd") > 0.75) &&
        isPos(cand.getField("isdiffpos")) &&
        (cand.getField("magpsf") > 0) &&
        (cand.getField("magpsf") < 19.8)))

    // peak magnitude over same-band history + current
    val peakmag = least(mNow, array_min(transform(
      filter(prv, cand => cand.getField("fid") === c("fid")),
      cand => cand.getField("magpsf"))))

    // 1. faint: currently fainter than 19.8, or a very recent faint
    // detection. NB the recent-detection test uses the *current* alert's
    // isdiffpos (the unqualified `isdiffpos` in the reference's lambda,
    // processor.py:173, resolves to the outer column, not cand's).
    val faint = (mNow >= 19.8) ||
      (size(filter(prv, cand =>
        (abs(tNow - cand.getField("jd")) < 0.75) &&
          isPos(c("isdiffpos")) &&
          (cand.getField("magpsf") >= 19))) > 0)

    // 2. positivesubtraction: brighter than the template image
    val positivesubtraction = isPos(c("isdiffpos"))

    // 3. real: not an artifact (negated DNF of rb/drb/gaia/PS1 vetoes)
    val notReal =
      (c("rb") <= 0.2) ||
        (c("rb") < 0.35 && abs(c("neargaia")) < 1 && abs(c("maggaia")) < 17) ||
        (c("rb") < 0.35 && distpsnr1 < 1 && c("sgscore1") > 0.49 &&
          (abs(c("srmag1")) < 17 || abs(c("simag1")) < 17 || abs(c("szmag1")) < 16.5)) ||
        (c("rb") < 0.45 && abs(c("neargaia")) < 1.5 && abs(c("maggaia")) < 15.5) ||
        (c("rb") < 0.45 && distpsnr1 < 1.5 && c("sgscore1") > 0.49 &&
          (abs(c("srmag1")) < 15.5 || abs(c("simag1")) < 15.5 || abs(c("szmag1")) < 15)) ||
        (c("drb") < 0.8) ||
        (c("drb") < 0.9 && distpsnr1 < 3 && ps1mag < 16 && age > 90) ||
        (c("drb") < 0.9 && distpsnr1 < 1.1 && ps1mag < 18 && age > 90) ||
        (c("drb") < 0.95 && distpsnr1 < 1.5 && ps1mag < 15.5 && age > 90) ||
        (c("drb") < 0.95 && distpsnr1 < 0.8 && ps1mag < 17.5 && age > 90)
    val real = !notReal

    // 4. pointunderneath: on top of / blended with a PS1 star
    val pointunderneath =
      (c("sgscore1") > 0.76 && distpsnr1 < 2.5) ||
        (c("sgscore1") > 0.2 && distpsnr1 < 1 && c("srmag1") > 0 &&
          c("szmag1") > 0 && (c("srmag1") - c("szmag1") > 3)) ||
        (c("sgscore1") > 0.2 && distpsnr1 < 1 && c("srmag1") > 0 &&
          c("simag1") > 0 && (c("srmag1") - c("simag1") > 3))

    // 5. brightstar: contaminated by a nearby bright star
    val brightstar =
      (abs(c("neargaiabright")) < 20 && abs(c("maggaiabright")) < 12) ||
        (distpsnr1 < 20 && abs(c("srmag1")) < 14 && c("sgscore1") > 0.9) ||
        (distpsnr2 < 20 && abs(c("srmag2")) < 14 && c("sgscore2") > 0.9) ||
        (distpsnr3 < 20 && abs(c("srmag3")) < 14 && c("sgscore3") > 0.9) ||
        (distpsnr1 < 20 && abs(c("simag1")) < 14 && c("sgscore1") > 0.9) ||
        (distpsnr1 < 10 && abs(c("szmag1")) < 14 && c("sgscore1") > 0.9)

    // 6. variablesource: likely a variable star
    val prevpassThreshold =
      when(age > 360, lit(1)).when(age > 90, lit(2)).otherwise(lit(3))
    val variablesource =
      ((age > 90) && (c("ndethist") > 30) &&
        (prevpasscount >= prevpassThreshold) && (c("magnr") > 0) &&
        !((mNow <= peakmag) && (mNow < 18.5)) &&
        ((distnr < 0.4 && c("magnr") < 19.5) ||
          (distnr < 0.8 && c("magnr") < 17.5) ||
          (distnr < 1.2 && c("magnr") < 15.5))) ||
        ((c("maggaia") > 0) && (c("neargaia") > 0) &&
          ((c("neargaia") < 0.35 && c("maggaia") < 17 && age > 30) ||
            (c("neargaia") < 0.35 && c("maggaia") < 19 && age > 300 && mNow > 18.5) ||
            (c("neargaia") < 0.2 && c("maggaia") < 18 && age > 90))) ||
        (c("sgscore1") > 0.25 && distpsnr1 < 3 && age > 90 && ps1maxmag < 16) ||
        (c("sgscore1") === 0.5 && distpsnr1 < 0.5 && age > 90 && ps1maxmag < 17) ||
        ((c("magnr") > 0) && (c("magnr") < mNow - 1) && (age > 90) &&
          (distnr < 0.5) && (mNow > peakmag)) ||
        (c("ndethist") > 200)

    // 7. stationary: >= 1 previous clean positive detection off-exposure
    val stationary = coalesce(
      exists(prv, cand =>
        (abs(tNow - cand.getField("jd")) > 0.02) &&
          (cand.getField("magpsf") < 99) &&
          lower(cand.getField("isdiffpos").cast("string")).isin("1", "true", "t")),
      lit(false))

    df.select(
      originalCols.map(col) ++ Seq(
        faint.as("faint"),
        positivesubtraction.as("positivesubtraction"),
        real.as("real"),
        pointunderneath.as("pointunderneath"),
        brightstar.as("brightstar"),
        variablesource.as("variablesource"),
        stationary.as("stationary")): _*)
  }
}
