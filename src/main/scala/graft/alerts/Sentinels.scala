package graft.alerts

/** Per-module sentinel conventions (SURVEY.md §7.4 risk 4: "encode
  * per-module in one constants file"). These are part of the public
  * semantics a consumer of the reference relies on; each module cites
  * its source line.
  */
object Sentinels {

  /** Remote crossmatch: service unreachable
    * (ztf/xmatch/processor.py:151-153). */
  val XmatchFail = "Fail"

  /** Crossmatch: no counterpart within radius
    * (ztf/xmatch/processor.py:190-195, 593-595). */
  val XmatchUnknown = "Unknown"

  /** Language ID fallback (no stopword hit in any language). */
  val LangUndetermined = "und"

  /** Classifier scores: gate rejected the alert — 0.0 for the
    * RF/SNN/kilonova/mulens family (e.g.
    * ztf/random_forest_snia/processor.py:190). */
  val ScoreGated = 0.0

  /** Superluminous / blazar features / orphans: invalid or not
    * computable — -1.0 (ztf/superluminous/processor.py:155,
    * ztf/blazar_extreme_state/processor.py:222). */
  val ScoreInvalid = -1.0

  /** Hostless detection: stamps missing/malformed or gate rejected
    * (ztf/hostless_detection/processor.py:202). */
  val HostlessDefault = -99.0f

  /** Power-spectrum analysis: degenerate distance distributions
    * (ztf/hostless_detection/powerspectrum.py:214-216). */
  val PowerSpectrumDegenerate = -1.0

  /** Anomaly score when no band has features (TwoBandModel min of an
    * all-masked stack, ztf/anomaly_detection/processor.py:128-133). */
  val AnomalyNoFeatures = Double.NaN

  /** Upper limits inside measurement arrays travel as null (parquet) /
    * NaN (kernels); detection counting excludes both (SURVEY.md §1.4). */
  val UpperLimit = Double.NaN

  /** Negative-distance "absent" markers cleaned to 99 by
    * transient_features (ztf/transient_features/processor.py:52-73). */
  val CleanedDistance = 99.0

  /** ZTF PS1 magnitude "absent" guard value
    * (ztf/transient_features/processor.py:107-125). */
  val AbsentMagnitude = 99.0

  /** MPC distance when no solar-system object is known: -999
    * (ztf/asteroids/processor.py:73). */
  val NoSsoDistance = -999.0
}
