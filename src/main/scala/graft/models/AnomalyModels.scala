package graft.models

/** Real anomaly-detection model loading.
  *
  * The reference distributes its per-band AAD isolation forests as ONNX
  * graphs inside data/models/anomaly_detection/anomaly_detection_forest_
  * AAD<model>.zip and selects 25 of the 26 light-curve features in a
  * fixed order (MODEL_COLUMNS, ztf/anomaly_detection/processor.py:33-59)
  * as the forest input layout.
  */
object AnomalyModels {

  /** Forest input feature order — must match the featureids baked into
    * the ONNX trees (ztf/anomaly_detection/processor.py:33-59).
    */
  val ModelColumns: Seq[String] = Seq(
    "amplitude", "anderson_darling_normal", "beyond_1_std", "chi2",
    "cusum", "kurtosis", "linear_fit_slope", "linear_fit_slope_sigma",
    "linear_trend_noise", "linear_trend_sigma",
    "magnitude_percentage_ratio_20_10", "magnitude_percentage_ratio_40_5",
    "maximum_slope", "median", "median_absolute_deviation",
    "median_buffer_range_percentage_10", "skew", "stetson_K",
    "percent_amplitude", "linear_fit_reduced_chi2",
    "inter_percentile_range_10", "linear_trend", "standard_deviation",
    "weighted_mean", "mean")

  /** Load a model zip into (forestFid1, forestFid2) scorers ready for
    * [[graft.operators.Classifiers.anomaly]].
    *
    * The reference scores fid=1 with forest_r_AAD*.onnx and fid=2 with
    * forest_g_AAD*.onnx (its data_r/data_g naming is band-swapped
    * relative to ZTF's fid=1→g, fid=2→r convention; processor.py:212-242
    * reproduced verbatim).
    */
  def load(zipPath: String, model: String = "_beta"): (Scorer, Scorer) = {
    val fid1 = OnnxTreeEnsemble.fromZipEntry(zipPath, s"forest_r_AAD$model.onnx")
    val fid2 = OnnxTreeEnsemble.fromZipEntry(zipPath, s"forest_g_AAD$model.onnx")
    (fid1, fid2)
  }
}
