package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kernels.{Fits, ImageStats, PowerSpectrum}

/** Rubin/LSST hostless detection — reference:
  * rubin/hostless_detection/{processor,run_pipeline,pipeline_utils}.py.
  * Differences from the ZTF variant: stamps are uncompressed FITS,
  * working resolution is a 30x30 center crop (crop_radius 15), a
  * template-outlier veto (> 20 masked template pixels means a big host
  * is present, not hostless), the second candidacy check runs at half
  * crop radius, and a moving-transient veto fits ra/dec vs time.
  */
object RubinHostless {

  val CropRadius = 15
  val MaxClip = 5
  val MinClip = 3
  val TemplateOutlierPixels = 20
  val Iterations = 200

  /** (scienceStat, templateStat) or (-99,-99) sentinels. */
  def processStamps(science: Array[Byte], template: Array[Byte],
      seed: Long, iterations: Int = Iterations): (Float, Float) = {
    val sOpt = Fits.read(science)
    val tOpt = Fits.read(template)
    if (sOpt.isEmpty || tOpt.isEmpty) return (-99f, -99f)
    var s = ImageStats.cropCenter(sOpt.get.data, CropRadius)
    var t = ImageStats.cropCenter(tOpt.get.data, CropRadius)
    if (s.length != t.length || s.length < 2 * CropRadius) return (-99f, -99f)

    val sClip = ImageStats.sigmaClip(nanToZero(s))
    val tClip = ImageStats.sigmaClip(nanToZero(t))
    // big host in the template -> not hostless
    if (tClip.countMasked > TemplateOutlierPixels) return (-99f, -99f)

    def check(a: ImageStats.Masked, b: ImageStats.Masked): Boolean = {
      val (na, nb) = (a.countMasked, b.countMasked)
      (na > MaxClip && nb < MinClip) || (nb > MaxClip && na < MinClip)
    }
    var candidate = check(sClip, tClip)
    if (!candidate) {
      // half-resolution recheck
      val s2 = ImageStats.sigmaClip(nanToZero(ImageStats.cropCenter(s, CropRadius / 2)))
      val t2 = ImageStats.sigmaClip(nanToZero(ImageStats.cropCenter(t, CropRadius / 2)))
      candidate = check(s2, t2)
    }
    if (!candidate) return (-99f, -99f)

    val rng = new java.util.Random(seed)
    val sFilled = ImageStats.noiseFill(nanToZero(s), sClip.mask, rng)
    val tFilled = ImageStats.noiseFill(nanToZero(t), tClip.mask, rng)
    val cut = math.min(2 * CropRadius, sFilled.length)
    val (a, _) = PowerSpectrum.hostStatistic(sFilled, cut, iterations, rng)
    val (b, _) = PowerSpectrum.hostStatistic(tFilled, cut, iterations, rng)
    (a.toFloat, b.toFloat)
  }

  private def nanToZero(img: Array[Array[Double]]): Array[Array[Double]] =
    img.map(_.map(v => if (v.isNaN) 0.0 else v))

  /** Moving-transient veto (pipeline_utils.py:109-160): first-degree
    * polynomial of ra/dec vs time; moving when the fitted sky speed
    * exceeds `minMovingArcsecHour` with residual rms under `maxRms`.
    */
  def maybeMoving(ra: Array[Double], dec: Array[Double], mjd: Array[Double],
      minDetections: Int = 3, minMovingArcsecHour: Double = 2.0,
      maxRmsArcsec: Double = 0.5): Boolean = {
    if (ra.length < minDetections) return false
    def fit(y: Array[Double]): (Double, Double) = { // slope, rms
      val n = y.length
      val tm = mjd.sum / n
      val ym = y.sum / n
      var stt = 0.0; var sty = 0.0
      var i = 0
      while (i < n) { val dt = mjd(i) - tm; stt += dt * dt; sty += dt * (y(i) - ym); i += 1 }
      if (stt == 0) return (0.0, Double.MaxValue)
      val slope = sty / stt
      var rss = 0.0
      i = 0
      while (i < n) { val r = y(i) - (ym + slope * (mjd(i) - tm)); rss += r * r; i += 1 }
      (slope, math.sqrt(rss / n))
    }
    val (sra, rmsRa) = fit(ra)
    val (sdec, rmsDec) = fit(dec)
    // slopes in deg/day -> arcsec/hour
    val speed = math.sqrt(sra * sra * math.pow(math.cos(math.toRadians(dec.head)), 2) +
      sdec * sdec) * 3600.0 / 24.0
    val rms = math.max(rmsRa, rmsDec) * 3600.0
    speed > minMovingArcsecHour && rms < maxRmsArcsec
  }

  /** Base operator: kstest_static over the Rubin cutout columns. */
  def base(spark: SparkSession, df: DataFrame,
      iterations: Int = Iterations): DataFrame = {
    val kernel = udf((sci: Array[Byte], tpl: Array[Byte], seed: Long) => {
      val (a, b) = processStamps(sci, tpl, seed, iterations)
      Array(a, b)
    })
    df.withColumn("kstest_static", kernel(
      col("cutoutScience"), col("cutoutTemplate"),
      coalesce(col("alertId"), lit(0L))))
  }
}
