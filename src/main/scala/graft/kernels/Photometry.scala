package graft.kernels

/** Difference-to-DC photometry conversions (after fink-utils'
  * vect_dc_mag / is_source_behind, used at
  * ztf/ad_features/processor.py:30-31,173-186 and
  * ztf/standardized_flux/utils.py).
  *
  * ZTF difference photometry measures sci-minus-ref flux; when a source
  * sits on top of a reference-catalog object (distnr small), the DC
  * (direct) magnitude re-adds the reference flux:
  *   f_dc = f_ref +/- f_diff   (+ for positive subtraction)
  *   m_dc = -2.5 log10(f_dc)
  * with errors propagated in flux space.
  */
object Photometry {

  /** Source considered "behind" the alert: 0 < distnr < 1.5 arcsec. */
  def isSourceBehind(distnr: Double): Boolean =
    distnr > 0.0 && distnr < 1.5

  private def magToFlux(mag: Double): Double = math.pow(10.0, -0.4 * mag)

  /** (dcMag, dcSigma); NaN when the DC flux is non-positive (negative
    * subtraction larger than the reference flux).
    */
  def dcMag(magpsf: Double, sigmapsf: Double, magnr: Double,
      sigmagnr: Double, isdiffpos: String): (Double, Double) = {
    val fRef = magToFlux(magnr)
    val fDiff = magToFlux(magpsf)
    val sign = if (isdiffpos == "t" || isdiffpos == "1" || isdiffpos == "true") 1.0 else -1.0
    val fDc = fRef + sign * fDiff
    if (!(fDc > 0)) return (Double.NaN, Double.NaN)
    val sfRef = sigmagnr * math.log(10.0) / 2.5 * fRef
    val sfDiff = sigmapsf * math.log(10.0) / 2.5 * fDiff
    val sfDc = math.sqrt(sfRef * sfRef + sfDiff * sfDiff)
    (-2.5 * math.log10(fDc), 2.5 / math.log(10.0) * sfDc / fDc)
  }
}
