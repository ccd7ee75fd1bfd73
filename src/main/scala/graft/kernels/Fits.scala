package graft.kernels

import java.io.{ByteArrayInputStream, DataInputStream}
import java.util.zip.GZIPInputStream

/** Minimal FITS image reader for the gzip'd ZTF cutout stamps
  * (reference: ztf/hostless_detection/pipeline_utils.py:46-57, which
  * uses astropy; the stamps are single-HDU 2-D float images).
  *
  * Supports the primary HDU: 2880-byte header blocks of 80-char cards,
  * BITPIX in {8,16,32,-32,-64}, NAXIS=2, optional BSCALE/BZERO,
  * big-endian data (the FITS standard). NaN pixels pass through.
  */
object Fits {

  final case class Image(data: Array[Array[Double]]) {
    def rows: Int = data.length
    def cols: Int = if (data.isEmpty) 0 else data(0).length
  }

  /** Read a gzip-compressed FITS primary image. */
  def readGzipped(bytes: Array[Byte]): Option[Image] = {
    try {
      val in = new DataInputStream(new GZIPInputStream(new ByteArrayInputStream(bytes)))
      val all = in.readAllBytes()
      read(all)
    } catch { case _: Exception => None }
  }

  def read(all: Array[Byte]): Option[Image] = {
    try {
      var bitpix = 0
      var naxis = 0
      var naxis1 = 0
      var naxis2 = 0
      var bscale = 1.0
      var bzero = 0.0
      var pos = 0
      var done = false
      while (!done && pos + 80 <= all.length) {
        val card = new String(all, pos, 80, "US-ASCII")
        val key = card.take(8).trim
        def num: Double = card.drop(10).takeWhile(_ != '/').trim.toDouble
        key match {
          case "BITPIX" => bitpix = num.toInt
          case "NAXIS" => naxis = num.toInt
          case "NAXIS1" => naxis1 = num.toInt
          case "NAXIS2" => naxis2 = num.toInt
          case "BSCALE" => bscale = num
          case "BZERO" => bzero = num
          case "END" => done = true
          case _ =>
        }
        pos += 80
      }
      if (!done || naxis != 2 || naxis1 <= 0 || naxis2 <= 0) return None
      // data starts at the next 2880 boundary
      val dataStart = ((pos + 2879) / 2880) * 2880
      val bytesPer = math.abs(bitpix) / 8
      val need = naxis1 * naxis2 * bytesPer
      if (dataStart + need > all.length) return None
      val buf = java.nio.ByteBuffer.wrap(all, dataStart, need) // big-endian default
      val out = Array.ofDim[Double](naxis2, naxis1)
      var r = 0
      while (r < naxis2) {
        var c = 0
        while (c < naxis1) {
          val raw = bitpix match {
            case 8 => (buf.get() & 0xff).toDouble
            case 16 => buf.getShort().toDouble
            case 32 => buf.getInt().toDouble
            case -32 => buf.getFloat().toDouble
            case -64 => buf.getDouble()
            case _ => return None
          }
          out(r)(c) = bzero + bscale * raw
          c += 1
        }
        r += 1
      }
      Some(Image(out))
    } catch { case _: Exception => None }
  }
}
