package graft.models

import java.io.{DataInputStream, FileInputStream, BufferedInputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Reader for NumPy's .npy container (public format spec,
  * numpy/lib/format.py): magic "\\x93NUMPY", version, a Python-literal
  * header dict (descr, fortran_order, shape), then either raw
  * little-endian data (numeric dtypes) or a pickle stream (object
  * dtype, e.g. the reference's KN_PC_all_bands.npy — a 0-d object
  * array wrapping a dict of per-band PC matrices), which is delegated
  * to [[PickleReader]].
  */
object NpyReader {

  sealed trait Npy
  /** Numeric array: values flattened C-order with its shape. */
  final case class NumericNpy(shape: Vector[Int], values: Array[Double]) extends Npy
  /** Object payload (whatever the embedded pickle yields). */
  final case class ObjectNpy(value: Any) extends Npy

  def load(path: String): Npy = {
    val in = new DataInputStream(new BufferedInputStream(
      new FileInputStream(path), 1 << 16))
    try {
      val magic = new Array[Byte](6)
      in.readFully(magic)
      require(new String(magic, 1, 5, "ASCII") == "NUMPY" && magic(0) == 0x93.toByte,
        s"not an npy file: $path")
      val major = in.readUnsignedByte()
      in.readUnsignedByte() // minor
      val headerLen =
        if (major == 1) in.readUnsignedByte() | (in.readUnsignedByte() << 8)
        else { // v2/3: little-endian u4
          val b = new Array[Byte](4); in.readFully(b)
          ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
        }
      val headerBytes = new Array[Byte](headerLen)
      in.readFully(headerBytes)
      val header = new String(headerBytes, "ASCII")

      val descr = """'descr'\s*:\s*'([^']+)'""".r.findFirstMatchIn(header)
        .map(_.group(1)).getOrElse(sys.error(s"npy header without descr: $header"))
      val fortran = """'fortran_order'\s*:\s*(True|False)""".r
        .findFirstMatchIn(header).exists(_.group(1) == "True")
      require(!fortran, "fortran-order npy not supported")
      val shape = """'shape'\s*:\s*\(([^)]*)\)""".r.findFirstMatchIn(header)
        .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toVector)
        .getOrElse(Vector.empty)

      if (descr.endsWith("O")) {
        ObjectNpy(PickleReader.load(in))
      } else {
        val kind = descr.dropWhile("<>|=".contains(_))
        val count = if (shape.isEmpty) 1 else shape.product
        val itemsize = kind.tail.toInt
        val raw = new Array[Byte](count * itemsize)
        in.readFully(raw)
        val bb = ByteBuffer.wrap(raw).order(
          if (descr.startsWith(">")) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
        val out = new Array[Double](count)
        kind match {
          case "f8" => var i = 0; while (i < count) { out(i) = bb.getDouble(i * 8); i += 1 }
          case "f4" => var i = 0; while (i < count) { out(i) = bb.getFloat(i * 4); i += 1 }
          case "i8" => var i = 0; while (i < count) { out(i) = bb.getLong(i * 8).toDouble; i += 1 }
          case "i4" => var i = 0; while (i < count) { out(i) = bb.getInt(i * 4).toDouble; i += 1 }
          case other => sys.error(s"unsupported npy dtype $descr")
        }
        NumericNpy(shape, out)
      }
    } finally in.close()
  }
}
