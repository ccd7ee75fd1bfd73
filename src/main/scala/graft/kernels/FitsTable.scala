package graft.kernels

/** Minimal FITS BINTABLE reader — for the bundled 4LAC catalogs
  * (reference reads them with astropy at ztf/xmatch/utils.py:118-150).
  * Parses the first BINTABLE extension; supports column types A (char),
  * L, B, I, J, K, E, D with repeat counts (repeat>1 strings only).
  */
object FitsTable {

  final case class Column(name: String, form: String)
  final case class Table(columns: Seq[Column], rows: Seq[Map[String, Any]])

  def read(all: Array[Byte]): Option[Table] = {
    try {
      // walk HDUs: primary first
      var pos = 0
      def readHeader(start: Int): (Map[String, String], Int) = {
        var p = start
        val kv = scala.collection.mutable.Map.empty[String, String]
        var done = false
        while (!done && p + 80 <= all.length) {
          val card = new String(all, p, 80, "US-ASCII")
          val key = card.take(8).trim
          if (key == "END") done = true
          else if (card.length > 10 && card.charAt(8) == '=') {
            kv(key) = card.drop(10).takeWhile(_ != '/').trim
          }
          p += 80
        }
        (kv.toMap, ((p + 2879) / 2880) * 2880)
      }

      def dataLen(h: Map[String, String]): Int = {
        val naxis = h.getOrElse("NAXIS", "0").toInt
        if (naxis == 0) 0
        else (1 to naxis).map(i => h(s"NAXIS$i").toInt).product *
          (math.abs(h.getOrElse("BITPIX", "8").toInt) / 8)
      }

      val (h0, d0) = readHeader(pos)
      pos = d0 + ((dataLen(h0) + 2879) / 2880) * 2880

      var table: Option[Table] = None
      while (table.isEmpty && pos + 2880 <= all.length) {
        val (h, dstart) = readHeader(pos)
        val xt = h.getOrElse("XTENSION", "").replace("'", "").trim
        if (xt == "BINTABLE") {
          val rowBytes = h("NAXIS1").toInt
          val nRows = h("NAXIS2").toInt
          val nFields = h("TFIELDS").toInt
          val cols = (1 to nFields).map { i =>
            Column(
              h.getOrElse(s"TTYPE$i", s"col$i").replace("'", "").trim,
              h(s"TFORM$i").replace("'", "").trim)
          }
          val rows = (0 until nRows).map { r =>
            var off = dstart + r * rowBytes
            val m = scala.collection.mutable.Map.empty[String, Any]
            cols.foreach { c =>
              val (repeat, code) = splitForm(c.form)
              val buf = java.nio.ByteBuffer.wrap(all, off, rowBytes)
              val v: Any = code match {
                case 'A' =>
                  val s = new String(all, off, repeat, "US-ASCII").trim
                  off += repeat; s
                case 'L' => val b = all(off) == 'T'; off += repeat; b
                case 'B' => val x = all(off) & 0xff; off += repeat; x
                case 'I' => val x = buf.getShort(); off += 2 * repeat; x
                case 'J' => val x = buf.getInt(); off += 4 * repeat; x
                case 'K' => val x = buf.getLong(); off += 8 * repeat; x
                case 'E' => val x = buf.getFloat(); off += 4 * repeat; x
                case 'D' => val x = buf.getDouble(); off += 8 * repeat; x
                case _ => off += repeat; null
              }
              m(c.name) = v
            }
            m.toMap
          }
          table = Some(Table(cols, rows))
        } else {
          pos = dstart + ((dataLen(h) + 2879) / 2880) * 2880
        }
        if (table.isEmpty && xt == "BINTABLE") pos = all.length
      }
      table
    } catch { case _: Exception => None }
  }

  private def splitForm(form: String): (Int, Char) = {
    val digits = form.takeWhile(_.isDigit)
    val repeat = if (digits.isEmpty) 1 else digits.toInt
    (repeat, form.drop(digits.length).headOption.getOrElse('A'))
  }
}
