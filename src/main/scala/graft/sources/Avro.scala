package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Hand-rolled Avro object-container-file IO (SURVEY.md §2.1 — the
  * reference's test harness reads alert Avro; the spark-avro package is
  * not on this classpath, and both the container layout and the binary
  * encoding are an open spec: avro.apache.org/docs/current/spec.html).
  *
  * Container: magic "Obj\\x01", a metadata map carrying avro.schema
  * (JSON) and avro.codec, a 16-byte sync marker, then blocks of
  * (row count, byte size, payload, sync). Codecs: null, deflate
  * (raw, nowrap), snappy (+BE CRC32), zstandard (plain frames).
  * Binary encoding: zigzag varints, length-prefixed
  * bytes/strings, little-endian float/double, records in field order,
  * unions as branch index + value, arrays/maps in counted blocks.
  *
  * Scale path: [[AvroReader.read]] parallelizes per FILE via
  * binaryFiles — the natural unit for alert archives (many
  * medium-sized files). [[AvroReader.readSplit]] additionally splits
  * INSIDE each file by byte range (each task seeks to its range and
  * scans forward to the next sync marker, the Hadoop input-format
  * contract), so a few multi-GB containers parallelize too.
  */
object AvroSchema {

  sealed trait Type
  case object ANull extends Type
  case object ABool extends Type
  case object AInt extends Type
  case object ALong extends Type
  case object AFloat extends Type
  case object ADouble extends Type
  case object ABytes extends Type
  case object AString extends Type
  /** enum symbols decode to their string names */
  final case class AEnum(symbols: Vector[String]) extends Type
  final case class AFixed(size: Int) extends Type
  final case class AArray(items: Type) extends Type
  final case class AMap(values: Type) extends Type
  final case class AUnion(branches: Vector[Type]) extends Type
  final case class AField(name: String, tpe: Type)
  final case class ARecord(name: String, fields: Vector[AField]) extends Type

  /** Parse an Avro schema JSON document. Named-type references resolve
    * against previously-defined records/enums/fixeds (full and simple
    * names).
    */
  def parse(json: String): Type = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val names = mutable.Map[String, Type]()
    parseNode(mapper.readTree(json), names, "")
  }

  private def parseNode(n: com.fasterxml.jackson.databind.JsonNode,
      names: mutable.Map[String, Type], ns: String): Type = {
    if (n.isTextual) {
      n.asText match {
        case "null" => ANull
        case "boolean" => ABool
        case "int" => AInt
        case "long" => ALong
        case "float" => AFloat
        case "double" => ADouble
        case "bytes" => ABytes
        case "string" => AString
        case ref => names.getOrElse(ref,
          names.getOrElse(s"$ns.$ref", sys.error(s"avro: unknown type '$ref'")))
      }
    } else if (n.isArray) {
      AUnion((0 until n.size).map(i => parseNode(n.get(i), names, ns)).toVector)
    } else {
      n.get("type").asText match {
        case "record" | "error" =>
          val name = n.get("name").asText
          val space = if (n.has("namespace")) n.get("namespace").asText else ns
          val full = if (space.nonEmpty && !name.contains('.')) s"$space.$name" else name
          val fieldsNode = n.get("fields")
          val fields = Vector.newBuilder[AField]
          // pre-register for recursive references
          val rec = ARecord(full, Vector.empty)
          names(full) = rec; names(name) = rec
          (0 until fieldsNode.size).foreach { i =>
            val f = fieldsNode.get(i)
            fields += AField(f.get("name").asText,
              parseNode(f.get("type"), names, space))
          }
          val done = ARecord(full, fields.result())
          names(full) = done; names(name) = done
          done
        case "enum" =>
          val syms = n.get("symbols")
          val e = AEnum((0 until syms.size).map(syms.get(_).asText).toVector)
          names(n.get("name").asText) = e
          e
        case "fixed" =>
          val f = AFixed(n.get("size").asInt)
          names(n.get("name").asText) = f
          f
        case "array" => AArray(parseNode(n.get("items"), names, ns))
        case "map" => AMap(parseNode(n.get("values"), names, ns))
        case prim => parseNode(
          new com.fasterxml.jackson.databind.node.TextNode(prim), names, ns)
      }
    }
  }

  /** Spark type for an Avro type; unions must be null + one branch. */
  def sparkType(t: Type): (DataType, Boolean) = t match {
    case ANull => (NullType, true)
    case ABool => (BooleanType, false)
    case AInt => (IntegerType, false)
    case ALong => (LongType, false)
    case AFloat => (FloatType, false)
    case ADouble => (DoubleType, false)
    case ABytes | AFixed(_) => (BinaryType, false)
    case AString | AEnum(_) => (StringType, false)
    case AArray(items) =>
      val (dt, n) = sparkType(items)
      (ArrayType(dt, containsNull = n), false)
    case AMap(values) =>
      val (dt, n) = sparkType(values)
      (MapType(StringType, dt, valueContainsNull = n), false)
    case ARecord(_, fields) =>
      (StructType(fields.map { f =>
        val (dt, n) = sparkType(f.tpe)
        StructField(f.name, dt, nullable = n)
      }), false)
    case AUnion(branches) =>
      val nonNull = branches.filter(_ != ANull)
      require(nonNull.length == 1,
        s"avro: only null-unions are supported, got $branches")
      (sparkType(nonNull.head)._1, true)
  }
}

/** Streaming binary decoder over one byte array. */
final class AvroDecoder(buf: Array[Byte], var pos: Int) {
  import AvroSchema._

  def varLong(): Long = {
    var b = buf(pos) & 0xff; pos += 1
    var n = (b & 0x7fL)
    var shift = 7
    while ((b & 0x80) != 0) {
      b = buf(pos) & 0xff; pos += 1
      n |= (b & 0x7fL) << shift
      shift += 7
    }
    (n >>> 1) ^ -(n & 1) // zigzag
  }

  def readBytes(n: Int): Array[Byte] = {
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
    pos += n
    out
  }

  def string(): String = {
    val n = varLong().toInt
    val s = new String(buf, pos, n, StandardCharsets.UTF_8)
    pos += n
    s
  }

  /** Decode one value of `t` into Spark-facing objects (Row for
    * records, Seq for arrays, Map for maps).
    */
  def value(t: Type): Any = t match {
    case ANull => null
    case ABool => { val v = buf(pos) != 0; pos += 1; v }
    case AInt => varLong().toInt
    case ALong => varLong()
    case AFloat =>
      val v = java.lang.Float.intBitsToFloat(
        (buf(pos) & 0xff) | (buf(pos + 1) & 0xff) << 8 |
          (buf(pos + 2) & 0xff) << 16 | (buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    case ADouble =>
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    case ABytes => readBytes(varLong().toInt)
    case AFixed(n) => readBytes(n)
    case AString => string()
    case AEnum(symbols) => symbols(varLong().toInt)
    case AArray(items) =>
      val out = Vector.newBuilder[Any]
      var count = varLong()
      while (count != 0) {
        if (count < 0) { varLong(); count = -count } // block byte size hint
        var i = 0L
        while (i < count) { out += value(items); i += 1 }
        count = varLong()
      }
      out.result()
    case AMap(values) =>
      val out = Map.newBuilder[String, Any]
      var count = varLong()
      while (count != 0) {
        if (count < 0) { varLong(); count = -count }
        var i = 0L
        while (i < count) { out += (string() -> value(values)); i += 1 }
        count = varLong()
      }
      out.result()
    case AUnion(branches) => value(branches(varLong().toInt))
    case ARecord(_, fields) =>
      Row.fromSeq(fields.map(f => value(f.tpe)))
  }
}

object AvroReader {
  import AvroSchema._

  final case class Container(schema: Type, codec: String,
      sync: Array[Byte], blocksStart: Int, bytes: Array[Byte]) {
    /** Decode one block payload per the container codec. */
    def inflate(payload: Array[Byte], size: Int): Array[Byte] = codec match {
      case "null" | "" => payload
      case "deflate" =>
        val inf = new Inflater(true)
        inf.setInput(payload)
        val out = new ByteArrayOutputStream(size * 4)
        val tmp = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(tmp)
          if (n == 0 && inf.needsInput()) sys.error("avro: truncated deflate block")
          out.write(tmp, 0, n)
        }
        inf.end()
        out.toByteArray
      // snappy (spark-avro's DEFAULT write codec, so most Avro archives
      // other Spark jobs produce use it): raw-snappy block + 4-byte
      // big-endian CRC32 of the UNCOMPRESSED data (Avro spec 1.12
      // "Required Codecs"). snappy-java ships with Spark itself
      // (/opt/spark/jars), so this adds no dependency beyond the
      // runtime every deployment already has.
      case "snappy" =>
        require(size >= 4, "avro: snappy block shorter than its checksum")
        val data = org.xerial.snappy.Snappy.uncompress(
          java.util.Arrays.copyOfRange(payload, 0, size - 4))
        val crc = new java.util.zip.CRC32
        crc.update(data)
        val want = ((payload(size - 4) & 0xffL) << 24) |
          ((payload(size - 3) & 0xffL) << 16) |
          ((payload(size - 2) & 0xffL) << 8) | (payload(size - 1) & 0xffL)
        require(crc.getValue == want,
          "avro: snappy block CRC mismatch (corrupt block)")
        data
      // zstandard (Avro 1.12 optional codec; the other codec modern
      // Spark lakes commonly write): each block is one zstd frame, NO
      // trailing checksum — unlike snappy. Stream-decode rather than a
      // one-shot size probe: frames from stream encoders (avro-java's
      // own ZstandardCodec wraps zstd-jni streams) omit the content
      // size from the frame header, so only a streaming decoder covers
      // both encoder families. zstd-jni ships in /opt/spark/jars.
      case "zstandard" =>
        val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
          new java.io.ByteArrayInputStream(payload, 0, size))
        try {
          val out = new ByteArrayOutputStream(size * 4)
          val tmp = new Array[Byte](8192)
          var n = in.read(tmp)
          while (n >= 0) { out.write(tmp, 0, n); n = in.read(tmp) }
          out.toByteArray
        } finally in.close()
      case other => sys.error(s"avro: unsupported codec '$other'")
    }
    def rows: Iterator[Row] = new Iterator[Row] {
      private var pos = blocksStart
      private var inBlock: AvroDecoder = null
      private var remaining = 0L
      private def advance(): Unit = {
        while (remaining == 0 && pos < bytes.length) {
          val d = new AvroDecoder(bytes, pos)
          val count = d.varLong()
          val size = d.varLong().toInt
          val payload = d.readBytes(size)
          val data = inflate(payload, size)
          pos = d.pos + 16 // skip sync
          inBlock = new AvroDecoder(data, 0)
          remaining = count
        }
      }
      def hasNext: Boolean = { advance(); remaining > 0 }
      def next(): Row = {
        advance()
        remaining -= 1
        inBlock.value(schema).asInstanceOf[Row]
      }
    }
  }

  /** Parse one container file held in memory. */
  def container(bytes: Array[Byte]): Container = {
    require(bytes.length > 4 && bytes(0) == 'O' && bytes(1) == 'b' &&
      bytes(2) == 'j' && bytes(3) == 1, "not an avro container file")
    val d = new AvroDecoder(bytes, 4)
    var schemaJson: String = null
    var codec = "null"
    var count = d.varLong()
    while (count != 0) {
      if (count < 0) { d.varLong(); count = -count }
      var i = 0L
      while (i < count) {
        val k = d.string()
        val v = d.readBytes(d.varLong().toInt)
        k match {
          case "avro.schema" => schemaJson = new String(v, StandardCharsets.UTF_8)
          case "avro.codec" => codec = new String(v, StandardCharsets.UTF_8)
          case _ =>
        }
        i += 1
      }
      count = d.varLong()
    }
    val sync = d.readBytes(16)
    Container(AvroSchema.parse(schemaJson), codec, sync, d.pos, bytes)
  }

  /** Read an Avro container file (or a directory/glob of them) into a
    * DataFrame — one task per file via binaryFiles. Every container must
    * carry the same schema as the first file (schema-evolved
    * directories fail fast with the offending path rather than decoding
    * rows inconsistent with the declared DataFrame schema).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.sparkContext.binaryFiles(path)
    val head =
      try files.take(1).headOption
      catch { // absent parent dir: normalize to the same no-match error
        case _: org.apache.hadoop.mapreduce.lib.input.InvalidInputException |
            _: org.apache.hadoop.mapred.InvalidInputException => None
      }
    val (firstPath, firstContent) = head.getOrElse(
      sys.error(s"avro: no files match '$path'"))
    val first = container(firstContent.toArray())
    val firstSchema = first.schema
    val schema = AvroSchema.sparkType(first.schema)._1.asInstanceOf[StructType]
    val rows = files.flatMap { case (p, content) =>
      val c = container(content.toArray())
      if (c.schema != firstSchema)
        sys.error(s"avro: schema of '$p' differs from '$firstPath'; " +
          "schema evolution across a directory is not supported")
      c.rows
    }
    spark.createDataFrame(rows, schema)
  }

  /** Byte-range split of one container file: `[start, end)` plus the
    * file length. A task decodes every block whose first byte lies in
    * the range, locating the first block by scanning forward from
    * `start` to the next 16-byte sync marker — the same contract Hadoop
    * input formats use, so one multi-GB container parallelizes without
    * any driver-side block index.
    */
  final case class Split(path: String, start: Long, end: Long, fileLen: Long)

  /** Read Avro container file(s) with block-level parallelism INSIDE
    * each file: files are cut into `maxSplitBytes` byte ranges
    * distributed as one task each. Complements [[read]] (per-file
    * tasks) when the input is a few huge containers rather than an
    * alert archive of many medium files.
    */
  def readSplit(spark: SparkSession, path: String,
      maxSplitBytes: Long = 128L << 20): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val hp = new HPath(path)
    val fs = hp.getFileSystem(conf.value)
    val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
    val statuses = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
      else Seq(st)
    }.filter(st => !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith("."))
    if (statuses.isEmpty) sys.error(s"avro: no files match '$path'")

    // schema comes from the first file's header (tasks re-check theirs)
    val firstPath = statuses.head.getPath
    val firstHeader = {
      val in = fs.open(firstPath)
      try container(readPrefix(in, statuses.head.getLen))
      finally in.close()
    }
    val firstSchema = firstHeader.schema
    val firstPathStr = firstPath.toString
    val schema = AvroSchema.sparkType(firstSchema)._1.asInstanceOf[StructType]

    val splits = statuses.flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
      (0L until n).map(i => Split(st.getPath.toString, i * maxSplitBytes,
        math.min((i + 1) * maxSplitBytes, len), len))
    }
    val rows = spark.sparkContext
      .parallelize(splits, splits.length)
      .flatMap { sp =>
        val p = new HPath(sp.path)
        val sfs = p.getFileSystem(conf.value)
        val in = sfs.open(p)
        val c = container(readPrefix(in, sp.fileLen))
        if (c.schema != firstSchema) {
          in.close()
          sys.error(s"avro: schema of '${sp.path}' differs from " +
            s"'$firstPathStr'; schema evolution across a directory is " +
            "not supported")
        }
        splitRows(in, c, sp)
      }
    spark.createDataFrame(rows, schema)
  }

  /** Read enough of the stream to parse the container header (the
    * schema JSON can be large, so grow the prefix until parsing fits).
    */
  private def readPrefix(in: org.apache.hadoop.fs.FSDataInputStream,
      fileLen: Long): Array[Byte] = {
    var size = math.min(fileLen, 1L << 16).toInt
    while (true) {
      in.seek(0L)
      val buf = new Array[Byte](size)
      in.readFully(0L, buf)
      try {
        container(buf)
        return buf
      } catch {
        case _: IndexOutOfBoundsException | _: ArrayIndexOutOfBoundsException =>
          if (size >= fileLen) throw new RuntimeException(
            "avro: truncated container header")
          size = math.min(fileLen, size.toLong * 4).toInt
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Decode the blocks of `sp`'s byte range, closing `in` when done. */
  private def splitRows(in: org.apache.hadoop.fs.FSDataInputStream,
      c: Container, sp: Split): Iterator[Row] = {
    // first block at/after start: the header's blocksStart for the
    // leading split, else just past the next sync marker
    // Ownership rule (the one Avro's own DataFileReader uses): a split
    // owns exactly the blocks whose PRECEDING sync marker starts inside
    // [start, end). With p = block start = sync start + 16, that is
    // p in [start+16, end+16) — so the decode loop runs to end+16, not
    // end, and a block whose sync straddles the boundary belongs to the
    // left split (which reads past its range end to finish the block,
    // like any record-aligned split format). Without the +16, a block
    // starting within 16 bytes at/after a boundary is read by NEITHER
    // side and silently vanishes.
    // The shortcut applies only when the header's trailing sync STARTS
    // inside this split (sync start = blocksStart - 16). A boundary in
    // (blocksStart-16, blocksStart] would otherwise let both adjacent
    // splits claim begin = blocksStart and double-read the first block;
    // the right split must syncScan and land on block 2 instead.
    val begin =
      if (sp.start <= c.blocksStart - 16) c.blocksStart.toLong
      else syncScan(in, c.sync, sp.start, sp.fileLen)
    if (begin < 0 || begin >= sp.end + 16 || begin >= sp.fileLen) {
      in.close()
      return Iterator.empty
    }
    new Iterator[Row] {
      private var pos = begin
      private var block: AvroDecoder = null
      private var remaining = 0L
      private var closed = false
      private def advance(): Unit = {
        while (remaining == 0 && pos < sp.end + 16 && pos < sp.fileLen && !closed) {
          // block header: two varints (<=10 bytes each)
          val hdr = new Array[Byte](math.min(20L, sp.fileLen - pos).toInt)
          in.readFully(pos, hdr)
          val d = new AvroDecoder(hdr, 0)
          val count = d.varLong()
          val size = d.varLong().toInt
          val payload = new Array[Byte](size)
          in.readFully(pos + d.pos, payload)
          pos += d.pos + size + 16 // skip trailing sync
          block = new AvroDecoder(c.inflate(payload, size), 0)
          remaining = count
        }
        if (remaining == 0 && !closed) { closed = true; in.close() }
      }
      def hasNext: Boolean = { advance(); remaining > 0 }
      def next(): Row = {
        advance()
        remaining -= 1
        block.value(c.schema).asInstanceOf[Row]
      }
    }
  }

  /** Offset just past the first sync marker at/after `from`; -1 when
    * none remains. Chunked forward scan with a 15-byte overlap so a
    * marker spanning two chunks is still found.
    */
  private def syncScan(in: org.apache.hadoop.fs.FSDataInputStream,
      sync: Array[Byte], from: Long, fileLen: Long): Long = {
    val chunk = 1 << 16
    var base = from
    while (base < fileLen) {
      val len = math.min(chunk.toLong, fileLen - base).toInt
      val buf = new Array[Byte](len)
      in.readFully(base, buf)
      var i = 0
      while (i + 16 <= len) {
        var j = 0
        while (j < 16 && buf(i + j) == sync(j)) j += 1
        if (j == 16) return base + i + 16
        i += 1
      }
      if (base + len >= fileLen) return -1L
      base += len - 15 // overlap so boundary-spanning markers match
    }
    -1L
  }
}

/** Minimal container writer (null, deflate, snappy or zstandard
  * codec) — enough to round-trip DataFrames through the reader,
  * interoperate with spark-avro (whose default write codec is snappy),
  * and emit alert-shaped test files. Distributed writes go one
  * container per partition.
  */
object AvroWriter {
  import AvroSchema._

  final class Encoder(out: ByteArrayOutputStream) {
    def varLong(v: Long): Unit = {
      var n = (v << 1) ^ (v >> 63) // zigzag
      while ((n & ~0x7fL) != 0) {
        out.write(((n & 0x7f) | 0x80).toInt)
        n >>>= 7
      }
      out.write(n.toInt)
    }
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def string(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      varLong(b.length)
      bytes(b)
    }
    def value(t: Type, v: Any): Unit = (t, v) match {
      case (ANull, _) =>
      case (ABool, b: Boolean) => out.write(if (b) 1 else 0)
      case (AInt, i: Int) => varLong(i.toLong)
      case (ALong, l: Long) => varLong(l)
      case (AFloat, f: Float) =>
        val bits = java.lang.Float.floatToIntBits(f)
        (0 until 4).foreach(i => out.write((bits >>> (8 * i)) & 0xff))
      case (ADouble, d: Double) =>
        val bits = java.lang.Double.doubleToLongBits(d)
        (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xff).toInt))
      case (ABytes, b: Array[Byte]) => varLong(b.length); bytes(b)
      case (AFixed(n), b: Array[Byte]) =>
        require(b.length == n, s"fixed($n) got ${b.length}")
        bytes(b)
      case (AString, s: String) => string(s)
      case (AEnum(symbols), s: String) => varLong(symbols.indexOf(s).toLong)
      case (AArray(items), xs: scala.collection.Seq[Any @unchecked]) =>
        if (xs.nonEmpty) { varLong(xs.length.toLong); xs.foreach(value(items, _)) }
        varLong(0)
      case (AMap(values), m: scala.collection.Map[String @unchecked, Any @unchecked]) =>
        if (m.nonEmpty) {
          varLong(m.size.toLong)
          m.foreach { case (k, x) => string(k); value(values, x) }
        }
        varLong(0)
      case (AUnion(branches), x) =>
        if (x == null) {
          val i = branches.indexOf(ANull)
          require(i >= 0, "null for non-nullable union")
          varLong(i.toLong)
        } else {
          val i = branches.indexWhere(_ != ANull)
          varLong(i.toLong)
          value(branches(i), x)
        }
      case (ARecord(_, fields), r: Row) =>
        fields.zipWithIndex.foreach { case (f, i) => value(f.tpe, r.get(i)) }
      case (tt, x) => sys.error(s"avro: cannot encode ${if (x == null) "null" else x.getClass} as $tt")
    }
  }

  /** Avro schema for a Spark struct (fields become null-unions when
    * nullable; the inverse of AvroSchema.sparkType).
    */
  def schemaFor(st: StructType, name: String = "topLevelRecord"): ARecord =
    ARecord(name, st.fields.map { f =>
      val t = typeFor(f.dataType, f.name)
      AField(f.name, if (f.nullable) AUnion(Vector(ANull, t)) else t)
    }.toVector)

  private def typeFor(dt: DataType, name: String): Type = dt match {
    case BooleanType => ABool
    case IntegerType | ShortType | ByteType => AInt
    case LongType => ALong
    case FloatType => AFloat
    case DoubleType => ADouble
    case BinaryType => ABytes
    case StringType => AString
    case ArrayType(et, n) =>
      val inner = typeFor(et, name)
      AArray(if (n) AUnion(Vector(ANull, inner)) else inner)
    case MapType(StringType, vt, n) =>
      val inner = typeFor(vt, name)
      AMap(if (n) AUnion(Vector(ANull, inner)) else inner)
    case st: StructType => schemaFor(st, name + "_rec")
    case other => sys.error(s"avro: unsupported spark type $other")
  }

  private def schemaJson(t: Type): String = t match {
    case ANull => "\"null\""
    case ABool => "\"boolean\""
    case AInt => "\"int\""
    case ALong => "\"long\""
    case AFloat => "\"float\""
    case ADouble => "\"double\""
    case ABytes => "\"bytes\""
    case AString => "\"string\""
    case AEnum(symbols) =>
      s"""{"type":"enum","name":"e","symbols":[${symbols.map("\"" + _ + "\"").mkString(",")}]}"""
    case AFixed(n) => s"""{"type":"fixed","name":"f","size":$n}"""
    case AArray(items) => s"""{"type":"array","items":${schemaJson(items)}}"""
    case AMap(values) => s"""{"type":"map","values":${schemaJson(values)}}"""
    case AUnion(branches) => branches.map(schemaJson).mkString("[", ",", "]")
    case ARecord(name, fields) =>
      val fs = fields.map(f =>
        s"""{"name":"${f.name}","type":${schemaJson(f.tpe)}}""").mkString(",")
      s"""{"type":"record","name":"${name.replace('.', '_')}","fields":[$fs]}"""
  }

  /** Write rows as one container file. */
  def write(path: String, schema: ARecord, rows: Iterator[Row],
      codec: String = "deflate", blockRows: Int = 1024): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      out.write(Array[Byte]('O', 'b', 'j', 1))
      val header = new ByteArrayOutputStream()
      val he = new Encoder(header)
      he.varLong(2L)
      he.string("avro.schema")
      val sj = schemaJson(schema).getBytes(StandardCharsets.UTF_8)
      he.varLong(sj.length.toLong); he.bytes(sj)
      he.string("avro.codec")
      val cj = codec.getBytes(StandardCharsets.UTF_8)
      he.varLong(cj.length.toLong); he.bytes(cj)
      he.varLong(0L)
      out.write(header.toByteArray)
      // per-file RANDOM sync marker, as the spec requires: the split
      // reader locates block boundaries by scanning raw bytes for this
      // 16-byte pattern, so a fixed marker would let payload data that
      // happens to contain it masquerade as a boundary (probability
      // 2^-128 per position only if the marker is unpredictable)
      val sync = new Array[Byte](16)
      new java.security.SecureRandom().nextBytes(sync)
      out.write(sync)
      rows.grouped(blockRows).foreach { block =>
        val raw = new ByteArrayOutputStream()
        val enc = new Encoder(raw)
        block.foreach(r => enc.value(schema, r))
        val payload = codec match {
          case "null" => raw.toByteArray
          case "deflate" =>
            val def_ = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
            def_.setInput(raw.toByteArray)
            def_.finish()
            val o = new ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            while (!def_.finished()) o.write(tmp, 0, def_.deflate(tmp))
            def_.end()
            o.toByteArray
          case "snappy" => // raw snappy + big-endian CRC32 of the raw data
            val data = raw.toByteArray
            val comp = org.xerial.snappy.Snappy.compress(data)
            val crc = new java.util.zip.CRC32
            crc.update(data)
            val o = new ByteArrayOutputStream(comp.length + 4)
            o.write(comp, 0, comp.length)
            val c = crc.getValue
            o.write((c >>> 24).toInt & 0xff); o.write((c >>> 16).toInt & 0xff)
            o.write((c >>> 8).toInt & 0xff); o.write(c.toInt & 0xff)
            o.toByteArray
          case "zstandard" => // one zstd frame per block, no checksum;
            // level 3 = avro-java's ZstandardCodec default, stream API
            // so the frame shape matches what reference readers expect
            val o = new ByteArrayOutputStream()
            val z = new com.github.luben.zstd.ZstdOutputStreamNoFinalizer(o, 3)
            try z.write(raw.toByteArray) finally z.close()
            o.toByteArray
          case other => sys.error(s"avro: unsupported codec '$other'")
        }
        val bh = new ByteArrayOutputStream()
        val be = new Encoder(bh)
        be.varLong(block.length.toLong)
        be.varLong(payload.length.toLong)
        out.write(bh.toByteArray)
        out.write(payload)
        out.write(sync)
      }
    } finally out.close()
  }

  /** Write a DataFrame as one container per partition under `dir`.
    * `dir` is resolved on each executor — correct for local mode and
    * shared filesystems (NFS, fuse-mounted object stores); an
    * HDFS/object-store committer would replace the FileOutputStream,
    * not the encoding.
    *
    * Task-commit protocol: stale `part-*.avro` files from a previous
    * run are removed up front (they would survive a run with fewer
    * partitions and be re-read by the glob), each task writes to a
    * temp name carrying its task attempt id, and the finished file is
    * atomically renamed into place — a retried or speculative attempt
    * can never interleave bytes with a concurrent writer, and whichever
    * attempt renames last wins whole-file.
    */
  def writeDataFrame(df: DataFrame, dir: String, codec: String = "deflate"): Unit = {
    val schema = schemaFor(df.schema)
    val d = new java.io.File(dir)
    d.mkdirs()
    val stale = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") &&
        (f.getName.endsWith(".avro") || f.getName.contains(".avro.tmp-")))
    stale.foreach(_.delete())
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val tmp = java.nio.file.Paths.get(dir,
          s"part-$pid.avro.tmp-${tc.taskAttemptId()}")
        write(tmp.toString, schema, it, codec)
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get(dir, s"part-$pid.avro"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
  }
}
