package graft.models

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream, InputStream}
import scala.collection.mutable

/** Minimal Python pickle virtual machine, sufficient to read the
  * reference's bundled scikit-learn model files (plain pickles,
  * protocols 2-4) and joblib dumps (pickle + inline numpy array blocks;
  * joblib's NumpyArrayWrapper convention).
  *
  * Pickle is a public, documented stack language (CPython
  * Lib/pickletools.py holds the authoritative opcode list); numpy's
  * ndarray/dtype reconstruction protocol is likewise public. Nothing
  * here executes code: Python classes are materialized as inert
  * [[PyObject]] records whose state the caller navigates.
  *
  * Scope: the opcodes observed across the reference model files —
  * anything else raises with the opcode byte for fast diagnosis.
  */
object PickleReader {

  /** Generic unresolved Python object: class name + constructor args,
    * with `state` attached by BUILD (usually the __dict__).
    */
  final class PyObject(val cls: String, val args: Vector[Any]) {
    var state: Any = null

    /** Navigate the BUILD state as a string-keyed dict. */
    def field(name: String): Any = state match {
      case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
        m.getOrElse(name, sys.error(s"$cls has no field '$name'"))
      case other => sys.error(s"$cls state is not a dict: $other")
    }
    def fieldOpt(name: String): Option[Any] = state match {
      case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => m.get(name)
      case _ => None
    }
    override def toString: String = s"PyObject($cls)"
  }

  /** numpy dtype: enough structure for numeric, bool, unicode and
    * structured (record) types. Mutable because pickle BUILD sets state
    * in place on an already-memoized object (CPython __setstate__
    * semantics — other stream positions may alias this instance).
    */
  final class PyDtype(var kind: Char, var itemsize: Int) {
    var names: Vector[String] = Vector.empty
    var fields: Map[String, (PyDtype, Int)] = Map.empty
    def isStructured: Boolean = names.nonEmpty
    override def toString: String =
      if (isStructured) s"dtype(V$itemsize,${names.mkString(",")})" else s"dtype($kind$itemsize)"
  }

  /** numpy ndarray in raw little-endian bytes (or boxed objects for
    * dtype=object arrays).
    */
  final class NDArray(var shape: Vector[Int], var dtype: PyDtype,
      var data: Array[Byte], var objects: Vector[Any]) {
    def this() = this(Vector.empty, null, null, null)
    def size: Int = if (shape.isEmpty) 1 else shape.product

    private def bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)

    def doubles: Array[Double] = {
      require(dtype.kind == 'f' && dtype.itemsize == 8, s"not f8: $dtype")
      val out = new Array[Double](size)
      val b = bb
      var i = 0; while (i < out.length) { out(i) = b.getDouble(i * 8); i += 1 }
      out
    }
    def floats: Array[Float] = {
      require(dtype.kind == 'f' && dtype.itemsize == 4, s"not f4: $dtype")
      val out = new Array[Float](size)
      val b = bb
      var i = 0; while (i < out.length) { out(i) = b.getFloat(i * 4); i += 1 }
      out
    }
    def longs: Array[Long] = {
      require(dtype.kind == 'i' && dtype.itemsize == 8, s"not i8: $dtype")
      val out = new Array[Long](size)
      val b = bb
      var i = 0; while (i < out.length) { out(i) = b.getLong(i * 8); i += 1 }
      out
    }
    def bools: Array[Boolean] = {
      require(dtype.kind == 'b', s"not bool: $dtype")
      data.take(size).map(_ != 0)
    }
    /** '<U#' string array (UTF-32LE fixed-width). */
    def strings: Array[String] = {
      require(dtype.kind == 'U', s"not unicode: $dtype")
      val w = dtype.itemsize / 4
      Array.tabulate(size) { i =>
        val sb = new StringBuilder
        val b = bb
        var j = 0
        var done = false
        while (j < w && !done) {
          val cp = b.getInt((i * w + j) * 4)
          if (cp == 0) done = true else sb.appendAll(Character.toChars(cp))
          j += 1
        }
        sb.toString
      }
    }
    /** Structured-array column as longs (i8 field). */
    def fieldLongs(name: String): Array[Long] = {
      val (fd, off) = dtype.fields(name)
      require(fd.kind == 'i' && fd.itemsize == 8, s"field $name not i8: $fd")
      val out = new Array[Long](size)
      val b = bb
      var i = 0
      while (i < out.length) { out(i) = b.getLong(i * dtype.itemsize + off); i += 1 }
      out
    }
    /** Structured-array column as doubles (f8 field). */
    def fieldDoubles(name: String): Array[Double] = {
      val (fd, off) = dtype.fields(name)
      require(fd.kind == 'f' && fd.itemsize == 8, s"field $name not f8: $fd")
      val out = new Array[Double](size)
      val b = bb
      var i = 0
      while (i < out.length) { out(i) = b.getDouble(i * dtype.itemsize + off); i += 1 }
      out
    }
    /** Elements of an object array (stored unpickled). */
    def objectsOrDie: Vector[Any] = {
      require(objects != null, s"not an object array: $dtype")
      objects
    }
    override def toString: String =
      s"NDArray(shape=${shape.mkString("x")}, dtype=$dtype)"
  }

  private final class Counter { var n: Long = 0L }

  def load(path: String): Any = {
    val in = new DataInputStream(new BufferedInputStream(
      new FileInputStream(path), 1 << 16))
    try new Machine(in, new Counter).run() finally in.close()
  }

  def load(in: InputStream): Any =
    new Machine(new DataInputStream(in), new Counter).run()

  /** Load one pickle stream with a persistent-id resolver (the hook the
    * torch legacy format uses for tensor storages) from an already-open
    * stream; the stream is left positioned after the STOP opcode so
    * callers can read trailing data (torch writes raw storage blocks
    * there).
    */
  def loadWithPersistent(in: DataInputStream,
      persistentLoad: Any => Any): Any =
    new Machine(in, new Counter, persistentLoad).run()

  // ------------------------------------------------------------------

  private val MarkSentinel = new AnyRef { override def toString = "MARK" }

  /** A resolved GLOBAL/STACK_GLOBAL reference (module + qualified name).
    * Public so persistent-id hooks (e.g. the torch reader) can inspect
    * storage-type references.
    */
  final case class PyGlobal(module: String, name: String) {
    def full: String = s"$module.$name"
  }

  private final class Machine(in: DataInputStream, counter: Counter,
      persistentLoad: Any => Any = x =>
        sys.error(s"unexpected persistent id: $x")) {
    private def bytesRead: Long = counter.n
    private val stack = new mutable.ArrayBuffer[Any](256)
    private val memo = new mutable.HashMap[Int, Any]()
    private var memoCounter = 0

    private def pop(): Any = stack.remove(stack.length - 1)
    private def popN(n: Int): Vector[Any] = {
      val out = stack.slice(stack.length - n, stack.length).toVector
      stack.remove(stack.length - n, n)
      out
    }
    private def popToMark(): Vector[Any] = {
      val m = stack.lastIndexOf(MarkSentinel)
      require(m >= 0, s"no MARK on stack after $bytesRead bytes")
      val out = stack.slice(m + 1, stack.length).toVector
      stack.remove(m, stack.length - m)
      out
    }

    private def u1(): Int = { counter.n += 1; in.readUnsignedByte() }
    private def u2(): Int = u1() | (u1() << 8)
    private def i4(): Int = u1() | (u1() << 8) | (u1() << 16) | (u1() << 24)
    private def u8(): Long = {
      var x = 0L
      var i = 0
      while (i < 8) { x |= (u1().toLong << (8 * i)); i += 1 }
      x
    }
    private def bytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); in.readFully(b); counter.n += n; b
    }
    private def f8be(): Double = { counter.n += 8; in.readDouble() } // BINFLOAT is big-endian

    /** Newline-terminated latin-1 string (GLOBAL opcode operand). */
    private def line(): String = {
      val sb = new StringBuilder
      var c = u1()
      while (c != '\n') { sb.append(c.toChar); c = u1() }
      sb.toString
    }

    def run(): Any = {
      while (true) {
        val op = u1()
        (op: @annotation.switch) match {
          case 0x80 => u1() // PROTO
          case 0x95 => u8() // FRAME (length hint only)
          case '.' => return pop() // STOP

          case '(' => stack += MarkSentinel // MARK
          case 'N' => stack += null // NONE
          case 0x88 => stack += true // NEWTRUE
          case 0x89 => stack += false // NEWFALSE

          case 'J' => stack += i4().asInstanceOf[Any] // BININT (signed)
          case 'K' => stack += u1().asInstanceOf[Any] // BININT1
          case 'M' => stack += u2().asInstanceOf[Any] // BININT2
          case 0x8a => // LONG1
            val n = u1()
            val b = bytes(n)
            var x = 0L
            var i = 0
            while (i < n) { x |= (b(i) & 0xffL) << (8 * i); i += 1 }
            if (n > 0 && n < 8 && (b(n - 1) & 0x80) != 0) x -= (1L << (8 * n))
            stack += x.asInstanceOf[Any]
          case 'G' => stack += f8be().asInstanceOf[Any] // BINFLOAT

          case 'B' => stack += bytes(i4()) // BINBYTES
          case 0x8e => stack += bytes(u8().toInt) // BINBYTES8
          case 0x96 => stack += bytes(u8().toInt) // BYTEARRAY8
          case 'C' => stack += bytes(u1()) // SHORT_BINBYTES
          case 'X' => stack += new String(bytes(i4()), "UTF-8") // BINUNICODE
          case 0x8c => stack += new String(bytes(u1()), "UTF-8") // SHORT_BINUNICODE
          case 'T' => stack += new String(bytes(i4()), "ISO-8859-1") // BINSTRING
          case 'U' => stack += new String(bytes(u1()), "ISO-8859-1") // SHORT_BINSTRING

          case ')' => stack += Vector.empty[Any] // EMPTY_TUPLE
          case 0x85 => stack += Vector(pop()) // TUPLE1
          case 0x86 => { val b = pop(); val a = pop(); stack += Vector(a, b) } // TUPLE2
          case 0x87 => { val c = pop(); val b = pop(); val a = pop(); stack += Vector(a, b, c) } // TUPLE3
          case 't' => stack += popToMark() // TUPLE

          case ']' => stack += new mutable.ArrayBuffer[Any]() // EMPTY_LIST
          case 'l' => stack += mutable.ArrayBuffer.from(popToMark()) // LIST
          case 'a' => // APPEND
            val v = pop()
            stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] += v
          case 'e' => // APPENDS
            val items = popToMark()
            stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] ++= items

          case '}' => stack += new mutable.LinkedHashMap[Any, Any]() // EMPTY_DICT
          case 's' => // SETITEM
            val v = pop(); val k = pop()
            stack.last.asInstanceOf[mutable.LinkedHashMap[Any, Any]] += (k -> v)
          case 'u' => // SETITEMS
            val items = popToMark()
            val d = stack.last.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
            var i = 0
            while (i < items.length) { d += (items(i) -> items(i + 1)); i += 2 }

          case 'q' => memo(u1()) = stack.last // BINPUT
          case 'r' => memo(i4()) = stack.last // LONG_BINPUT
          case 0x94 => { memo(memoCounter) = stack.last; memoCounter += 1 } // MEMOIZE
          case 'h' => stack += memo(u1()) // BINGET
          case 'j' => stack += memo(i4()) // LONG_BINGET

          case 'c' => stack += PyGlobal(line(), line()) // GLOBAL
          case 'Q' => stack += persistentLoad(pop()) // BINPERSID
          case 0x93 => // STACK_GLOBAL
            val name = pop().asInstanceOf[String]
            val mod = pop().asInstanceOf[String]
            stack += PyGlobal(mod, name)

          case 'R' => // REDUCE
            val args = pop().asInstanceOf[Vector[Any]]
            val callable = pop()
            stack += reduce(callable, args)
          case 0x81 => // NEWOBJ
            val args = pop().asInstanceOf[Vector[Any]]
            val cls = pop()
            stack += newObj(cls, args)
          case 'b' => // BUILD
            val state = pop()
            val obj = pop()
            stack += build(obj, state)

          case other =>
            sys.error(f"unsupported pickle opcode 0x$other%02x ('${other.toChar}') after $bytesRead%d bytes")
        }
      }
      throw new EOFException("pickle ended without STOP")
    }

    // ---- object model ----

    private def newObj(cls: Any, args: Vector[Any]): Any = cls match {
      case g: PyGlobal => new PyObject(g.full, args)
      case other => sys.error(s"NEWOBJ on non-global $other")
    }

    private def reduce(callable: Any, args: Vector[Any]): Any = {
      val g = callable match {
        case g: PyGlobal => g
        case other => sys.error(s"REDUCE on non-global $other")
      }
      g.full match {
        // numpy.core.multiarray in old pickles, numpy._core in new
        case "numpy.core.multiarray._reconstruct" |
            "numpy._core.multiarray._reconstruct" =>
          new NDArray()
        case "numpy.dtype" =>
          // args: (descr, align, copy)
          simpleDtype(args(0).asInstanceOf[String])
        case "numpy.core.numeric._frombuffer" |
            "numpy._core.numeric._frombuffer" =>
          // args: (buffer, dtype, shape, order)
          val shape = args(2).asInstanceOf[Vector[Any]].map(anyToInt)
          new NDArray(shape, args(1).asInstanceOf[PyDtype],
            args(0).asInstanceOf[Array[Byte]], null)
        case "numpy.core.multiarray.scalar" | "numpy._core.multiarray.scalar" =>
          val dt = args(0).asInstanceOf[PyDtype]
          val raw = args(1).asInstanceOf[Array[Byte]]
          decodeScalar(dt, raw)
        case "collections.OrderedDict" =>
          val m = new mutable.LinkedHashMap[Any, Any]()
          if (args.nonEmpty) args(0) match {
            case items: mutable.ArrayBuffer[Any @unchecked] =>
              items.foreach { case pair: Vector[Any @unchecked] =>
                m += (pair(0) -> pair(1)) }
            case _ =>
          }
          m
        case "builtins.bytearray" =>
          if (args.isEmpty) Array.emptyByteArray else args(0)
        case "_codecs.encode" =>
          // protocol-2 numpy pickles ship raw bytes as a latin-1 string
          args(0).asInstanceOf[String].getBytes("ISO-8859-1")
        case _ =>
          new PyObject(g.full, args)
      }
    }

    private def simpleDtype(descr: String): PyDtype = {
      // strip byte-order prefix; all reference data is little-endian
      val core = if (descr.nonEmpty && "<>|=".contains(descr(0))) descr.tail else descr
      val kind = core(0)
      val size = if (core.length > 1) core.tail.toInt else 1
      kind match {
        case 'f' | 'i' | 'u' | 'b' | 'V' => new PyDtype(kind, if (kind == 'b') 1 else size)
        case 'U' => new PyDtype('U', size * 4)
        case 'O' => new PyDtype('O', 8)
        case other => sys.error(s"unsupported dtype '$descr'")
      }
    }

    private def decodeScalar(dt: PyDtype, raw: Array[Byte]): Any = {
      val b = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      dt.kind match {
        case 'f' => if (dt.itemsize == 8) b.getDouble else b.getFloat.toDouble
        case 'i' => if (dt.itemsize == 8) b.getLong
          else if (dt.itemsize == 4) b.getInt.toLong else b.getShort.toLong
        case 'u' => if (dt.itemsize == 8) b.getLong else b.getInt.toLong
        case 'b' => raw(0) != 0
        case other => sys.error(s"unsupported scalar dtype $dt")
      }
    }

    private def build(obj: Any, state: Any): Any = obj match {
      case nd: NDArray =>
        // ndarray.__setstate__: (version, shape, dtype, is_fortran, data)
        val st = state.asInstanceOf[Vector[Any]]
        nd.shape = st(1).asInstanceOf[Vector[Any]].map(anyToInt)
        nd.dtype = st(2).asInstanceOf[PyDtype]
        require(st(3) == false || st(3) == 0,
          "fortran-order arrays not supported")
        st(4) match {
          case raw: Array[Byte] => nd.data = raw
          case objs: mutable.ArrayBuffer[Any @unchecked] => nd.objects = objs.toVector
          case other => sys.error(s"ndarray data: $other")
        }
        nd
      case dt: PyDtype =>
        // dtype.__setstate__: (ver, byteorder, subarray, names, fields,
        //                      elsize, alignment, flags)
        val st = state.asInstanceOf[Vector[Any]]
        val names = st(3) match {
          case null => Vector.empty[String]
          case v: Vector[Any @unchecked] => v.map(_.asInstanceOf[String])
        }
        if (names.nonEmpty) {
          val rawFields = st(4).asInstanceOf[mutable.LinkedHashMap[Any, Any]]
          dt.kind = 'V'
          dt.itemsize = anyToInt(st(5))
          dt.names = names
          dt.fields = rawFields.map { case (k, v) =>
            val t = v.asInstanceOf[Vector[Any]]
            k.asInstanceOf[String] ->
              (t(0).asInstanceOf[PyDtype], anyToInt(t(1)))
          }.toMap
        }
        dt
      case po: PyObject =>
        po.state = state
        // joblib inlines the array block right after the wrapper's BUILD
        if (po.cls.endsWith("NumpyArrayWrapper")) readJoblibArray(po) else po
      case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
        // OrderedDict.__setstate__ carries an (empty) instance dict
        m
      case other => sys.error(s"BUILD on $other")
    }

    /** joblib.numpy_pickle.NumpyArrayWrapper: the wrapper's state gives
      * (shape, dtype, order); the raw array bytes follow in the stream,
      * preceded by a 1-byte-length padding block when the dump recorded
      * numpy_array_alignment_bytes.
      */
    private def readJoblibArray(po: PyObject): NDArray = {
      val shape = po.field("shape").asInstanceOf[Vector[Any]].map(anyToInt)
      val dt = po.field("dtype").asInstanceOf[PyDtype]
      val count = if (shape.isEmpty) 1 else shape.product
      if (dt.kind == 'O') {
        // object arrays are pickled inline as a nested stream
        val nested = new Machine(in, counter).run()
        val objs = nested match {
          case nd: NDArray => nd.objectsOrDie
          case b: mutable.ArrayBuffer[Any @unchecked] => b.toVector
          case v: Vector[Any @unchecked] => v
          case single => Vector(single)
        }
        new NDArray(shape, dt, null, objs)
      } else {
        // padding block precedes raw (mmap-able) array bytes only
        po.fieldOpt("numpy_array_alignment_bytes") match {
          case Some(n) if n != null && anyToInt(n) > 0 =>
            val padLen = u1()
            bytes(padLen)
          case _ =>
        }
        new NDArray(shape, dt, bytes(count * dt.itemsize), null)
      }
    }
  }

  private def anyToInt(x: Any): Int = x match {
    case i: Int => i
    case l: Long => l.toInt
    case other => sys.error(s"not an int: $other")
  }
}
