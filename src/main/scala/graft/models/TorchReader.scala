package graft.models

import java.io.{BufferedInputStream, DataInputStream, FileInputStream}
import scala.collection.mutable

import graft.models.PickleReader.PyObject

/** Reader for PyTorch's legacy (pre-zipfile) serialization format, which
  * the reference's bundled SuperNNova models use
  * (data/models/snn_models/STAR/model.pt):
  *
  *   magic-number pickle | protocol-version pickle | sys-info pickle |
  *   model pickle (tensors as persistent ids) | storage-keys pickle |
  *   per key: i64 element count + raw little-endian data
  *
  * The format is public (torch/serialization.py). Tensors materialize as
  * [[TorchReader.Tensor]]; the module graph stays the inert PyObject
  * graph, navigated by [[stateDict]].
  */
object TorchReader {

  /** Unresolved storage handle (persistent id target). */
  final class Storage(val key: String, val kind: Char, val itemsize: Int) {
    var data: Array[Byte] = null
  }

  /** A view over a storage: offset/size/stride in elements. */
  final case class Tensor(storage: Storage, offset: Long,
      size: Vector[Int], stride: Vector[Int]) {
    def numel: Int = if (size.isEmpty) 1 else size.product

    /** Row-major float data (handles arbitrary strides). */
    def floats: Array[Float] = {
      require(storage.kind == 'f' && storage.itemsize == 4,
        s"not a float32 tensor: ${storage.kind}${storage.itemsize}")
      val bb = java.nio.ByteBuffer.wrap(storage.data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Float](numel)
      val nd = size.length
      val idx = new Array[Int](nd)
      var k = 0
      while (k < out.length) {
        var off = offset
        var d = 0
        while (d < nd) { off += idx(d).toLong * stride(d); d += 1 }
        out(k) = bb.getFloat((off * 4).toInt)
        // increment the multi-index
        d = nd - 1
        var carry = true
        while (d >= 0 && carry) {
          idx(d) += 1
          if (idx(d) == size(d)) { idx(d) = 0; d -= 1 } else carry = false
        }
        k += 1
      }
      out
    }
  }

  private def storageKind(typeName: String): (Char, Int) = typeName match {
    case "FloatStorage" => ('f', 4)
    case "DoubleStorage" => ('f', 8)
    case "LongStorage" => ('i', 8)
    case "IntStorage" => ('i', 4)
    case other => sys.error(s"unsupported torch storage $other")
  }

  /** Load a .pt file in either serialization format. */
  def load(path: String): Any = {
    val head = new Array[Byte](2)
    val probe = new FileInputStream(path)
    try probe.read(head) finally probe.close()
    if (head(0) == 'P' && head(1) == 'K') loadZip(path) else loadLegacy(path)
  }

  /** New zipfile format: <root>/data.pkl + <root>/data/<key> storage
    * entries (torch._use_new_zipfile_serialization, the default since
    * torch 1.6) — the elasticc SNN bundles use it.
    */
  def loadZip(path: String): Any = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val entries = zf.entries().asScala.toSeq
      val pklEntry = entries.find(_.getName.endsWith("/data.pkl"))
        .getOrElse(sys.error(s"$path: no data.pkl"))
      val rootDir = pklEntry.getName.stripSuffix("data.pkl")
      def readAll(name: String): Array[Byte] = {
        val e = zf.getEntry(name)
        require(e != null, s"$path: missing $name")
        val in = zf.getInputStream(e)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        in.close()
        out.toByteArray
      }
      val cache = mutable.HashMap.empty[String, Storage]
      val persistent: Any => Any = {
        case v: Vector[Any @unchecked] if v.nonEmpty && v(0) == "storage" =>
          val typeName = v(1) match {
            case g: PickleReader.PyGlobal => g.name
            case po: PyObject => po.cls.split('.').last
            case other => other.toString.split('.').last
          }
          val key = v(2).toString
          cache.getOrElseUpdate(key, {
            val (kind, itemsize) = storageKind(typeName)
            val st = new Storage(key, kind, itemsize)
            st.data = readAll(s"${rootDir}data/$key")
            st
          })
        case other => sys.error(s"unknown persistent id $other")
      }
      val in = new DataInputStream(new java.io.ByteArrayInputStream(
        readAll(pklEntry.getName)))
      PickleReader.loadWithPersistent(in, persistent)
    } finally zf.close()
  }

  /** Legacy (pre-zipfile) format. */
  def loadLegacy(path: String): Any = {
    val in = new DataInputStream(new BufferedInputStream(
      new FileInputStream(path), 1 << 16))
    try {
      val storages = mutable.LinkedHashMap.empty[String, Storage]
      val persistent: Any => Any = {
        case v: Vector[Any @unchecked] if v.nonEmpty && v(0) == "storage" =>
          // ('storage', storage_type_global, key, location, numel[, view])
          val typeName = v(1) match {
            case g: PickleReader.PyGlobal => g.name
            case po: PyObject => po.cls.split('.').last
            case other => other.toString.split('.').last
          }
          val key = v(2).toString
          val (kind, itemsize) = storageKind(typeName)
          storages.getOrElseUpdate(key, new Storage(key, kind, itemsize))
        case other => sys.error(s"unknown persistent id $other")
      }
      PickleReader.loadWithPersistent(in, persistent) // magic number
      PickleReader.loadWithPersistent(in, persistent) // protocol version
      PickleReader.loadWithPersistent(in, persistent) // sys info
      val root = PickleReader.loadWithPersistent(in, persistent)
      val keyList = PickleReader.loadWithPersistent(in, persistent) match {
        case b: mutable.ArrayBuffer[Any @unchecked] => b.map(_.toString)
        case v: Vector[Any @unchecked] => v.map(_.toString)
        case other => sys.error(s"storage key list: $other")
      }
      for (key <- keyList) {
        val st = storages.getOrElse(key, sys.error(s"unreferenced storage $key"))
        var numel = 0L
        var i = 0
        while (i < 8) { numel |= (in.readUnsignedByte().toLong << (8 * i)); i += 1 }
        val buf = new Array[Byte]((numel * st.itemsize).toInt)
        in.readFully(buf)
        st.data = buf
      }
      root
    } finally in.close()
  }

  /** Resolve a pickled tensor/Parameter node to a [[Tensor]]:
    * torch._utils._rebuild_tensor_v2(storage, offset, size, stride, ...)
    * possibly wrapped in _rebuild_parameter(tensor, requires_grad, ...).
    */
  def toTensor(x: Any): Option[Tensor] = x match {
    case t: Tensor => Some(t)
    case po: PyObject if po.cls.endsWith("_rebuild_parameter") =>
      toTensor(po.args(0))
    case po: PyObject if po.cls.endsWith("_rebuild_tensor_v2") ||
        po.cls.endsWith("_rebuild_tensor") =>
      val st = po.args(0).asInstanceOf[Storage]
      def ints(a: Any): Vector[Int] = a match {
        case v: Vector[Any @unchecked] => v.map {
          case i: Int => i
          case l: Long => l.toInt
        }
        case _ => Vector.empty
      }
      val offset = po.args(1) match {
        case i: Int => i.toLong
        case l: Long => l
      }
      Some(Tensor(st, offset, ints(po.args(2)), ints(po.args(3))))
    case _ => None
  }

  /** Collect named parameters by walking _parameters / _modules of an
    * unpickled nn.Module graph (torch.save(model) form).
    */
  def stateDict(root: Any): Map[String, Tensor] = {
    val out = mutable.LinkedHashMap.empty[String, Tensor]
    def collect(map: Any, prefix: String): Unit = map match {
      case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
        m.foreach { case (name, v) =>
          toTensor(v).foreach(t => out(prefix + name.toString) = t) }
      case _ =>
    }
    def walk(obj: Any, prefix: String): Unit = obj match {
      case po: PyObject =>
        po.fieldOpt("_parameters").foreach(collect(_, prefix))
        po.fieldOpt("_buffers").foreach(collect(_, prefix))
        po.fieldOpt("_modules").foreach {
          case mods: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
            mods.foreach { case (name, sub) => walk(sub, s"$prefix$name.") }
          case _ =>
        }
      case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
        // a plain state_dict
        m.foreach { case (name, v) =>
          toTensor(v).foreach(t => out(prefix + name.toString) = t) }
      case _ =>
    }
    walk(root, "")
    out.toMap
  }
}
