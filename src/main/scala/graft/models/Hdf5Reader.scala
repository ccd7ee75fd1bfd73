package graft.models

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal dependency-free HDF5 reader — just enough of the public HDF5
  * spec to open the `model.weights.h5` member that Keras writes inside a
  * `.keras` archive (used by the reference's bundled CATS classifier,
  * rubin/cats/processor.py:36-38: the SavedModel checkpoint it loads is
  * byte-identical to the serial `.keras` weights).
  *
  * Supported subset (all that h5py's default writer emits for these
  * files): superblock version 0, v1 object headers (with continuation
  * blocks), symbol-table groups (v1 B-tree + local heap + SNOD nodes),
  * little-endian float32 fixed-point-free datasets with contiguous
  * layout (class 1 / layout v3). Anything else fails loudly.
  */
object Hdf5Reader {

  /** A named float32 tensor: row-major data plus its shape. */
  final case class Tensor(shape: Array[Int], data: Array[Float]) {
    def numel: Int = shape.product
    /** 2-D accessor convenience: as Array[rows][cols]. */
    def matrix: Array[Array[Float]] = {
      require(shape.length == 2, s"matrix needs rank 2, got ${shape.toList}")
      Array.tabulate(shape(0), shape(1))((r, c) => data(r * shape(1) + c))
    }
    def vector: Array[Float] = { require(shape.length == 1); data }
  }

  /** Parse an in-memory HDF5 file; returns dataset path -> tensor, with
    * paths like "/layers/conv1d/vars/0".
    */
  def read(bytes: Array[Byte]): Map[String, Tensor] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 64 &&
      bytes(0) == 0x89.toByte && bytes(1) == 'H' && bytes(2) == 'D' &&
      bytes(3) == 'F', "not an HDF5 file")
    require(buf.get(8) == 0, s"superblock v${buf.get(8)} unsupported")
    require(buf.get(13) == 8 && buf.get(14) == 8, "need 8-byte offsets/lengths")
    // root symbol-table entry: link-name offset (8) then object header addr
    val rootHeader = buf.getLong(56 + 8)
    val out = Map.newBuilder[String, Tensor]
    walkGroup(buf, rootHeader, "", out)
    out.result()
  }

  // ---- object headers -------------------------------------------------

  /** v1 object header -> (messageType, bodyOffset, bodySize) triples. */
  private def messages(buf: ByteBuffer, addr: Long): Seq[(Int, Int, Int)] = {
    require(buf.get(addr.toInt) == 1, s"object header v${buf.get(addr.toInt)}")
    val nMsg = buf.getShort(addr.toInt + 2) & 0xFFFF
    val hdrSize = buf.getInt(addr.toInt + 8)
    val acc = Seq.newBuilder[(Int, Int, Int)]
    var found = 0
    // message data begins 16 bytes in (12-byte header padded to 8)
    var blocks = List((addr + 16, hdrSize.toLong))
    while (blocks.nonEmpty && found < nMsg) {
      val (start, size) = blocks.head
      blocks = blocks.tail
      var off = start
      val end = start + size
      while (off + 8 <= end && found < nMsg) {
        val mType = buf.getShort(off.toInt) & 0xFFFF
        val mSize = buf.getShort(off.toInt + 2) & 0xFFFF
        if (mType == 0x10) { // continuation block
          val cOff = buf.getLong(off.toInt + 8)
          val cLen = buf.getLong(off.toInt + 16)
          blocks = blocks :+ (cOff, cLen)
        } else {
          acc += ((mType, off.toInt + 8, mSize))
        }
        found += 1
        off += 8 + mSize
      }
    }
    acc.result()
  }

  // ---- groups ----------------------------------------------------------

  private def walkGroup(buf: ByteBuffer, headerAddr: Long, prefix: String,
      out: scala.collection.mutable.Builder[(String, Tensor), Map[String, Tensor]]): Unit = {
    val msgs = messages(buf, headerAddr)
    val symTab = msgs.find(_._1 == 0x11)
    symTab match {
      case Some((_, off, _)) =>
        val btree = buf.getLong(off)
        val heap = buf.getLong(off + 8)
        for ((name, child) <- btreeLinks(buf, btree, heap)) {
          val childMsgs = messages(buf, child)
          if (childMsgs.exists(_._1 == 0x11)) walkGroup(buf, child, s"$prefix/$name", out)
          else out += (s"$prefix/$name" -> dataset(buf, childMsgs))
        }
      case None => // leaf reached via walkGroup caller — shouldn't happen
    }
  }

  /** v1 group B-tree (node type 0) -> (linkName, childObjectHeader). */
  private def btreeLinks(buf: ByteBuffer, btree: Long, heap: Long): Seq[(String, Long)] = {
    require(sig(buf, btree) == "TREE", s"bad B-tree sig at $btree")
    val level = buf.get(btree.toInt + 5)
    val entries = buf.getShort(btree.toInt + 6) & 0xFFFF
    val acc = Seq.newBuilder[(String, Long)]
    var off = btree + 8 + 16 // skip left/right sibling pointers
    var i = 0
    while (i < entries) {
      off += 8 // key i
      val child = buf.getLong(off.toInt); off += 8
      if (level > 0) acc ++= btreeLinks(buf, child, heap)
      else acc ++= snodLinks(buf, child, heap)
      i += 1
    }
    acc.result()
  }

  private def snodLinks(buf: ByteBuffer, addr: Long, heap: Long): Seq[(String, Long)] = {
    require(sig(buf, addr) == "SNOD", s"bad SNOD sig at $addr")
    val nSym = buf.getShort(addr.toInt + 6) & 0xFFFF
    require(sig(buf, heap) == "HEAP", s"bad local heap sig at $heap")
    val heapData = buf.getLong(heap.toInt + 24)
    Seq.tabulate(nSym) { i =>
      val off = addr + 8 + 40L * i
      val nameOff = buf.getLong(off.toInt)
      val objHdr = buf.getLong(off.toInt + 8)
      (cString(buf, heapData + nameOff), objHdr)
    }
  }

  // ---- datasets ---------------------------------------------------------

  private def dataset(buf: ByteBuffer, msgs: Seq[(Int, Int, Int)]): Tensor = {
    var shape: Array[Int] = null
    var dataAddr = -1L
    for ((t, off, _) <- msgs) t match {
      case 0x01 => // dataspace
        val ver = buf.get(off)
        val rank = buf.get(off + 1)
        val dimsOff = if (ver == 1) off + 8 else off + 4
        shape = Array.tabulate(rank)(i => buf.getLong(dimsOff + 8 * i).toInt)
      case 0x03 => // datatype: require little-endian IEEE float32
        val cls = buf.get(off) & 0x0F
        val size = buf.getInt(off + 4)
        require(cls == 1 && size == 4, s"dtype class=$cls size=$size (want f32)")
      case 0x08 => // data layout v3
        require(buf.get(off) == 3, s"layout v${buf.get(off)}")
        require(buf.get(off + 1) == 1, s"layout class ${buf.get(off + 1)} (want contiguous)")
        dataAddr = buf.getLong(off + 2)
      case _ => ()
    }
    require(shape != null && dataAddr >= 0, "dataset missing dataspace/layout")
    val n = shape.product
    val data = new Array[Float](n)
    val fb = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    fb.position(dataAddr.toInt)
    fb.asFloatBuffer().get(data)
    Tensor(shape, data)
  }

  // ---- small helpers ----------------------------------------------------

  private def sig(buf: ByteBuffer, addr: Long): String =
    new String(Array(buf.get(addr.toInt), buf.get(addr.toInt + 1),
      buf.get(addr.toInt + 2), buf.get(addr.toInt + 3)), "ASCII")

  private def cString(buf: ByteBuffer, addr: Long): String = {
    val sb = new StringBuilder
    var i = addr.toInt
    while (buf.get(i) != 0) { sb.append(buf.get(i).toChar); i += 1 }
    sb.toString
  }
}
