package graft.streaming

import java.nio.ByteBuffer

/** Versioned binary envelope for streaming state (VERDICT r7 #6 /
  * r9 #6).
  *
  * A `flatMapGroupsWithState` state case class is an ON-DISK format:
  * its Catalyst encoder schema is frozen into every checkpoint, and
  * Spark's state-schema compatibility check rejects a restart whose
  * state type gained, lost, or retyped a field (the r6→r7 `lastSeenMs`
  * addition demonstrated this — see the state-schema note on
  * [[StreamingOps.streamingDedup]]). Appending a "version field" to
  * the case class would not help: the field itself is a schema change,
  * and the NEXT field would break again.
  *
  * The envelope fixes the encoder schema once and for all: state is a
  * single `Array[Byte]` column (BinaryType — one schema forever), and
  * the VALUE carries its own version tag as the first byte. Evolving a
  * state then means bumping the write version and teaching the decoder
  * the new layout while it keeps reading every older one — the exact
  * upgrade path a deployment needs (new build restarts from an
  * old-build checkpoint, decodes v_old state, writes v_new). The
  * migration COST is paid exactly once, here: switching the existing
  * struct-typed states to the envelope is itself a state-schema break,
  * done now while no deployment holds checkpoints.
  *
  * Decoders fail LOUDLY on an unknown version ([[StateVersionException]]
  * names the state, the found tag, and the supported set) — an old
  * build reading a newer checkpoint must stop, not misparse.
  */
object StateCodec {

  final class StateVersionException(val state: String, val found: Int,
      val supported: Seq[Int])
    extends RuntimeException(
      s"$state state blob has version $found; this build supports " +
        s"${supported.mkString("{", ",", "}")} — a newer build wrote this " +
        "checkpoint. Restart with that build, or drain the checkpoint.")

  // ---- SeenState (streamingDedup): v1 = firstId, nCopies, lastSeenMs

  private final val SeenV = 1

  def encodeSeen(s: StreamingOps.SeenState): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 24)
    b.put(SeenV.toByte).putLong(s.firstId).putLong(s.nCopies)
      .putLong(s.lastSeenMs)
    b.array()
  }

  def decodeSeen(bytes: Array[Byte]): StreamingOps.SeenState = {
    val b = ByteBuffer.wrap(bytes)
    b.get().toInt match {
      case SeenV =>
        StreamingOps.SeenState(b.getLong(), b.getLong(), b.getLong())
      case v => throw new StateVersionException("SeenState", v, Seq(SeenV))
    }
  }

  // ---- BucketRep (streamingNearDupAssign): v1 = repId, repSim, lastSeenMs

  private final val RepV = 1

  def encodeRep(s: StreamingOps.BucketRep): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 24)
    b.put(RepV.toByte).putLong(s.repId).putLong(s.repSim)
      .putLong(s.lastSeenMs)
    b.array()
  }

  def decodeRep(bytes: Array[Byte]): StreamingOps.BucketRep = {
    val b = ByteBuffer.wrap(bytes)
    b.get().toInt match {
      case RepV =>
        StreamingOps.BucketRep(b.getLong(), b.getLong(), b.getLong())
      case v => throw new StateVersionException("BucketRep", v, Seq(RepV))
    }
  }

  // ---- TopK (streamingStratifiedSample):
  //      v1 = count (u16), then count x (hkey, id) long pairs

  private final val TopKV = 1

  def encodeTopK(pairs: Seq[(Long, Long)]): Array[Byte] = {
    require(pairs.length <= Short.MaxValue, "top-k state too large")
    val b = ByteBuffer.allocate(3 + 16 * pairs.length)
    b.put(TopKV.toByte).putShort(pairs.length.toShort)
    pairs.foreach { case (h, id) => b.putLong(h).putLong(id) }
    b.array()
  }

  def decodeTopK(bytes: Array[Byte]): Vector[(Long, Long)] = {
    val b = ByteBuffer.wrap(bytes)
    b.get().toInt match {
      case TopKV =>
        Vector.fill(b.getShort().toInt)((b.getLong(), b.getLong()))
      case v => throw new StateVersionException("TopK", v, Seq(TopKV))
    }
  }

  // ---- KMV minima (streamingKmvDistinct):
  //      v1 = count (u16), then count ascending longs

  private final val KmvV = 1

  def encodeKmv(minima: Seq[Long]): Array[Byte] = {
    require(minima.length <= Short.MaxValue, "kmv state too large")
    val b = ByteBuffer.allocate(3 + 8 * minima.length)
    b.put(KmvV.toByte).putShort(minima.length.toShort)
    minima.foreach(b.putLong)
    b.array()
  }

  def decodeKmv(bytes: Array[Byte]): Vector[Long] = {
    val b = ByteBuffer.wrap(bytes)
    b.get().toInt match {
      case KmvV => Vector.fill(b.getShort().toInt)(b.getLong())
      case v => throw new StateVersionException("Kmv", v, Seq(KmvV))
    }
  }

  // ---- EventDedupState (streamingDedupEventTime):
  //      v1 = phase (0 pending / 1 emitted), bestId, bestTsMs, bestSim,
  //           nCopies

  private final val EventV = 1

  def encodeEvent(s: StreamingOps.EventDedupState): Array[Byte] = {
    val b = ByteBuffer.allocate(2 + 32)
    b.put(EventV.toByte).put(if (s.emitted) 1.toByte else 0.toByte)
      .putLong(s.bestId).putLong(s.bestTsMs).putLong(s.bestSim)
      .putLong(s.nCopies)
    b.array()
  }

  def decodeEvent(bytes: Array[Byte]): StreamingOps.EventDedupState = {
    val b = ByteBuffer.wrap(bytes)
    b.get().toInt match {
      case EventV =>
        StreamingOps.EventDedupState(b.get() == 1.toByte, b.getLong(),
          b.getLong(), b.getLong(), b.getLong())
      case v =>
        throw new StateVersionException("EventDedupState", v, Seq(EventV))
    }
  }

  // ---- CMS grid (streamingCmsSketch):
  //      v1 = depth (u8), width (i32), then depth*width row-major longs

  private final val CmsV = 1

  def encodeCms(depth: Int, width: Int, grid: Array[Long]): Array[Byte] = {
    require(grid.length == depth * width,
      s"cms grid length ${grid.length} != $depth x $width")
    require(depth <= 255, "cms depth exceeds the u8 envelope field")
    val b = ByteBuffer.allocate(6 + 8 * grid.length)
    b.put(CmsV.toByte).put(depth.toByte).putInt(width)
    grid.foreach(b.putLong)
    b.array()
  }

  /** (depth, width, grid) — the op validates depth/width against its
    * own configuration so a restart with a different grid shape fails
    * loudly instead of misindexing counters.
    */
  def decodeCms(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val b = ByteBuffer.wrap(bytes)
    b.get().toInt match {
      case CmsV =>
        val depth = java.lang.Byte.toUnsignedInt(b.get())
        val width = b.getInt()
        val grid = new Array[Long](depth * width)
        var i = 0
        while (i < grid.length) { grid(i) = b.getLong(); i += 1 }
        (depth, width, grid)
      case v => throw new StateVersionException("Cms", v, Seq(CmsV))
    }
  }
}
