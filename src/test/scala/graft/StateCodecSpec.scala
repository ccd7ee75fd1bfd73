package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StateCodec, StreamingOps}
import graft.streaming.StreamingOps.{BucketRep, EventDedupState, SeenState}

/** The versioned binary state envelope (VERDICT r9 #6): round-trips,
  * loud unknown-version failure, and the upgrade pattern a future
  * build follows to read an old checkpoint's blobs.
  */
class StateCodecSpec extends AnyFunSuite {

  test("SeenState v1 round-trips, including extreme values") {
    for (s <- Seq(
        SeenState(0L, 0L, 0L),
        SeenState(Long.MaxValue, Long.MinValue, -1L),
        SeenState(42L, 7L, 1700000000123L)))
      assert(StateCodec.decodeSeen(StateCodec.encodeSeen(s)) === s)
  }

  test("BucketRep v1 round-trips, including extreme values") {
    for (s <- Seq(
        BucketRep(0L, 0L, 0L),
        BucketRep(Long.MaxValue, -1L, Long.MinValue),
        BucketRep(9L, 0x5a5a5a5a5a5a5a5aL, 1700000000123L)))
      assert(StateCodec.decodeRep(StateCodec.encodeRep(s)) === s)
  }

  test("EventDedupState v1 round-trips both phases") {
    for (s <- Seq(
        EventDedupState(emitted = false, Long.MaxValue, Long.MaxValue, 0L, 0L),
        EventDedupState(emitted = true, 3L, 1700000000123L, -5L, 12L)))
      assert(StateCodec.decodeEvent(StateCodec.encodeEvent(s)) === s)
  }

  test("TopK v1 round-trips empty, single, and full samples") {
    for (s <- Seq(
        Vector.empty[(Long, Long)],
        Vector((0L, Long.MaxValue)),
        Vector.tabulate(64)(i => (i * 0x9e3779b9L, i.toLong)),
        Vector((Long.MinValue, -1L), (-2L, Long.MaxValue))))
      assert(StateCodec.decodeTopK(StateCodec.encodeTopK(s)) === s)
  }

  test("Kmv v1 round-trips empty, partial, and full minima vectors") {
    for (s <- Seq(Vector.empty[Long], Vector(42L),
        Vector.tabulate(32)(i => i * 7919L), Vector(0L, Long.MaxValue)))
      assert(StateCodec.decodeKmv(StateCodec.encodeKmv(s)) === s)
  }

  test("Cms v1 round-trips shape and counters; unknown version fails loudly") {
    val grid = Array.tabulate(2 * 8)(i => i * 31L)
    val (d, w, g) = StateCodec.decodeCms(StateCodec.encodeCms(2, 8, grid))
    assert((d, w) === ((2, 8)))
    assert(g === grid)
    // empty grid round-trips too
    val (d0, w0, g0) = StateCodec.decodeCms(
      StateCodec.encodeCms(1, 4, new Array[Long](4)))
    assert((d0, w0) === ((1, 4)) && g0 === Array(0L, 0L, 0L, 0L))
    val blob = StateCodec.encodeCms(1, 4, new Array[Long](4))
    blob(0) = 9.toByte
    val e = intercept[StateCodec.StateVersionException] {
      StateCodec.decodeCms(blob)
    }
    assert(e.state === "Cms")
    // a grid/shape mismatch at encode time is a config error
    intercept[IllegalArgumentException] {
      StateCodec.encodeCms(2, 8, new Array[Long](15))
    }
  }

  test("Kmv unknown version fails loudly") {
    val blob = StateCodec.encodeKmv(Vector(5L))
    blob(0) = 9.toByte
    val e = intercept[StateCodec.StateVersionException] {
      StateCodec.decodeKmv(blob)
    }
    assert(e.state === "Kmv")
  }

  test("TopK unknown version fails loudly") {
    val blob = StateCodec.encodeTopK(Vector((1L, 2L)))
    blob(0) = 7.toByte
    val e = intercept[StateCodec.StateVersionException] {
      StateCodec.decodeTopK(blob)
    }
    assert(e.state === "TopK")
    assert(e.found === 7)
  }

  test("unknown version fails loudly, naming the state and versions") {
    val blob = StateCodec.encodeSeen(SeenState(1L, 2L, 3L))
    blob(0) = 99.toByte // a future build's version tag
    val e = intercept[StateCodec.StateVersionException] {
      StateCodec.decodeSeen(blob)
    }
    assert(e.state === "SeenState")
    assert(e.found === 99)
    assert(e.supported === Seq(1))
    assert(e.getMessage.contains("SeenState"))
    assert(e.getMessage.contains("99"))
  }

  test("fresh-state blobs are rejected by the WRONG decoder (tag mismatch surfaces cross-wiring)") {
    // All three states currently share version tag 1, so cross-decoding
    // cannot be caught by the tag alone — this pins the LENGTHS apart
    // so a cross-wired decode at least fails structurally where
    // possible, and documents the residual risk for the equal-length
    // pair (Seen/Rep share 25 bytes by design; their keyspaces differ).
    assert(StateCodec.encodeSeen(SeenState(1, 2, 3)).length === 25)
    assert(StateCodec.encodeRep(BucketRep(1, 2, 3)).length === 25)
    assert(StateCodec.encodeEvent(
      EventDedupState(emitted = false, 1, 2, 3, 4)).length === 34)
  }

  test("upgrade pattern: a v2 decoder reads v1 blobs (new build, old checkpoint)") {
    // Simulates the deployment path the envelope exists for: a future
    // build adds a field to SeenState, bumps the write version to 2,
    // and its decoder KEEPS the v1 branch with a default for the new
    // field. The encoder schema (binary) never changes, so Spark's
    // state-schema check passes and the old checkpoint restores.
    final case class SeenV2(firstId: Long, nCopies: Long, lastSeenMs: Long,
        firstBatchId: Long) // hypothetical new field
    def encodeV2(s: SeenV2): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(1 + 32)
      b.put(2.toByte).putLong(s.firstId).putLong(s.nCopies)
        .putLong(s.lastSeenMs).putLong(s.firstBatchId)
      b.array()
    }
    def decodeV2(bytes: Array[Byte]): SeenV2 = {
      val b = java.nio.ByteBuffer.wrap(bytes)
      b.get().toInt match {
        case 1 => // v1 blob from the old build's checkpoint
          SeenV2(b.getLong(), b.getLong(), b.getLong(), firstBatchId = -1L)
        case 2 =>
          SeenV2(b.getLong(), b.getLong(), b.getLong(), b.getLong())
        case v =>
          throw new StateCodec.StateVersionException("SeenState", v, Seq(1, 2))
      }
    }
    val oldBlob = StateCodec.encodeSeen(SeenState(10L, 3L, 1700L))
    assert(decodeV2(oldBlob) === SeenV2(10L, 3L, 1700L, -1L))
    val newState = SeenV2(11L, 4L, 1800L, 77L)
    assert(decodeV2(encodeV2(newState)) === newState)
    // and the OLD build fails loudly on the NEW blob (downgrade path)
    val e = intercept[StateCodec.StateVersionException] {
      StateCodec.decodeSeen(encodeV2(newState))
    }
    assert(e.found === 2)
  }
}
