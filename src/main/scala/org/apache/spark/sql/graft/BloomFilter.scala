package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, LongType}

/** Shared Bloom-filter kernel: sizing math, the double-hash probe
  * sequence, and the serialized wire format used by [[BloomAgg]] (the
  * builder aggregate) and [[BloomMightContain]] (the probe predicate).
  *
  * Bit positions come from Kirsch-Mitzelmacher double hashing (ESA'06:
  * two hash functions simulate k with no loss in the false-positive
  * asymptotics): h1/h2 are splitmix64 finalizer mixes of the input
  * long, position_i = (h1 + i*h2) mod m with h2 forced odd. The input
  * is already a 64-bit hash of the underlying value (the caller feeds
  * `xxhash64(col)`), so the mixer only needs to decorrelate the k
  * probes, not build entropy.
  *
  * Wire format (ByteBuffer's big-endian default):
  * Int numHashes, Long numBits, then ceil(numBits/64) longs of bits.
  * A ZERO-bit filter (numBits=0, no words) is the canonical "empty
  * set" value: contains() is always false.
  */
object GraftBloom {

  private val ln2 = math.log(2.0)

  /** splitmix64 finalizer (Steele et al., public domain) — a full
    * avalanche mix of one long. */
  def mix64(v0: Long): Long = {
    var z = v0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Optimal bit count for n items at target false-positive rate p:
    * m = -n ln p / (ln 2)^2, floored at 64 bits. */
  def optimalBits(n: Long, fpp: Double): Long = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    math.max(64L, math.ceil(-n.toDouble * math.log(fpp) / (ln2 * ln2)).toLong)
  }

  /** Optimal probe count for m bits over n items: k = (m/n) ln 2. */
  def optimalHashes(m: Long, n: Long): Int =
    math.max(1, math.round(m.toDouble / math.max(1L, n) * ln2).toInt)

  /** Size a filter for `n` items at `fpp`, capped at `maxBytes` of bit
    * array — when the cap binds, the bit count is clamped and the probe
    * count re-optimized for the clamped size (the fpp degrades
    * gracefully instead of the build failing). */
  def size(n: Long, fpp: Double, maxBytes: Long): (Long, Int) = {
    val m = math.min(optimalBits(n, fpp), maxBytes * 8L)
    (m, optimalHashes(m, n))
  }

  def serialize(numHashes: Int, numBits: Long, words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 8 * words.length)
    bb.putInt(numHashes)
    bb.putLong(numBits)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): BloomProbe = {
    // validated: bloom_might_contain is SQL-reachable, so a malformed
    // binary must fail as "not a bloom filter", not as a raw
    // BufferUnderflow/ArrayIndexOutOfBounds from inside a task
    require(bytes.length >= 12 && (bytes.length - 12) % 8 == 0,
      s"not a serialized bloom filter: ${bytes.length} bytes " +
        "(expected 4 + 8 + 8k)")
    val bb = ByteBuffer.wrap(bytes)
    val numHashes = bb.getInt
    val numBits = bb.getLong
    val words = new Array[Long]((bytes.length - 12) / 8)
    require(numHashes >= 0 && numHashes <= 64 && numBits >= 0 &&
        numBits <= 64L * words.length,
      s"corrupt bloom filter header: numHashes=$numHashes, " +
        s"numBits=$numBits over ${words.length} words")
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    new BloomProbe(numHashes, numBits, words)
  }

  /** Set the k probe bits of `v` in `words`. */
  def insert(v: Long, numHashes: Int, numBits: Long, words: Array[Long]): Unit = {
    if (numBits > 0) {
      val h1 = mix64(v)
      val h2 = mix64(v ^ 0x9E3779B97F4A7C15L) | 1L
      var i = 0
      while (i < numHashes) {
        val pos = ((h1 + i.toLong * h2) & Long.MaxValue) % numBits
        words((pos >>> 6).toInt) |= (1L << (pos & 63L))
        i += 1
      }
    }
  }
}

/** The deserialized probe side of a Bloom filter — a plain serializable
  * object so [[BloomMightContain]]'s generated code can hold it as a
  * codegen reference and call [[contains]] per row. */
final class BloomProbe(val numHashes: Int, val numBits: Long,
    val words: Array[Long]) extends Serializable {

  def contains(v: Long): Boolean = {
    if (numBits <= 0) return false
    val h1 = GraftBloom.mix64(v)
    val h2 = GraftBloom.mix64(v ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i.toLong * h2) & Long.MaxValue) % numBits
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Bloom-filter BUILD as a native Catalyst [[TypedImperativeAggregate]]
  * over a pre-hashed LONG column — the third mergeable sketch on the
  * §2.7 aggregate surface (with [[KmvDistinct]] for cardinality and
  * [[CmsSketch]] for frequency; this one is the SET-MEMBERSHIP sketch).
  *
  * Scale shape: state is a fixed ceil(numBits/64) longs however many
  * rows flow in, updates are map-side partial, merges are word-wise ORs
  * — commutative and associative, so the distributed result is
  * bit-identical however Spark orders partial aggregation. The evaluated
  * BINARY feeds [[BloomMightContain]] as a broadcast-literal probe: the
  * join-pruning pattern where a semi-join's build side is summarized
  * into megabytes and the probe side is filtered MAP-SIDE before any
  * shuffle (what Spark's own runtime row-level filtering does inside
  * AQE, surfaced here as a first-class operator for the
  * decontamination pipeline).
  */
case class BloomAgg(child: Expression, numBits: Long, numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(numBits >= 0, s"bloom_agg numBits must be >= 0, got $numBits")
  require(numBits <= (1L << 33),
    s"bloom_agg numBits $numBits exceeds 2^33 (1 GiB) — a per-group " +
      "aggregation buffer this large is a config error")
  require(numHashes >= 1 && numHashes <= 64,
    s"bloom_agg numHashes must be in [1,64], got $numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](((numBits + 63L) >>> 6).toInt)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) GraftBloom.insert(v.asInstanceOf[Long], numHashes, numBits, buf)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    GraftBloom.serialize(numHashes, numBits, buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)

  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-level entry point over a pre-hashed LONG column. */
  def apply(c: org.apache.spark.sql.Column, numBits: Long,
      numHashes: Int): org.apache.spark.sql.Column =
    ExpressionUtils.column(
      BloomAgg(ExpressionUtils.expression(c), numBits, numHashes)
        .toAggregateExpression())
}

/** Bloom-filter PROBE: `bloom_might_contain(filter, hash)` — true if
  * `hash` may be in the set the filter summarizes (no false negatives;
  * false positives at the build's fpp). The filter side must be
  * FOLDABLE (a literal produced by collecting [[BloomAgg]]'s one-row
  * result) — it is deserialized ONCE at plan time and held as a codegen
  * reference, so the per-row work is k word probes inside whole-stage
  * codegen, never a per-row deserialization. This is the map-side
  * pre-filter of the bloom-pruned decontamination join
  * ([[graft.text.Decontaminate.flagsBloomPruned]]).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain's filter argument must be foldable (a " +
          "literal built by collecting bloom_agg's result)")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val probe: BloomProbe = {
    val bytes = left.eval(null)
    if (bytes == null) null
    else GraftBloom.deserialize(bytes.asInstanceOf[Array[Byte]])
  }

  override def nullSafeEval(bloomBytes: Any, v: Any): Any =
    probe.contains(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val probeRef = ctx.addReferenceObj("bloomProbe", probe,
      classOf[BloomProbe].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $probeRef.contains($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-level entry point. */
  def apply(bloom: org.apache.spark.sql.Column,
      hash: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ExpressionUtils.column(BloomMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(hash)))
}
