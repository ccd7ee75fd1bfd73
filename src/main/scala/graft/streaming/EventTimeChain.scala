package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** The CHAINED event-time corpus ingest — two event-time stateful
  * stages in ONE continuous streaming query (VERDICT r10 #6 / r11 #6).
  *
  * The `flatMapGroupsWithState` API cannot express this: an FMGWS with
  * `EventTimeTimeout` must be the query's terminal stateful operator,
  * because its emissions fire when the watermark PASSES a buffered
  * event time — the rows leave the operator already older than the
  * global watermark, and a downstream stateful operator would base
  * eviction on a watermark that has moved past data still in flight
  * (the "multi-stateful watermark seam" note of r9/r10; Spark rejects
  * the plan or, worse, drops the late rows). The Spark 4
  * `transformWithState` API closes the seam with an explicit output
  * contract: a non-terminal stage DECLARES its output event-time
  * column (`eventTimeColumnName`), the runtime re-stamps the
  * downstream watermark from that column, and enforces — via
  * `EMITTING_ROWS_OLDER_THAN_WATERMARK_NOT_ALLOWED` — that emitted
  * rows carry event times ahead of the current global watermark.
  *
  * Stage 1 (key = content fingerprint) is the replay-deterministic
  * admission of [[StreamingOps.streamingDedupEventTime]], re-expressed
  * as a `StatefulProcessor`: buffer the smallest (event time, doc_id)
  * copy per fingerprint, emit when the watermark passes its event
  * time, leave a suppression tombstone. To satisfy the emission
  * contract the OUTPUT event-time column is re-stamped at
  * `max(original ts, watermark + 1 ms)` — the ORIGINAL event time
  * rides along as a data field (`ts_ms`), so nothing downstream loses
  * the data-defined order.
  *
  * Stage 2 (key = simhash band bucket) assigns near-dup candidates in
  * DATA order, not arrival order: pending docs buffer per bucket until
  * stage 2's own watermark passes their ORIGINAL event time, then
  * drain smallest-(ts, id)-first, each pairing with the bucket's
  * representative — the smallest (ts, id) member admitted before it —
  * when the true Hamming distance is within `maxHamming`. Soundness of
  * gating on the ORIGINAL time with the REASSIGNED watermark: stage
  * 2's watermark is derived from stage 1's re-stamped column, which
  * trails stage 1's input watermark by construction (emissions carry
  * ts ~ the emitting batch's watermark, minus the query delay), and
  * stage 1 has emitted every admission with original ts < its own
  * watermark — so stage-2 watermark > x implies every admission with
  * original ts <= x has already arrived.
  *
  * The result: quality filter -> exact-dedup admission -> near-dup
  * candidate assignment as ONE query whose output is a pure function
  * of the DATA for any arrival disorder bounded by the watermark delay
  * (fuzz-pinned against [[chainedBatch]] in StreamingOpsSpec /
  * StreamingFuzzSpec). Requires the RocksDB state store provider (a
  * `transformWithState` runtime requirement).
  */
object EventTimeChain {

  /** Stage-1 state: pre-emission best-copy tracker, post-emission
    * suppression tombstone.
    */
  final case class DedupSt(emitted: Boolean, bestId: Long, bestTs: Long,
      bestSim: Long, nCopies: Long)

  /** Stage-1 input row. */
  final case class ChainIn(doc_id: Long, fp: String,
      ts: java.sql.Timestamp, simhash: Long)

  /** Stage-1 emission: `ts` is the re-stamped WATERMARK-SAFE event
    * time (chaining contract); `ts_ms` is the admitted copy's ORIGINAL
    * event time — the data-defined order stage 2 keys on.
    */
  final case class Admitted(doc_id: Long, fp: String, ts_ms: Long,
      simhash: Long, ts: java.sql.Timestamp)

  /** Stage-2 input row (banded expansion of [[Admitted]]). */
  final case class BandRow(band: Int, bits: Long, doc_id: Long,
      ts_ms: Long, simhash: Long, ts: java.sql.Timestamp)

  /** Stage-2 pending/representative entry. */
  final case class Member(ts: Long, id: Long, sim: Long)

  /** Chain output: a verified near-dup candidate — keep `doc_id`
    * unless a record names it; `canonical` is the bucket
    * representative it verified against.
    */
  final case class ChainCandidate(doc_id: Long, canonical: Long, ham: Long)

  /** Event-time dedup admission as a chain-safe StatefulProcessor. */
  private[graft] class DedupProcessor(suppressHorizonMs: Long)
      extends StatefulProcessor[String, ChainIn, Admitted] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[DedupSt] = _
    @transient private var timer: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[DedupSt]("dedup",
        Encoders.product[DedupSt], TTLConfig.NONE)
      timer = getHandle.getValueState[Long]("timer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def moveTimer(want: Long): Unit = {
      val cur = if (timer.exists()) timer.get() else Long.MinValue
      if (cur != want) {
        if (cur != Long.MinValue) getHandle.deleteTimer(cur)
        getHandle.registerTimer(want)
        timer.update(want)
      }
    }

    override def handleInputRows(fp: String, rows: Iterator[ChainIn],
        tv: TimerValues): Iterator[Admitted] = {
      var s = if (st.exists()) st.get()
        else DedupSt(emitted = false, Long.MaxValue, Long.MaxValue, 0L, 0L)
      rows.foreach { d =>
        val t = d.ts.getTime
        val better = !s.emitted &&
          (t < s.bestTs || (t == s.bestTs && d.doc_id < s.bestId))
        s = if (better) DedupSt(emitted = false, d.doc_id, t, d.simhash,
          s.nCopies + 1)
        else s.copy(nCopies = s.nCopies + 1)
      }
      st.update(s)
      val wm = tv.getCurrentWatermarkInMs
      moveTimer(if (s.emitted) wm + suppressHorizonMs
        else math.max(s.bestTs, wm + 1L))
      Iterator.empty
    }

    override def handleExpiredTimer(fp: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Admitted] = {
      if (!st.exists()) return Iterator.empty
      val s = st.get()
      val wm = tv.getCurrentWatermarkInMs
      if (!s.emitted) {
        st.update(s.copy(emitted = true))
        timer.update(wm + suppressHorizonMs)
        getHandle.registerTimer(wm + suppressHorizonMs)
        // emission: original time as DATA, watermark-safe time as the
        // chained EVENT-TIME column (the emission contract)
        Iterator.single(Admitted(s.bestId, fp, s.bestTs, s.bestSim,
          new java.sql.Timestamp(math.max(s.bestTs, wm + 1L))))
      } else {
        // tombstone horizon passed quietly: evict
        st.clear(); timer.clear()
        Iterator.empty
      }
    }
  }

  /** Event-time near-dup candidate assignment: drain pending docs in
    * (original ts, id) order once the (chained) watermark passes them,
    * pairing each against the bucket's earlier minimum.
    */
  private[graft] class AssignProcessor(maxHamming: Int)
      extends StatefulProcessor[(Int, Long), BandRow, ChainCandidate] {
    @transient private var rep: org.apache.spark.sql.streaming.ValueState[Member] = _
    @transient private var pending: org.apache.spark.sql.streaming.ListState[Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      rep = getHandle.getValueState[Member]("rep",
        Encoders.product[Member], TTLConfig.NONE)
      pending = getHandle.getListState[Member]("pending",
        Encoders.product[Member], TTLConfig.NONE)
    }

    // Timers are cheap per-key (key, expiry) entries and the drain is
    // IDEMPOTENT (an empty ripe set emits nothing and just
    // reschedules), so no tracked-timer bookkeeping: each input batch
    // and each partial drain registers the next drain point and stale
    // firings are harmless.

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandRow],
        tv: TimerValues): Iterator[ChainCandidate] = {
      var minTs = Long.MaxValue
      // ONE appendList per (key, batch), not one appendValue per row:
      // each RocksDB list merge pays a native metrics read of the
      // accumulated value, so per-row appends into a HOT bucket (a
      // replication-heavy corpus concentrates simhashes) cost
      // O(pending^2) bytes read per batch — the sf10 chain probe
      // measured one such task at ~20 min CPU before this batching
      val buf = scala.collection.mutable.ArrayBuffer.empty[Member]
      rows.foreach { r =>
        buf += Member(r.ts_ms, r.doc_id, r.simhash)
        if (r.ts_ms < minTs) minTs = r.ts_ms
      }
      if (buf.nonEmpty) pending.appendList(buf.toArray)
      if (minTs != Long.MaxValue)
        // earliest pending entry governs the next drain point; an
        // entry already behind the watermark drains on the next advance
        getHandle.registerTimer(
          math.max(minTs, tv.getCurrentWatermarkInMs + 1L))
      Iterator.empty
    }

    override def handleExpiredTimer(key: (Int, Long), tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ChainCandidate] = {
      val wm = tv.getCurrentWatermarkInMs
      val all = pending.get().toArray
      if (all.isEmpty) return Iterator.empty
      val (ripe, rest) = all.partition(_.ts < wm)
      val out = scala.collection.mutable.ArrayBuffer.empty[ChainCandidate]
      if (ripe.nonEmpty) {
        // DATA order: smallest (original ts, id) first — identical for
        // every arrival order whose disorder the watermark bounds
        java.util.Arrays.sort(ripe, Ordering.by((m: Member) => (m.ts, m.id)))
        var r = if (rep.exists()) Some(rep.get()) else None
        ripe.foreach { m =>
          r match {
            case Some(cur) =>
              val ham = java.lang.Long.bitCount(cur.sim ^ m.sim).toLong
              if (ham <= maxHamming) out += ChainCandidate(m.id, cur.id, ham)
              // representative stays the bucket's (ts, id) minimum
              if (m.ts < cur.ts || (m.ts == cur.ts && m.id < cur.id))
                r = Some(m)
            case None => r = Some(m)
          }
        }
        r.foreach(rep.update)
        if (rest.nonEmpty) pending.put(rest) else pending.clear()
      }
      if (rest.nonEmpty)
        getHandle.registerTimer(math.max(rest.map(_.ts).min, wm + 1L))
      out.iterator
    }
  }

  /** Banded expansion of the admitted stream — the
    * [[graft.dedup.Dedup]] Hamming-LSH band scheme (maxHamming+1 bands
    * over the 60-bit simhash), carrying both time columns through.
    */
  private def banded(admitted: Dataset[Admitted], maxHamming: Int)
      : DataFrame = {
    val nBands = maxHamming + 1
    val base = 60 / nBands
    val extra = 60 % nBands
    val offsets = (0 until nBands).scanLeft(0)((acc, b) =>
      acc + base + (if (b < extra) 1 else 0))
    val bandCols = (0 until nBands).map { b =>
      val width = base + (if (b < extra) 1 else 0)
      struct(lit(b).as("band"),
        shiftright(col("simhash"), offsets(b))
          .bitwiseAND(lit((1L << width) - 1)).as("bits"))
    }
    admitted.toDF()
      .select(col("doc_id"), col("ts_ms"), col("simhash"), col("ts"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bits").as("bits"),
        col("doc_id"), col("ts_ms"), col("simhash"), col("ts"))
  }

  /** The full chain as ONE streaming query: quality filter ->
    * fingerprint+simhash map-side -> event-time dedup admission
    * (stage 1) -> band explode -> event-time near-dup candidates
    * (stage 2). Output rows are [[ChainCandidate]]s; a downstream
    * keeps an admitted doc unless a candidate names it (the
    * [[StreamingOps.streamingCorpusIngest]] contract, now
    * replay-deterministic end to end).
    */
  def chained(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, tsCol: String, watermark: String,
      maxHamming: Int, requireTerminal: Boolean = true,
      suppressHorizon: String = "30 days"): Dataset[ChainCandidate] = {
    import spark.implicits._
    val horizonMs = math.max(1L, StreamingOps
      .intervalMs(suppressHorizon, "suppressHorizon"))
    val (keep, _) = graft.text.TextOps.qualityFilter(col(textCol),
      requireTerminal = requireTerminal)
    val fingered = graft.dedup.Dedup.simhash(
      docs.filter(keep), idCol, textCol, carryCols = Seq(textCol, tsCol))
      .select(col(idCol).cast("long").as("doc_id"),
        graft.text.TextOps.fingerprint(col(textCol)).as("fp"),
        col(tsCol).as("ts"), col("simhash"))
      .withWatermark("ts", watermark)
      .as[ChainIn]
    val admitted = fingered
      .groupByKey(_.fp)
      .transformWithState(new DedupProcessor(horizonMs),
        "ts", OutputMode.Append())
    banded(admitted, maxHamming)
      .as[BandRow]
      .groupByKey(r => (r.band, r.bits))
      .transformWithState(new AssignProcessor(maxHamming),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Batch twin of [[chained]]: admission = smallest (event time,
    * doc_id) per fingerprint; per band bucket, each admitted doc pairs
    * with the smallest (event time, doc_id) member admitted BEFORE it
    * (a running window minimum in data order) when within
    * `maxHamming`. Distinct over bands — the stream may surface the
    * same pair from two buckets; set-compare against it.
    */
  def chainedBatch(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, maxHamming: Int,
      requireTerminal: Boolean = true): DataFrame = {
    val (keep, _) = graft.text.TextOps.qualityFilter(col(textCol),
      requireTerminal = requireTerminal)
    val fingered = graft.dedup.Dedup.simhash(
      docs.filter(keep), idCol, textCol, carryCols = Seq(textCol, tsCol))
      .select(col(idCol).cast("long").as("doc_id"),
        graft.text.TextOps.fingerprint(col(textCol)).as("fp"),
        col(tsCol), col("simhash"))
    val admitted = StreamingOps.streamingDedupEventTimeBatch(
      fingered, tsCol)
    val nBands = maxHamming + 1
    val base = 60 / nBands
    val extra = 60 % nBands
    val offsets = (0 until nBands).scanLeft(0)((acc, b) =>
      acc + base + (if (b < extra) 1 else 0))
    val bandCols = (0 until nBands).map { b =>
      val width = base + (if (b < extra) 1 else 0)
      struct(lit(b).as("band"),
        shiftright(col("simhash"), offsets(b))
          .bitwiseAND(lit((1L << width) - 1)).as("bits"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bits"))
      .orderBy(col("ts_ms"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    admitted
      .select(col("doc_id"), col("ts_ms"), col("simhash"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bits").as("bits"),
        col("doc_id"), col("ts_ms"), col("simhash"))
      .withColumn("rep",
        min(struct(col("ts_ms"), col("doc_id"), col("simhash"))).over(w))
      .filter(col("rep").isNotNull)
      .withColumn("ham", expr("bit_count(simhash ^ rep.simhash)").cast("long"))
      .filter(col("ham") <= maxHamming)
      .select(col("doc_id"), col("rep.doc_id").as("canonical"), col("ham"))
      .distinct()
  }
}
