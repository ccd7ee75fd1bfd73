package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DoubleSortableBits

/** Exact distributed ORDER STATISTICS without sorting — the primitive
  * behind exact corpus quantiles (perplexity carves, length caps,
  * quality-score cuts) at scales where "sort the column and take row
  * k" is a non-starter and approximate percentiles break cross-engine
  * determinism.
  *
  * Method: histogram DRILL over the value's order-preserving bit image
  * ([[DoubleSortableBits]] — bit prefixes of the image are value
  * ranges). Each round one partial-aggregatable count of a 16-bit
  * slice (<= 65536 counters to the driver), narrowing to the exact
  * 64-bit image in 4 rounds (round 0 doubles as the sizing pass — its
  * unscoped counts sum to the per-stratum rankable sizes); rank ties
  * on the exact value resolve with the same drill over the id bits
  * (4 more rounds), run ONLY for strata whose k-th value is tied at
  * the full 64-bit image — the value drill's last round counts the
  * tie group for free, and an untied threshold needs no id (r17).
  * Work: 4 count passes in the common untied case, <= 8 worst case —
  * no shuffle of data rows, no per-partition top-k heaps (k can be
  * corpus-sized), no driver row collection beyond the bounded counter
  * maps.
  *
  * All strata drill SIMULTANEOUSLY: the per-round filter joins a
  * broadcast (stratum -> prefix) table, so the pass count is 8 TOTAL
  * however many strata exist — not 8 per stratum.
  *
  * Determinism: the selected pair is a pure function of the data (the
  * lexicographic (value, id) order is total when ids are distinct),
  * independent of partitioning. NaN values rank above every number
  * (the IEEE image of NaN is the largest prefix) — callers that need
  * them excluded filter first.
  */
object Selection {

  /** The k-th smallest (value, id) pair per stratum, 1-based k, under
    * lexicographic (value asc, id asc) order. Strata with k <= 0 or
    * k > stratum size are dropped from the result. `ksOf` receives the
    * per-stratum RANKABLE sizes (null strata, values, and ids
    * excluded) so fraction-derived ks come from the same population
    * the drill ranks. Rows with a null stratum key are excluded
    * entirely (they belong to no stratum).
    */
  def stratifiedKthSmallest(df: DataFrame, strataCol: String,
      valueCol: String, idCol: String,
      ksOf: Map[String, Long] => Map[String, Long]): Map[String, (Double, Long)] =
    onDrillBase(df, strataCol, valueCol, idCol)(
      stratifiedKthSmallestOn(_, ksOf))

  /** Build the drill's cached (stratum, value-image, id-image) base,
    * run `f` over it, and release the cache.
    */
  private def onDrillBase[T](df: DataFrame, strataCol: String,
      valueCol: String, idCol: String)(f: DataFrame => T): T = {
    // strata must be a real string column: the driver-side counter maps
    // key on String, and a silent cast would make carve joins diverge
    require(df.schema(strataCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"stratifiedKthSmallest: strata column '$strataCol' must be " +
        s"STRING, got ${df.schema(strataCol).dataType.sql}")
    // null strata/values/ids are EXCLUDED from ranking (a null has no
    // place in the total order, and a null stratum would survive the
    // sizing groupBy but never match the per-round broadcast `===`
    // join — the drill would NPE on its own counter map)
    val base = df
      .filter(col(strataCol).isNotNull &&
        col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(strataCol).as("__s"),
        DoubleSortableBits(col(valueCol)).as("__vb"),
        col(idCol).cast("long").as("__id"))
      // one top-bit flip makes unsigned shifts of the image iterate
      // buckets in value order 0..65535
      .select(col("__s"),
        col("__vb").bitwiseXOR(lit(Long.MinValue)).as("__ub"),
        col("__id").bitwiseXOR(lit(Long.MinValue)).as("__uid"))
      // cached for the drill's lifetime: every round re-counts this
      // 3-column projection, and WITHOUT the cache each of the ~9
      // passes re-runs whatever upstream pipeline produced the value
      // column (measured 5x on the p6 surprisal chain); unpersisted
      // before returning — no r5-style leak
      .cache()
    try f(base)
    finally base.unpersist()
  }

  /** Fixed-ks convenience. */
  def stratifiedKthSmallest(df: DataFrame, strataCol: String,
      valueCol: String, idCol: String,
      ks: Map[String, Long]): Map[String, (Double, Long)] =
    stratifiedKthSmallest(df, strataCol, valueCol, idCol,
      (_: Map[String, Long]) => ks)

  private def stratifiedKthSmallestOn(base: DataFrame,
      ksOf: Map[String, Long] => Map[String, Long]): Map[String, (Double, Long)] =
    resolveThresholds(base, ksOf, needIds = true).map {
      case (s, (v, id)) => s -> (v, id.get)
    }

  /** The drill engine. Returns per stratum the k-th (value, id-image
    * resolved to the id) — with `needIds = false`, strata whose k-th
    * VALUE is unique (tie-group size 1 at the full 64-bit image — the
    * common case) carry None instead of paying any id resolution:
    * the id only exists to break ties, and [[carveLowest]]'s filter
    * does not need it when there is no tie (r17, guide §1.2: the
    * former unconditional id phase was 4 of the drill's 8 count
    * passes). With `needIds = true`, unique strata resolve their id
    * in ONE shared fetch pass (the tie group is a single row) and
    * only TIED strata pay the 4-round id drill — same results as the
    * former unconditional drill, up to 3 passes cheaper.
    */
  private def resolveThresholds(base: DataFrame,
      ksOf: Map[String, Long] => Map[String, Long],
      needIds: Boolean): Map[String, (Double, Option[Long])] = {
    val spark = base.sparkSession
    import spark.implicits._

    // the value drill's round 0 doubles as the SIZING pass (r17): its
    // unscoped per-(stratum, top-16-bits) counts sum to exactly the
    // per-stratum rankable sizes the former dedicated groupBy pass
    // computed, so the ks derive from round 0's own counts and the
    // drill runs one fewer pass over the cached base
    val counts0all = base.groupBy(col("__s"),
        shiftrightunsigned(col("__ub"), 48).bitwiseAND(lit(0xFFFFL)).as("__b"))
      .count().collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        s -> rows.map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1).toSeq
      }
    val sizes = counts0all.map { case (s, rows) => s -> rows.map(_._2).sum }
    val ks = ksOf(sizes)
    val live: Map[String, Long] = ks.filter { case (s, k) =>
      k >= 1 && sizes.get(s).exists(k <= _)
    }
    if (live.isEmpty) return Map.empty

    /** One drill phase over `keyCol` for the strata in `kRem0`, under
      * an optional equality pin from a previous phase (`pin`: stratum
      * -> pinned column value). `counts0` short-circuits round 0 with
      * precomputed unscoped counts (the value phase; the pinned id
      * phase counts its own round 0). Returns (resolved key per
      * stratum, remaining rank, final-round tie-group size — the count
      * of rows equal to the fully resolved key under the pin).
      */
    def drill(keyCol: String, pin: Map[String, Long], pinCol: String,
        kRem0: Map[String, Long],
        counts0: Map[String, Seq[(Long, Long)]])
        : (Map[String, Long], Map[String, Long], Map[String, Long]) = {
      var prefix: Map[String, Long] = kRem0.keys.map(_ -> 0L).toMap
      var kRem = kRem0
      var tie: Map[String, Long] = Map.empty
      for (round <- 0 until 4) {
        val shift = 48 - 16 * round
        val counts: Map[String, Seq[(Long, Long)]] =
          if (round == 0 && counts0 != null) counts0
          else {
            val pre = prefix.toSeq.map { case (s, p) =>
              (s, p, pin.getOrElse(s, 0L), kRem(s))
            }.toDF("__ps", "__pfx", "__pin", "__k")
            val pinned =
              if (pin.isEmpty) lit(true)
              else col(pinCol) === col("__pin")
            val scoped =
              if (round == 0) pinned
              else pinned &&
                shiftrightunsigned(col(keyCol), shift + 16) === col("__pfx")
            base.join(broadcast(pre), col("__s") === col("__ps"))
              .filter(scoped)
              .groupBy(col("__s"),
                shiftrightunsigned(col(keyCol), shift)
                  .bitwiseAND(lit(0xFFFFL)).as("__b"))
              .count().collect()
              .groupBy(_.getString(0))
              .map { case (s, rows) =>
                s -> rows.map(r => r.getLong(1) -> r.getLong(2))
                  .sortBy(_._1).toSeq
              }
          }
        prefix = prefix.map { case (s, p) =>
          var k = kRem(s)
          var chosen = -1L
          var chosenCount = 0L
          for ((b, c) <- counts(s) if chosen < 0) {
            if (k <= c) { chosen = b; chosenCount = c } else k -= c
          }
          kRem += s -> k
          if (round == 3) tie += s -> chosenCount
          s -> ((p << 16) | chosen)
        }
      }
      (prefix, kRem, tie)
    }

    val (ubResolved, tieRank, tieCount) =
      drill("__ub", Map.empty, "", live, counts0all)
    val unique = live.keys.filter(s => tieCount(s) == 1L).toSet

    // tied strata: the id drill, simultaneous across them as before
    val tiedKRem = tieRank.filter { case (s, _) => !unique(s) }
      .filter { case (s, _) => live.contains(s) }
    val uidTied: Map[String, Long] =
      if (tiedKRem.isEmpty) Map.empty
      else drill("__uid", ubResolved, "__ub", tiedKRem, null)._1

    // unique strata: the tie group is one row — when ids are needed,
    // ONE shared fetch pass resolves them all
    val uidUnique: Map[String, Long] =
      if (!needIds || unique.isEmpty) Map.empty
      else {
        val pre = unique.toSeq.map(s => (s, ubResolved(s)))
          .toDF("__ps", "__pub")
        base.join(broadcast(pre),
            col("__s") === col("__ps") && col("__ub") === col("__pub"))
          .select(col("__s"), col("__uid")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }

    live.keys.map { s =>
      val v = DoubleSortableBits.invert(ubResolved(s) ^ Long.MinValue)
      val id =
        if (unique(s))
          uidUnique.get(s).map(_ ^ Long.MinValue)
        else Some(uidTied(s) ^ Long.MinValue)
      s -> (v, id)
    }.toMap
  }

  /** Single-stratum convenience. */
  def kthSmallest(df: DataFrame, valueCol: String, idCol: String,
      k: Long): Option[(Double, Long)] =
    stratifiedKthSmallest(df.withColumn("__one", lit("_")), "__one",
      valueCol, idCol, Map("_" -> k)).get("_")

  /** CCNet-style carve: per stratum, KEEP the lowest `frac` fraction
    * of rows by (value asc, id asc) — k = ceil(frac * n) exactly, so
    * the keep set is a deterministic rank selection, not a threshold
    * guess. The thresholds come from ONE simultaneous drill (8 count
    * passes total); the carve itself is a broadcast threshold join +
    * map-side filter — no window, no sort, nothing corpus-sized
    * shuffles.
    */
  def carveLowest(df: DataFrame, strataCol: String, valueCol: String,
      idCol: String, frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    val spark = df.sparkSession
    import spark.implicits._
    // k derives from the drill's own rankable sizes (nulls excluded),
    // computed off the drill's cached base — no separate sizing pass.
    // needIds = false: a stratum whose k-th VALUE is unique needs no
    // tie-break id at all (the filter below keeps every row <= the
    // value image, which is exactly the k lowest), so the common case
    // runs 5 count passes instead of 9 (r17).
    val thresholds = onDrillBase(df, strataCol, valueCol, idCol)(
      resolveThresholds(_,
        (sizes: Map[String, Long]) =>
          sizes.map { case (s, n) => s -> math.ceil(frac * n).toLong },
        needIds = false))
    if (thresholds.isEmpty) return df.filter(lit(false))
    val thr = thresholds.toSeq.map { case (s, (v, idOpt)) =>
      (s, v, idOpt.map(java.lang.Long.valueOf).orNull)
    }.toDF("__ts", "__tv", "__tid")
    // the filter compares the SAME total order the drill ranked by —
    // the sortable bit image — not raw doubles: SQL `=` treats
    // -0.0 == +0.0 while the image ranks -0.0 strictly below, so a
    // zero-valued threshold in a mixed-sign-zero stratum would
    // otherwise break the exact-k guarantee. A null __tid marks a
    // unique-threshold stratum: every RANKABLE row at the threshold
    // image is the threshold row, so the id clause degenerates to
    // true — but only for rows with a rankable id (ADVICE r17: a
    // null-id row sharing the threshold value is outside the drill's
    // base and must stay excluded, exactly as the non-degenerate
    // clause's SQL-NULL comparison excludes it).
    df.join(broadcast(thr), col(strataCol) === col("__ts"))
      .filter(DoubleSortableBits(col(valueCol)) <
          DoubleSortableBits(col("__tv")) ||
        (DoubleSortableBits(col(valueCol)) ===
          DoubleSortableBits(col("__tv")) &&
          ((col("__tid").isNull &&
            col(idCol).cast("long").isNotNull) ||
            col(idCol).cast("long") <= col("__tid"))))
      .drop("__ts", "__tv", "__tid")
  }
}
