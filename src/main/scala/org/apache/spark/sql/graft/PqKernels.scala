package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Map-only kernels for the product-quantization family (r17, the
  * optimization round) — the [[NearestCell]] treatment applied to the
  * PQ/Lloyd operators (s7/s8/s9/s10).
  *
  * Why (guide §2.3/§2.4, measured in SCALE_r17 §3b for the identical
  * shape): the former training/assignment plans broadcast-join the
  * centroid table against every (id, sub) subvector row and reduce with
  * `groupBy(id, sub).agg(min_by(struct(cell, sv), struct(d, cell)))`.
  * The grouping key is UNIQUE, so partial aggregation cannot shrink the
  * exchange below one full copy of every subvector — N x nsub vector
  * structs cross the wire per Lloyd iteration (plus once more for the
  * final encode) for what is per-row arithmetic. These kernels evaluate
  * the SAME argmin as one scalar expression per row against a broadcast
  * codebook: assignment and encoding become map-only, the iteration's
  * only exchange is the tiny (sub, cell, pos) mean aggregate, and the
  * search-time ADC lookup needs no join at all.
  *
  * Codegen note: unlike [[NearestCell]]/[[ClosestCatalogProbe]] (whose
  * children are bare attributes), these kernels are typically composed
  * directly over the int8 QUANTIZE expression, which CollapseProject
  * inlines into the child. A CodegenFallback would therefore re-evaluate
  * that whole HOF chain INTERPRETED once per row (measured: s7 5x
  * slower), so each kernel emits real generated code — one static call
  * into the broadcast object with the child evaluated by the
  * surrounding whole-stage codegen (and shared with its other uses by
  * subexpression elimination).
  *
  * Exactness contract (the join forms remain in
  * `ProductQuantize.trainJoin` / `Similarity.kmeansCellsJoin` as the
  * fallback and spec comparison arms):
  *  - distance: `dot(sv,sv) + dot(cv,cv) - 2.0*dot(sv,cv)` — Vec.sqDist's
  *    association — with each dot the [[DotProduct]] sequential left
  *    fold over `min(len)` elements, null elements read as NaN;
  *    `dot(cv,cv)` is precomputed per centroid by the same fold.
  *  - argmin: candidates scanned in ascending cell-id order with strict
  *    improvement under [[SQLOrderingUtil.compareDoubles]] — exactly
  *    min_by's struct(d, cell) ordering (lowest cell wins ties; NaN
  *    compares equal to NaN and above every number; an all-NaN or
  *    null-subvector row resolves to the lowest cell, which is what
  *    min_by picks when every ordering key compares equal or null —
  *    struct field nulls sort first and then tie on cell).
  *  - cell ids need not be dense: a seed with gaps (only ids present
  *    and < kcent become cells) keeps its sparse ids, ascending.
  */
final class Codebook(
    val ids: Array[Long],            // ascending cell ids
    val cent: Array[Array[Double]],  // centroid vectors, same order
    val cc: Array[Double])           // dot(cv,cv) per centroid
    extends Serializable {

  /** argmin cell id; a null row vector resolves like the join form's
    * all-null-distance group — the lowest cell. (Called from generated
    * code.)
    */
  def nearestNullable(v: ArrayData): Long =
    if (v == null) ids(0)
    else nearestRange(v, 0, v.numElements(),
      Codebook.selfDot(v, 0, v.numElements()))

  /** argmin over the subvector v[lo, hi) — [[PqEncode]]'s per-subspace
    * view without materializing the slice.
    */
  def nearestRange(v: ArrayData, lo: Int, hi: Int, dv: Double): Long = {
    var bi = 0
    var bd = dist(v, lo, hi, dv, 0)
    var i = 1
    while (i < ids.length) {
      val d = dist(v, lo, hi, dv, i)
      if (SQLOrderingUtil.compareDoubles(d, bd) < 0) { bi = i; bd = d }
      i += 1
    }
    ids(bi)
  }

  private def dist(v: ArrayData, lo: Int, hi: Int, dv: Double,
      ci: Int): Double = {
    val c = cent(ci)
    // DotProduct fold over min(len(sv), len(cv)) elements of the slice
    val n = math.min(hi - lo, c.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (v.isNullAt(lo + i)) Double.NaN else v.getDouble(lo + i)
      acc += xv * c(i)
      i += 1
    }
    dv + cc(ci) - 2.0 * acc
  }
}

object Codebook {
  /** dot(v[lo,hi), v[lo,hi)) — the slice's self dot, shared across the
    * candidate loop (Vec.sqDist evaluates it once per comparison pair,
    * but it is bit-identical across candidates, so hoisting is exact).
    */
  def selfDot(v: ArrayData, lo: Int, hi: Int): Double = {
    var acc = 0.0
    var i = lo
    while (i < hi) {
      val xv = if (v.isNullAt(i)) Double.NaN else v.getDouble(i)
      acc += xv * xv
      i += 1
    }
    acc
  }

  def dotA(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Build from (cell id, centroid vector) pairs; entries are sorted by
    * cell id ascending. Callers guarantee non-null vectors (null seed
    * vectors route to the join arm, whose null orderings are pinned).
    */
  def build(rows: Array[(Long, Array[Double])]): Codebook = {
    val sorted = rows.sortBy(_._1)
    new Codebook(sorted.map(_._1), sorted.map(_._2),
      sorted.map(r => dotA(r._2, r._2)))
  }
}

/** Per-subspace codebooks for [[PqEncode]]/[[NearestSubCell]]:
  * `subs(s)` holds subspace s's codebook. Subvector boundaries mirror
  * `ProductQuantize.subCodes`: `[floor(s*dim/nsub), floor((s+1)*dim/nsub))`
  * of the per-row dimensionality (the SQL `floor(sub * dim / nsub)` is
  * a double division of exact ints — bit-identical here for any real
  * array length).
  */
final class PqCodebooks(val subs: Array[Codebook]) extends Serializable {
  val nsub: Int = subs.length

  def lo(s: Int, dim: Int): Int =
    math.floor(s.toDouble * dim / nsub).toInt
  def hi(s: Int, dim: Int): Int =
    math.floor((s + 1).toDouble * dim / nsub).toInt

  /** nsub nearest-cell codes for one full code vector; a null vector
    * resolves to each subspace's lowest cell (the all-null-distance
    * tie). (Called from generated code.)
    */
  def encodeNullable(q: ArrayData): ArrayData = {
    if (q == null) return new GenericArrayData(subs.map(_.ids(0)))
    val dim = q.numElements()
    val out = new Array[Long](nsub)
    var s = 0
    while (s < nsub) {
      val l = lo(s, dim); val h = hi(s, dim)
      out(s) = subs(s).nearestRange(q, l, h, Codebook.selfDot(q, l, h))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Subspace argmin for an already-sliced subvector (the training
    * loop's per-(id, sub) row). (Called from generated code.)
    */
  def nearestSubNullable(sub: Int, sv: ArrayData): Long = {
    val cb = subs(sub)
    if (sv == null) cb.ids(0)
    else cb.nearestRange(sv, 0, sv.numElements(),
      Codebook.selfDot(sv, 0, sv.numElements()))
  }
}

/** `NearestCodebookCell(v)` — flat argmin cell id against one broadcast
  * [[Codebook]] (the kmeansCells per-iteration assignment). Null input
  * resolves like the join form's all-null-distance group: lowest cell.
  */
case class NearestCodebookCell(child: Expression, bc: Broadcast[Codebook])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_codebook_cell"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    bc.value.nearestNullable(
      if (v == null) null else v.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("cbBc", bc, classOf[Broadcast[_]].getName)
    val cbClass = classOf[Codebook].getName
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      final long ${ev.value} = (($cbClass) $bcRef.value())
        .nearestNullable(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(
      newChild: Expression): NearestCodebookCell = copy(child = newChild)
}

object NearestCodebookCell {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils
  def apply(v: Column, bc: Broadcast[Codebook]): Column =
    ExpressionUtils.column(NearestCodebookCell(
      ExpressionUtils.expression(v), bc))
}

/** `NearestSubCell(sub, sv)` — argmin cell id of subspace `sub`'s
  * codebook for an already-sliced subvector (the PQ training loop's
  * per-(id, sub) row assignment). Null subvector resolves to the
  * subspace's lowest cell (min_by's all-null-distance tie).
  */
case class NearestSubCell(left: Expression, right: Expression,
    bc: Broadcast[PqCodebooks])
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_sub_cell"
  override def eval(input: InternalRow): Any = {
    val s = left.eval(input).asInstanceOf[Int] // sub is generated, non-null
    val v = right.eval(input)
    bc.value.nearestSubNullable(s,
      if (v == null) null else v.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqBc", bc, classOf[Broadcast[_]].getName)
    val cbClass = classOf[PqCodebooks].getName
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = l.code + r.code + code"""
      final long ${ev.value} = (($cbClass) $bcRef.value())
        .nearestSubNullable(${l.value}, ${r.isNull} ? null : ${r.value});
      """, isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestSubCell =
    copy(left = newLeft, right = newRight)
}

object NearestSubCell {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils
  def apply(sub: Column, sv: Column, bc: Broadcast[PqCodebooks]): Column =
    ExpressionUtils.column(NearestSubCell(
      ExpressionUtils.expression(sub), ExpressionUtils.expression(sv), bc))
}

/** `PqEncode(q)` — all nsub subspace codes of one code vector as
  * array<long> (the search-time corpus encoding, replacing the long
  * (id, sub, cell) table + its joins). Null vector resolves to each
  * subspace's lowest cell, mirroring [[NearestSubCell]] on a null
  * slice.
  */
case class PqEncode(child: Expression, bc: Broadcast[PqCodebooks])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "pq_encode"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    bc.value.encodeNullable(
      if (v == null) null else v.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqBc", bc, classOf[Broadcast[_]].getName)
    val cbClass = classOf[PqCodebooks].getName
    val adClass = classOf[ArrayData].getName
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      final $adClass ${ev.value} = (($cbClass) $bcRef.value())
        .encodeNullable(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils
  def apply(q: Column, bc: Broadcast[PqCodebooks]): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(q), bc))
}

/** Broadcast ADC distance tables: d(qid, sub, cell) collected from the
  * Spark-evaluated distance table (so every float came from the same
  * plan the join form broadcasts), laid out per qid as one flat array
  * in (sub-major, codebook-position) order. A null d (a null query
  * vector's subvectors) is kept as a null slot: the fold result is
  * null, mirroring the join form's `element_at` sum over a null d.
  */
final class AdcTables(
    val ids: Array[Array[Long]],         // per-sub ascending cell ids
    val off: Array[Int],                 // per-sub flat offset
    val d: java.util.HashMap[Long, Array[Double]],
    val isNull: java.util.HashMap[Long, Array[Boolean]])
    extends Serializable {

  def pos(sub: Int, cell: Long): Int = {
    val i = java.util.Arrays.binarySearch(ids(sub), cell)
    if (i < 0) -1 else off(sub) + i
  }

  /** The sub-ordered left-fold lookup sum for one (qid, codes) pair —
    * `((d0+d1)+...)`, the join form's `element_at` reduce — or null
    * when any lookup is null / the qid has no table. (Called from
    * generated code; null = SQL null.)
    */
  def distance(qid: Long, codes: ArrayData): java.lang.Double = {
    if (codes == null) return null
    val arr = d.get(qid)
    if (arr == null) return null
    val na = isNull.get(qid)
    val nsub = ids.length
    if (codes.numElements() < nsub) return null
    var acc = 0.0
    var s = 0
    while (s < nsub) {
      val p = pos(s, codes.getLong(s))
      if (p < 0 || na(p)) return null
      if (s == 0) acc = arr(p) else acc += arr(p)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

object AdcTables {
  /** Build from collected (qid, sub, cell, d-or-null) rows. */
  def build(ids: Array[Array[Long]],
      rows: Iterator[(Long, Int, Long, java.lang.Double)]): AdcTables = {
    val off = new Array[Int](ids.length)
    var acc = 0
    var s = 0
    while (s < ids.length) { off(s) = acc; acc += ids(s).length; s += 1 }
    val d = new java.util.HashMap[Long, Array[Double]]()
    val nl = new java.util.HashMap[Long, Array[Boolean]]()
    val t = new AdcTables(ids, off, d, nl)
    rows.foreach { case (qid, sub, cell, dv) =>
      var arr = d.get(qid)
      if (arr == null) {
        arr = new Array[Double](acc)
        val na = new Array[Boolean](acc)
        java.util.Arrays.fill(na, true) // unseen slots read as null
        d.put(qid, arr); nl.put(qid, na)
      }
      val p = t.pos(sub, cell)
      if (p >= 0) {
        if (dv == null) nl.get(qid)(p) = true
        else { arr(p) = dv.doubleValue(); nl.get(qid)(p) = false }
      }
    }
    t
  }
}

/** `AdcDistance(qid, codes)` — the sub-ordered left-fold sum of the
  * query's broadcast ADC lookups for one encoded corpus vector (see
  * [[AdcTables.distance]]). Null when any lookup is null or the qid
  * has no table (an inner dt join would never have emitted such a
  * pair — [[graft.sim.ProductQuantize]] only feeds covered qids).
  */
case class AdcDistance(left: Expression, right: Expression,
    bc: Broadcast[AdcTables])
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_distance"
  override def eval(input: InternalRow): Any = {
    val q = left.eval(input)
    if (q == null) return null
    val c = right.eval(input)
    val r = bc.value.distance(q.asInstanceOf[Long],
      if (c == null) null else c.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("adcBc", bc, classOf[Broadcast[_]].getName)
    val tClass = classOf[AdcTables].getName
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("adc")
    ev.copy(code = l.code + r.code + code"""
      java.lang.Double $boxed = ${l.isNull} ? null
        : (($tClass) $bcRef.value()).distance(${l.value},
            ${r.isNull} ? null : ${r.value});
      final boolean ${ev.isNull} = ($boxed == null);
      final double ${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
      """)
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcDistance =
    copy(left = newLeft, right = newRight)
}

object AdcDistance {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils
  def apply(qid: Column, codes: Column, bc: Broadcast[AdcTables]): Column =
    ExpressionUtils.column(AdcDistance(
      ExpressionUtils.expression(qid), ExpressionUtils.expression(codes), bc))
}
