package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Vec

/** Symmetric per-vector int8 quantization for embedding columns — the
  * storage path for corpus-scale vector tables (4x smaller than
  * float32, 8x smaller than float64; dot products survive within
  * ~scale^2 error). `int8Stats` reports the round-trip fidelity a
  * pipeline gates on before switching its ANN index to the quantized
  * representation: the per-vector scale, reconstruction MSE, and the
  * cosine between the original and dequantized vector.
  *
  * Quantization is floor(x/scale + 0.5) clamped to [-127, 127] — plain
  * IEEE arithmetic rather than a rounding mode, so any engine
  * reproduces it exactly. All reductions are sequential dot products
  * (the codegen'd [[Vec.dot]]), and MSE/cosine come from dot identities
  * evaluated in a fixed association, keeping cross-engine hash parity.
  * Map-only: one projection over the vector table, no shuffle.
  */
object Quantize {

  private def quantize(v: Column, scale: Column): Column =
    transform(v, x =>
      greatest(lit(-127.0), least(lit(127.0), floor(x / scale + lit(0.5)))))

  /** (id, q): the int8 code vectors themselves (integer-valued
    * doubles in [-127, 127]; a zero vector codes to zeros) — the
    * representation [[graft.sim.Similarity.kmeansCells]] trains on.
    * Map-only like [[int8Stats]].
    */
  def int8Codes(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"),
      int8CodeCol(col(vecCol).cast("array<double>")).as("q"))

  /** The int8 code array of one array<double> column — [[int8Codes]]'
    * projection exposed as a column so composed operators (the r17
    * map-only IVF-PQ corpus side) can quantize in place instead of
    * re-joining the (id, q) table.
    *
    * r17: evaluated by the native
    * [[org.apache.spark.sql.graft.Int8Quantize]] kernel — the HOF
    * chain is CodegenFallback and CSE-excluded, so the Lloyd loops
    * paid an interpreted per-element evaluation per pass (its scaladoc
    * has the op-by-op exactness argument; [[int8CodeColHof]] is the
    * spec comparison arm).
    */
  private[graft] def int8CodeCol(v: Column): Column =
    org.apache.spark.sql.graft.Int8Quantize(v)

  /** The former Column-composed quantize chain — the Int8QuantizeSpec
    * comparison arm (bit-equality against the kernel).
    */
  private[graft] def int8CodeColHof(v: Column): Column = {
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0)
    when(scale === 0.0, transform(v, _ => lit(0.0)))
      .otherwise(quantize(v, scale))
  }

  /** (id, scale, mse, cos): per-vector int8 round-trip fidelity. A
    * zero vector has scale 0 and is defined to reconstruct exactly
    * (mse 0, cos 0 by the zero-norm guard).
    */
  def int8Stats(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val withQ = e
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))) / lit(127.0))
      .withColumn("d",
        when(col("scale") === 0.0, transform(col("v"), _ => lit(0.0)))
          .otherwise(transform(quantize(col("v"), col("scale")),
            q => q * col("scale"))))
    val vv = Vec.dot(col("v"), col("v"))
    val vd = Vec.dot(col("v"), col("d"))
    val dd = Vec.dot(col("d"), col("d"))
    withQ.select(col("id"), col("scale"),
      (((vv - lit(2.0) * vd) + dd) / size(col("v"))).as("mse"),
      when(vv === 0.0 || dd === 0.0, lit(0.0))
        .otherwise(vd / (sqrt(vv) * sqrt(dd))).as("cos"))
  }
}
