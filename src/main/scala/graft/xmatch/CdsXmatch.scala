package graft.xmatch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remote catalog crossmatch (the reference's `cdsxmatch` family,
  * ztf/xmatch/processor.py:46-302): alerts are batched to an external
  * service (CDS xmatch at cdsxmatch.u-strasbg.fr in production), the
  * reply parsed, deduplicated to the closest match per alert, and the
  * requested columns appended with the Fail/Unknown sentinel contract:
  *
  *  - service unreachable -> "Fail" for every row of the batch
  *    (processor.py:151-153)
  *  - no match within radius -> "Unknown" (processor.py:190-195)
  *
  * The service is a trait so offline runs/tests inject a mock; the
  * production HTTP client implements `query` with the CSV POST.
  */
trait XmatchService extends Serializable {
  /** For each (id, ra, dec) return zero or more matches
    * (id, angDistArcsec, payload by requested column). A thrown
    * exception marks the whole batch failed.
    */
  def query(rows: Seq[(Long, Double, Double)], catalog: String,
      radiusArcsec: Double, cols: Seq[String]): Seq[(Long, Double, Map[String, String])]
}

/** Offline default: the service is unreachable; every alert gets the
  * Fail sentinel (the reference's behavior without network).
  */
object UnreachableXmatchService extends XmatchService {
  def query(rows: Seq[(Long, Double, Double)], catalog: String,
      radiusArcsec: Double, cols: Seq[String]): Seq[(Long, Double, Map[String, String])] =
    throw new java.io.IOException("no network access")
}

object CdsXmatch {

  /** Append `colsOut` from the closest remote match within
    * `distMaxArcsec`; executes the service call once per partition
    * (the reference's per-Arrow-batch POST, processor.py:136-149).
    */
  def xmatchCds(spark: SparkSession, df: DataFrame, service: XmatchService,
      catalogName: String, distMaxArcsec: Double = 1.0,
      idCol: String = "candid", raCol: String = "candidate.ra",
      decCol: String = "candidate.dec",
      colsOut: Seq[String] = Seq("main_type")): DataFrame = {
    import spark.implicits._

    val coords = df.select(col(idCol).cast("long").as("__id"),
      col(raCol).cast("double").as("__ra"), col(decCol).cast("double").as("__dec"))

    val matches = coords.mapPartitions { it =>
      val rows = it.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      if (rows.isEmpty) Iterator.empty
      else {
        val result: Seq[(Long, Double, Map[String, String])] =
          try service.query(rows, catalogName, distMaxArcsec, colsOut)
          catch {
            case _: Exception =>
              // whole-batch failure sentinel
              rows.map(r => (r._1, Double.NaN, colsOut.map(_ -> "Fail").toMap))
          }
        val matched = result.map(_._1).toSet
        val unmatched = rows.filterNot(r => matched.contains(r._1))
          .map(r => (r._1, Double.NaN, colsOut.map(_ -> "Unknown").toMap))
        (result ++ unmatched).iterator
      }
    }.toDF("__id", "__angDist", "__payload")

    // closest-match dedup (groupby-min angDist, processor.py:168)
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__angDist").asc_nulls_last)
    val best = matches.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((col("__id") +: colsOut.map(c =>
        element_at(col("__payload"), c).as(c))): _*)

    df.join(best, df(idCol) === best("__id"), "left")
      .drop("__id")
  }
}
