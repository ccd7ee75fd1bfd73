package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-provided parquet tables (TESTDATA.md).
  * One parquet file per table under /root/testdata/sf{0.001,0.01,0.1}.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two encodings across testdata generations:
      // TIMESTAMP(NANOS) and TIMESTAMP(MICROS, isAdjustedToUTC=false).
      // Follow the file, not an assumption: nanosAsLong surfaces a NANOS
      // column as LongType (and is a no-op for MICROS), then branch on the
      // dataType the scan actually produced.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          // nanos-as-long: truncate to micros — same truncation DuckDB
          // applies when casting its TIMESTAMP_NS to TIMESTAMP.
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // micros, isAdjustedToUTC=false → Spark infers TIMESTAMP_NTZ;
          // cast to session-tz TIMESTAMP (identity under the UTC session
          // timezone Verify/Bench pin) so downstream unix_timestamp/
          // date_trunc see the same type as before.
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
