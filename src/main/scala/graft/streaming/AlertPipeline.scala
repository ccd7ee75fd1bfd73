package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming execution of an enrichment pipeline (SURVEY.md §2.6).
  *
  * The reference contains no readStream/writeStream itself — its broker
  * runs the science modules inside Structured Streaming micro-batches,
  * and all history travels *inside* each alert packet (prv_candidates),
  * so the pipeline is stateless: no watermark, no cross-batch state.
  * That makes the streaming wrapper exactly `foreachBatch(enrich)`.
  *
  * A module is `DataFrame => DataFrame` appending columns (the
  * reference's universal contract, SURVEY.md §1.1); `Pipeline` composes
  * them in dependency order (SURVEY.md §3 module DAG).
  */
object AlertPipeline {

  type Module = DataFrame => DataFrame

  /** Compose modules left-to-right. */
  def pipeline(modules: Module*): Module =
    df => modules.foldLeft(df)((d, m) => m(d))

  /** Wrap a batch pipeline for a streaming source: each micro-batch is
    * enriched independently and handed to `sink`.
    */
  def streamingWriter(stream: DataFrame, enrich: Module,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) => sink(enrich(batch), id) }

  /** Convenience: run the enrichment over a file-based stream until all
    * available data is processed (local smoke / tests).
    */
  def runOnce(stream: DataFrame, enrich: Module,
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val q = streamingWriter(stream, enrich, sink,
      Trigger.AvailableNow()).start()
    q
  }
}
