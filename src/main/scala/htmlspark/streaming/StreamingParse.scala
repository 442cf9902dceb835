package htmlspark.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import htmlspark.pipeline.{ExtractedDoc, Page, ParseJob}

/** Structured Streaming face of the extraction engine. The reference is a
  * batch corpus parser (SURVEY.md §2.7: no streaming semantics), but the
  * per-row engine is a pure function, so the SAME parse stage lifts onto a
  * streaming Dataset unchanged — `readStream` source → typed map →
  * watermarked windowed metrics → `writeStream` sink.
  */
object StreamingParse {

  /** The parse stage on a streaming Dataset[Page] — identical kernel to the
    * batch path (ParseJob.parsePage). */
  def parseStream(pages: Dataset[Page]): Dataset[ExtractedDoc] = {
    import pages.sparkSession.implicits._
    pages.map(ParseJob.parsePage)
  }

  /** Streaming url dedup bounded by the watermark: collapses source
    * RE-DELIVERIES (at-least-once transports) of the same url to one parse,
    * keeping the FIRST arrival — dropDuplicatesWithinWatermark semantics.
    * NOTE: this is deliberately NOT the batch latest-crawl rule; a genuine
    * re-crawl with newer content arriving inside the window is dropped
    * here and reconciled by the batch dedupLatest compaction downstream
    * (latest-wins in streaming would need flatMapGroupsWithState and
    * watermark-delayed emission). State is bounded (keys expire with the
    * watermark); at 10^12-url scale the state store hash-partitions by url
    * across executors — place this BEFORE the parse stage so duplicate
    * html bytes are dropped, not parsed. */
  def dedupStream(pages: Dataset[Page], lateness: String = "1 hour"): Dataset[Page] =
    pages
      .withWatermark("warc_ts", lateness)
      .dropDuplicatesWithinWatermark("url")

  /** Watermarked per-window parse metrics: 10-minute event-time windows on
    * warc_ts, 1-hour lateness tolerance. Append-mode-compatible (aggregate
    * keyed by the watermarked window). */
  def windowedMetrics(docs: Dataset[ExtractedDoc]): DataFrame =
    docs
      .withWatermark("warc_ts", "1 hour")
      .groupBy(window(col("warc_ts"), "10 minutes"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("parse_ok"), 0L).otherwise(1L)).as("n_failed"),
        sum(col("n_parse_errors").cast("long")).as("sum_parse_errors"),
        sum(col("n_bytes").cast("long")).as("sum_bytes"))
}
