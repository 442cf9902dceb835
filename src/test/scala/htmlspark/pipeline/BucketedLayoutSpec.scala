package htmlspark.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Bucketed-by-url layout evidence (100 TB resume shape): with the corpus
  * and the committed table both bucketed on url, the resume anti-join
  * runs with ZERO Exchange — no payload bytes cross the network on a
  * cluster. Functional equivalence vs the broadcast path is asserted too. */
class BucketedLayoutSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("bucketed-layout-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("bucketed resume anti-join plans with no Exchange and matches the " +
       "broadcast path") {
    import spark.implicits._
    val pages = PagesGen.pages(spark, 300)
    val done = pages.filter(org.apache.spark.sql.functions
      .pmod(org.apache.spark.sql.functions.xxhash64($"url"),
        org.apache.spark.sql.functions.lit(2)) === 0)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a non-broadcast plan so bucketing (not broadcast) carries it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      IcebergishIO.writeBucketedByUrl(pages, "pages_bkt", buckets = 4)
      IcebergishIO.writeBucketedByUrl(done.select($"url", $"warc_ts"),
        "done_bkt", buckets = 4)

      val remaining =
        IcebergishIO.resumeFilterBucketed(spark, "pages_bkt", "done_bkt")
      val plan = remaining.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed anti-join must be shuffle-free; got plan:\n$plan")

      // equivalence vs the standard anti-join on the same data
      val expected = pages.join(done.select($"url"), Seq("url"), "left_anti")
        .select($"url").as[String].collect().sorted.toSeq
      val got = remaining.select($"url").as[String].collect().sorted.toSeq
      assert(got == expected)
      assert(got.nonEmpty && got.size < 300)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS pages_bkt")
      spark.sql("DROP TABLE IF EXISTS done_bkt")
    }
  }
}
