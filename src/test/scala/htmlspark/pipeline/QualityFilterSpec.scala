package htmlspark.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Pins every branch of the q28 quality filter on a constructed corpus —
  * the sf fixture's letter-heavy docs only exercise keep/too_short. */
class QualityFilterSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("quality-filter-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("each filter branch fires, in priority order") {
    import spark.implicits._
    val base = "word " * 50 // 250 chars, clean
    val docs = Seq(
      (0L, base, "keep"),
      (1L, "short text.", "too_short"),
      // 250 clean chars + 40 periods → punct 40/290 ≈ 13.8% > 10%
      (2L, base + "." * 40, "too_much_punct"),
      // 250 clean + 70 digits → digits 70/320 ≈ 21.9% > 20%
      (3L, base + "1" * 70, "too_many_digits"),
      // 250 clean + 120 uppercase → upper 120/370 ≈ 32.4% > 30%
      (4L, base + "A" * 120, "too_much_upper"),
      // priority: too_short wins over every ratio
      (5L, "!!!!!", "too_short"),
      // punct checked before digits when both exceed
      (6L, base + "." * 40 + "1" * 80, "too_much_punct"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_qf_").toString
    docs.map { case (id, t, _) => (id, t, "en", "synth", t.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.qualityFilter(spark, tmp)
      .as[(Long, String)].collect().toMap
    docs.foreach { case (id, _, want) =>
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
  }
}
