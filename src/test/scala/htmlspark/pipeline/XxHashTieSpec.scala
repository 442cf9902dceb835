package htmlspark.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pins ParseJob.tieOf (the in-kernel dedup tiebreak, r6) to Spark's own
  * xxhash64(binary) expression: the parse-first strategies compute the tie
  * inside the parse map, and the dedup-first strategies order by the
  * xxhash64 COLUMN — a divergence would silently flip survivors under
  * (url, warc_ts) ties. Covers the generated corpus, adversarial byte
  * shapes (empty, single byte, block boundaries around XXH64's 8/4/1-byte
  * tail handling), and pseudo-random blobs. */
class XxHashTieSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("xxhash-tie-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def exprHash(bs: Seq[Array[Byte]]): Seq[Long] = {
    import spark.implicits._
    bs.toDF("b").select(xxhash64(col("b"))).as[Long].collect().toSeq
  }

  test("tieOf equals the xxhash64 expression on adversarial byte shapes") {
    val rnd = new scala.util.Random(0x7157)
    val shapes: Seq[Array[Byte]] =
      Seq(0, 1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 100, 1000)
        .map { n => val a = new Array[Byte](n); rnd.nextBytes(a); a } ++
        Seq(Array.emptyByteArray, Array[Byte](0), Array.fill[Byte](64)(-1))
    assert(exprHash(shapes) == shapes.map(ParseJob.tieOf))
  }

  test("tieOf equals the xxhash64 expression over the generated corpus") {
    val htmls = (0L until 256L).map(i => PagesGen.page(i).html)
    assert(exprHash(htmls) == htmls.map(ParseJob.tieOf))
  }

  test("tieOf on null html matches xxhash64's null-child semantics (seed)") {
    import spark.implicits._
    val exprNull = Seq(1).toDF("x")
      .select(xxhash64(lit(null).cast("binary"))).as[Long].collect()(0)
    assert(exprNull == ParseJob.tieOf(null))
  }
}
