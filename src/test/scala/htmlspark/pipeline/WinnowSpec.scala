package htmlspark.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Winnowing fingerprint audits: the kernel's shared-substring guarantee
  * (Schleimer et al.: any match of length >= w + k - 1 produces at least
  * one shared fingerprint) and the distributed operator against an in-JVM
  * recomputation. */
class WinnowSpec extends AnyFunSuite {

  private val K = 8
  private val W = 16
  private val Guarantee = W + K - 1

  private def rnd(seed: Long, n: Int, alphabet: String): String = {
    val sb = new StringBuilder(n)
    var z = seed
    (0 until n).foreach { _ =>
      z = z * 6364136223846793005L + 1442695040888963407L
      sb += alphabet(((z >>> 33) % alphabet.length).toInt)
    }
    sb.toString
  }

  test("shared substring of guarantee length yields a shared fingerprint") {
    val shared = rnd(7, Guarantee, "abcdefgh")
    (0 until 50).foreach { s =>
      val a = rnd(s * 2 + 1, 300, "abcdefgh") + shared + rnd(s * 3 + 1, 300, "abcdefgh")
      val b = rnd(s * 5 + 2, 400, "abcdefgh") + shared + rnd(s * 7 + 3, 100, "abcdefgh")
      val fa = Sketches.winnow(a, K, W).toSet
      val fb = Sketches.winnow(b, K, W).toSet
      assert((fa & fb).nonEmpty, s"seed $s: guarantee violated")
    }
  }

  test("disjoint-alphabet documents share no fingerprints") {
    (0 until 50).foreach { s =>
      val fa = Sketches.winnow(rnd(s, 500, "abcdefgh"), K, W).toSet
      val fb = Sketches.winnow(rnd(s + 99, 500, "ijklmnop"), K, W).toSet
      assert((fa & fb).isEmpty, s"seed $s: spurious shared fingerprint")
    }
  }

  test("winnow density: fingerprint count ~ 2·len/(w+1), never exhaustive") {
    val t = rnd(42, 4000, "abcdefghij")
    val n = Sketches.winnow(t, K, W).length
    val windows = t.length - K + 1 - W + 1
    assert(n < windows / 2, s"density too high: $n fps for $windows windows")
    assert(n > windows / (W + 1) / 2, s"density too low: $n")
  }

  test("sub-k text fingerprints derive from content, not length (ADVICE r2)") {
    val a = Sketches.winnow("short", K, W)
    val b = Sketches.winnow("other", K, W) // same length, different content
    val c = Sketches.winnow("SHORT", K, W) // same content modulo case
    assert(a.length == 1 && b.length == 1)
    assert(a(0) != b(0), "equal-length short docs must NOT share a fp")
    assert(a(0) == c(0), "case-insensitive like the k-gram hash")
    assert(Sketches.winnow("", K, W).isEmpty, "empty text → no fingerprints")
  }

  test("distributed winnowPairs matches in-JVM recomputation") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("winnow-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sets = docs.map { case (id, t) => (id, Sketches.winnow(t, 12, 24).toSet) }
    val expected = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      shared = (sets(i)._2 & sets(j)._2).size
      if shared >= 2
    } yield {
      val (a, b) = (sets(i)._1, sets(j)._1)
      (math.min(a, b), math.max(a, b)) -> shared.toLong
    }).toMap
    val got = TextOps.winnowPairs(spark, dir, minShared = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // the operator drops fps above WinnowMaxDf=64; this corpus has fewer
    // docs than the cap, so no fp can exceed it → sets must agree exactly
    assert(got == expected,
      s"pair sets differ: only-got=${(got.keySet -- expected.keySet).take(3)} " +
        s"only-expected=${(expected.keySet -- got.keySet).take(3)}")
    assert(expected.nonEmpty, "fixture has no partial-dup pairs — vacuous")

    // stats face over the same persisted fp subplan: one row whose counts
    // reconcile with the in-JVM fingerprint multiset
    val stats = TextOps.winnowFpStats(spark, dir).collect()(0)
    val dfCounts = sets.iterator.flatMap(_._2).toSeq.groupBy(identity)
      .view.mapValues(_.size).toMap
    assert(stats.getAs[Long]("n_fps") == dfCounts.size)
    assert(stats.getAs[Long]("n_candidate_fps") ==
      dfCounts.valuesIterator.count(c => c > 1 && c <= TextOps.WinnowMaxDf))
    assert(stats.getAs[Long]("n_dropped_fps") ==
      dfCounts.valuesIterator.count(_ > TextOps.WinnowMaxDf))
    assert(stats.getAs[Long]("max_fp_n") == dfCounts.valuesIterator.max)
  }
}
