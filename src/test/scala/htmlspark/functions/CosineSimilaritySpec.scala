package htmlspark.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The native codegen'd cosine expression vs the composed-built-ins
  * fallback: BITWISE equality is the contract (the driver oracles
  * hash-compare results whichever path a session takes). */
class CosineSimilaritySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // In the shared test JVM an earlier suite may already own the active
    // session — built WITHOUT the extension, and getOrCreate would hand
    // it back unmodified. Reuse it only if it has the function; otherwise
    // clear the active/default slots so getOrCreate constructs a fresh
    // session (same SparkContext) with the extension applied.
    val existing = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .filter(_.catalog.functionExists("cosine_sim"))
    val s = existing.getOrElse {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.builder()
        .master("local[2]")
        .appName("cosine-expr-spec")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("extension registers cosine_sim in the session") {
    assert(spark.catalog.functionExists("cosine_sim"))
  }

  test("native expression is bitwise-identical to the HOF fallback on the " +
       "fixture embeddings (all pairs vs vector 0)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q"))
    val both = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        call_function("cosine_sim", col("q"), col("embedding")).as("native"),
        htmlspark.pipeline.AnnOps.cosineHof(col("q"), col("embedding")).as("hof"))
      .as[(Long, Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (id, n, h) =>
      assert(java.lang.Double.doubleToRawLongBits(n) ==
        java.lang.Double.doubleToRawLongBits(h),
        s"vec $id: native=$n hof=$h (bitwise mismatch)")
    }
  }

  test("interpreted eval path agrees too (null-safe eval vs codegen)") {
    // force the interpreted path by evaluating the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f))
    val b = ArrayData.toArrayData(Array(4.0f, 5.0f, 6.0f))
    val e = CosineSimilarity(
      Literal(a, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)),
      Literal(b, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)))
    val got = e.eval(null).asInstanceOf[Double]
    val want = (4.0 + 10.0 + 18.0) /
      (math.sqrt(1.0 + 4.0 + 9.0) * math.sqrt(16.0 + 25.0 + 36.0))
    assert(got == want)
  }

  test("two instances in one projection codegen cleanly (fresh locals)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b", "c")
      .select(
        call_function("cosine_sim", col("a"), col("b")).as("x"),
        call_function("cosine_sim", col("a"), col("c")).as("y"))
    val r = df.as[(Double, Double)].collect()(0)
    assert(r._1 == 0.0)
    assert(math.abs(r._2 - 1.0 / math.sqrt(2.0)) < 1e-15)
  }

  test("null parity with the HOF fallback: length mismatch and null " +
       "elements yield NULL on both paths") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f)),
      (Array[java.lang.Float](1.0f, null), Array[java.lang.Float](3.0f, 4.0f)),
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f, 4.0f))
    ).toDF("a", "b")
      .select(
        call_function("cosine_sim", col("a"), col("b")).as("native"),
        htmlspark.pipeline.AnnOps.cosineHof(col("a"), col("b")).as("hof"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null-ness diverged: native=${r.get(0)} hof=${r.get(1)}")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
    assert(rows(0).isNullAt(0), "length mismatch must be NULL")
    assert(rows(1).isNullAt(0), "null element must be NULL")
    assert(!rows(2).isNullAt(0), "clean row must score")
  }

  test("randomized parity: 200 seeded random vector pairs agree bitwise") {
    import spark.implicits._
    // deterministic pseudo-random floats (no Random state): splitmix-ish
    def f(seed: Long): Float = {
      var z = seed + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      ((z >>> 16) % 2000 - 1000) / 1000.0f
    }
    val rows = (0 until 200).map { k =>
      (Array.tabulate(32)(d => f(k * 64 + d)),
        Array.tabulate(32)(d => f(k * 64 + 32 + d)))
    }
    val both = rows.toDF("a", "b")
      .select(
        call_function("cosine_sim", col("a"), col("b")).as("native"),
        htmlspark.pipeline.AnnOps.cosineHof(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToRawLongBits(n) ==
        java.lang.Double.doubleToRawLongBits(h))
    }
  }

  test("the expression stays inside whole-stage codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val df = emb.crossJoin(broadcast(q))
      .select(call_function("cosine_sim", col("q"), col("embedding")).as("c"))
    df.collect() // finalize the adaptive plan so codegen spans materialize
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" stage prefix is the WholeStageCodegen marker in the
    // compact plan rendering: the Project evaluating cosine_sim must
    // carry it (a codegen-incapable expression would break the span)
    assert("""\*\(\d+\) Project \[cosine_sim""".r.findFirstIn(plan).isDefined,
      plan.take(600))
  }
}
