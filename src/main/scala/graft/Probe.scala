package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics main for the optimization round — equivalence and
  * timing probes. Not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.extensions", "htmlspark.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import htmlspark.pipeline.{PagesGen, PagesQueries, ParseJob}

    // p05 equivalence: old full-row dedup path vs new narrow stats path
    val n = PagesQueries.nPages(spark, sfDir)
    val oldRow = ParseJob.run(PagesGen.pages(spark, n))
      .agg(count(lit(1)), sum(col("n_bytes").cast("long")),
        sum(when(col("parse_ok"), 1L).otherwise(0L))).collect()(0)
    val newRow = PagesQueries.throughput(spark, sfDir).collect()(0)
    println(s"PROBE p05_old ${oldRow}")
    println(s"PROBE p05_new ${newRow}")
    println(s"PROBE p05_equal ${oldRow.toString == newRow.toString}")

    // p03 values (must be the historical 1000/.../...)
    PagesQueries.resumeRoundTrip(spark, sfDir).collect()
      .foreach(r => println(s"PROBE p03 $r"))
    spark.stop()
  }
}
