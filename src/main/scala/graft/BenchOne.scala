package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "htmlspark.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = try SparkEntry.queries(name)(spark, sfDir).count()
              catch { case e: Throwable => System.err.println(s"$name FAILED: $e"); -1L }
      println(f"TIMING $name rows=$n secs=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
