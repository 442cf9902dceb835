package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev helper: dump single queries to parquet with the same determinism
  * ordering Verify applies, for quick local DuckDB oracle iteration.
  * Usage: runMain graft.DumpQ <sfDir> <outDir> <query...>  */
object DumpQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "htmlspark.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.orderBy(df.columns.sorted.map(col).toIndexedSeq: _*)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"dumped $name")
    }
    spark.stop()
  }
}
