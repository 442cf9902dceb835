package graft
import org.apache.spark.sql.SparkSession
object SlimAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "htmlspark.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import htmlspark.pipeline.AnnOps
    // equality first
    val fat = AnnOps.annLsh(spark, sfDir).collect().map(_.toString).sorted
    val slim = AnnOps.annLsh(spark, sfDir, slimIndex = true).collect().map(_.toString).sorted
    println(s"EQUAL ${fat.sameElements(slim)} fat=${fat.length} slim=${slim.length}")
    // timing: cold index build + 3 warm probes each (cache per variant)
    for (variant <- Seq("fat", "slim"); rep <- 1 to 4) {
      htmlspark.pipeline.TextOps.clearPlanCache(spark)
      val t0 = System.nanoTime()
      val n = AnnOps.annLsh(spark, sfDir, slimIndex = variant == "slim").count()
      val cold = (System.nanoTime()-t0)/1e9
      val t1 = System.nanoTime()
      AnnOps.annLsh(spark, sfDir, slimIndex = variant == "slim").count()
      val warm = (System.nanoTime()-t1)/1e9
      println(f"TIMING $variant rep=$rep rows=$n cold=$cold%.2f warm=$warm%.2f")
    }
    spark.stop()
  }
}
