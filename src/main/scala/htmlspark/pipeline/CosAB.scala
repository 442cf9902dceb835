package htmlspark.pipeline
object CosAB {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "htmlspark.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    emb.count()
    val q = emb.filter(col("vec_id") < 64)
      .select(col("embedding").as("qv")).cache(); q.count()
    val joined = emb.crossJoin(broadcast(q))
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        joined.select(sum(c)).collect()
        println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    time("hof   ", AnnOps.cosineHof(col("qv"), col("embedding")))
    time("native", call_function("cosine_sim", col("qv"), col("embedding")))
    spark.stop()
  }
}
