package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics main for the optimization round. */
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
    import htmlspark.pipeline.AnnOps
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    // slim q25 prototype: key-only pair generation, dedup, then ONE fetch
    // + score per distinct pair
    def slimNearDup(n: Int = 25): org.apache.spark.sql.DataFrame = {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val slim = AnnOps.lshBucketsSlim(spark, sfDir)
      val sizes = slim.groupBy("table_id", "bucket")
        .agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > 1 && col("bucket_n") <= AnnOps.MaxEmbedBucket)
      val bounded = slim.join(sizes.select("table_id", "bucket"),
        Seq("table_id", "bucket"))
      val a = bounded.select(col("table_id"), col("bucket"),
        col("vec_id").as("vec_a"))
      val b = bounded.select(col("table_id"), col("bucket"),
        col("vec_id").as("vec_b"))
      val pairs = a.join(b, Seq("table_id", "bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      pairs
        .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
        .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
        .select(col("vec_a"), col("vec_b"),
          call_function("cosine_sim", col("ea"), col("eb")).as("cos"))
        .filter(!isnan(col("cos")))
        .orderBy(col("cos").desc, col("vec_a").asc, col("vec_b").asc)
        .limit(n)
        .select(col("vec_a"), col("vec_b"))
    }
    // warm the bucket caches once outside the A/B
    AnnOps.lshBuckets(spark, sfDir).count()
    AnnOps.lshBucketsSlim(spark, sfDir).count()
    val fatRows = AnnOps.embedNearDup(spark, sfDir).collect().map(_.toString).sorted
    val slimRows = slimNearDup().collect().map(_.toString).sorted
    println(s"PROBE q25_equal ${fatRows.sameElements(slimRows)}")
    time("q25_fat_cold2")(AnnOps.embedNearDup(spark, sfDir).count())
    time("q25_slim_cold2")(slimNearDup().count())
    (1 to 3).foreach { i =>
      time(s"q25_fat_$i")(AnnOps.embedNearDup(spark, sfDir).count())
      time(s"q25_slim_$i")(slimNearDup().count())
    }
    htmlspark.pipeline.TextOps.clearPlanCache(spark)
    spark.stop()
  }
}
