package htmlspark.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Brute-force cosine is the correctness baseline; the LSH-bucketed variant
  * is the 100 TB path: random-hyperplane signatures shrink the candidate set
  * so the expensive dot products run on a small, bucket-colocated join.
  * Dot products use zip_with/aggregate higher-order functions — row-local,
  * no explode, no UDF.
  */
object AnnOps {
  import RelationalOps.table

  /** In-order double-precision dot product of two float vectors. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Vector sanity stats (SQL-oracle-able: integer outputs only). */
  def embedStats(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        min(size(col("embedding"))).cast("long").as("min_dim"),
        max(size(col("embedding"))).cast("long").as("max_dim"))

  /** Brute-force cosine top-k: first `nQueries` vectors against the whole
    * table. The query side is broadcast (it is tiny by construction) so the
    * big side never shuffles; top-k per query via ranking window over the
    * (small) scored set.
    */
  def cosineTopK(spark: SparkSession, dir: String,
                 nQueries: Int = 8, k: Int = 5): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Random-hyperplane LSH bucketing: `nPlanes` sign bits → bucket id.
    * Hyperplane components are deterministic pseudo-random values derived
    * from xxhash64(plane, dim) — no RNG, reproducible across runs/executors.
    * At scale: bucket once, write bucketed; queries probe only their bucket.
    */
  def lshBuckets(spark: SparkSession, dir: String,
                 nPlanes: Int = 12): DataFrame = {
    val planeComponent: (Column, Column) => Column = (p, d) =>
      (pmod(xxhash64(p, d), lit(2000001L)).cast("double") - 1000000.0) / 1000000.0
    val bucket = aggregate(
      sequence(lit(0), lit(nPlanes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, d) => x.cast("double") * planeComponent(p, d)),
          lit(0.0), (a, v) => a + v)
        when(proj > 0, acc.bitwiseOR(call_function("shiftleft", lit(1L), p))).otherwise(acc)
      })
    table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        bucket.as("bucket"))
  }

  /** LSH-accelerated ANN: score only within-bucket candidate pairs for the
    * query set, then exact cosine + top-k. The candidate join key is the
    * compact bucket id — the 100 TB shape.
    */
  def annLsh(spark: SparkSession, dir: String,
             nQueries: Int = 8, k: Int = 5): DataFrame = {
    val bucketed = lshBuckets(spark, dir)
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("bucket").as("qbucket"))
    val cands = bucketed.join(broadcast(queries),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }
}
