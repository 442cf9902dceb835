package htmlspark.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data text operators over the `documents` table.
  *
  * All row-local logic is expressed with native (codegen'd or higher-order)
  * SQL functions — no UDFs — so the scan stays inside WholeStageCodegen and
  * column pruning reaches the parquet reader. Pair-generating ops (MinHash
  * LSH) shuffle only compact signatures, never the document text.
  */
object TextOps {
  import RelationalOps.table

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * At 100 TB this is the canonical "hash-groupBy" dedup: the shuffle moves
    * only (fp, doc_id), not document bodies.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(md5(col("text").cast("binary")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"))

  /** Token / char / whitespace counting — native string fns only. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars2"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"),
        (length(col("text")) -
          length(regexp_replace(col("text"), lit(" "), lit(""))))
          .cast("long").as("n_spaces"))

  /** Heuristic language ID by stopword presence (n-gram-ish, deterministic). */
  def langGuess(spark: SparkSession, dir: String): DataFrame = {
    val t = lower(col("text"))
    val guess = when(t.contains(" the ") || t.contains(" and "), "en")
      .when(t.contains(" der ") || t.contains(" und "), "de")
      .when(t.contains(" le ") || t.contains(" les "), "fr")
      .otherwise("other")
    table(spark, dir, "documents")
      .select(guess.as("lang_guess"), col("lang"))
      .groupBy("lang_guess", "lang")
      .agg(count(lit(1)).as("n"))
  }

  /** Quality signals: punctuation / digit / uppercase counts (integers →
    * exact cross-engine). A real pipeline thresholds these for filtering.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    def nMatching(pattern: String): Column =
      (length(col("text")) -
        length(regexp_replace(col("text"), lit(pattern), lit(""))))
        .cast("long")
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        nMatching("[.,!?;:]").as("n_punct"),
        nMatching("[0-9]").as("n_digits"),
        nMatching("[A-Z]").as("n_upper"))
  }

  /** Content fingerprint (normalized md5 prefix) for cheap near-exact dedup. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        substring(md5(lower(col("text")).cast("binary")), 1, 16).as("fp16"))

  // ---------------------------------------------------------------------
  // MinHash + LSH near-duplicate detection.
  // shingles → per-permutation min-hash → band keys → bucket self-join on
  // compact keys only. The shuffle payload is (band_key, doc_id): ~24 bytes
  // per doc per band regardless of document size — this is what makes the
  // approach viable at 10^12 docs.
  // ---------------------------------------------------------------------

  private val NumPerm = 32
  private val BandSize = 4 // → 8 bands

  /** 5-char shingles of the lowercased text (higher-order fns, row-local). */
  private def shingleCol(k: Int): Column = {
    val t = lower(col("text"))
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
      i => t.substr(i, lit(k))))
  }

  /** MinHash signature: for permutation p, min over shingles of
    * xxhash64(shingle, p). xxhash64 is codegen'd; the signature is computed
    * entirely row-local (no explode → no row blowup).
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val shingles = shingleCol(5)
    val sig = transform(sequence(lit(0), lit(NumPerm - 1)),
      p => array_min(transform(col("shingles"), s => xxhash64(s, p))))
    table(spark, dir, "documents")
      .select(col("doc_id"), shingles.as("shingles"))
      .select(col("doc_id"), sig.as("sig"))
  }

  /** LSH banding: docs sharing any band of the signature are candidates.
    * Self-join on band key; bucket sizes bounded to defuse degenerate keys
    * (the skew story: one viral boilerplate page must not create an O(n²)
    * bucket).
    */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSignatures(spark, dir)
    val nBands = NumPerm / BandSize
    val bands = sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => xxhash64(concat_ws("_",
          b, slice(col("sig"), b * BandSize + 1, lit(BandSize)))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band_key") === col("b.band_key") &&
          col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash: 64-bit signature via per-token hash bit-majority, computed
    * row-local with aggregate/zip_with (no explode). Near-dups differ in
    * few bits; here we emit the signature + a 16-bit band for bucketing.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val tokens = array_distinct(
      filter(split(lower(col("text")), "[^a-z0-9]+", -1), t => length(t) > 0))
    val bitIdx = sequence(lit(0), lit(63))
    val counts = aggregate(
      col("tokens"),
      transform(bitIdx, _ => lit(0L)),
      (acc, t) => zip_with(acc,
        transform(bitIdx, b =>
          when(call_function("shiftright", xxhash64(t), b).bitwiseAND(1L) === 1L, 1L)
            .otherwise(-1L)),
        (x, y) => x + y))
    val sig = aggregate(
      zip_with(col("counts"), bitIdx,
        (c, b) => when(c > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
    table(spark, dir, "documents")
      .select(col("doc_id"), tokens.as("tokens"))
      .select(col("doc_id"), counts.as("counts"))
      .select(col("doc_id"), sig.as("simhash"))
      .withColumn("band16", col("simhash").bitwiseAND(0xFFFFL))
  }

  /** n-gram Jaccard similarity for candidate pairs (exact, on shingle sets).
    * Demonstrated on LSH candidates so the expensive set-intersection only
    * runs on the (tiny) candidate set, never all pairs.
    */
  def jaccardOnCandidates(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), shingleCol(5).as("sh"))
    val pairs = minhashLshPairs(spark, dir)
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }
}
