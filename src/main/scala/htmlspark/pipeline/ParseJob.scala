package htmlspark.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import htmlspark.encoding.EncodingSniffer
import htmlspark.extract.TextExtractor
import htmlspark.tree.HtmlParser
import java.sql.Timestamp

/** Flat, Catalyst-friendly output row of the extraction pipeline
  * (SURVEY.md §1.2). */
final case class ExtractedDoc(
    url: String,
    warc_ts: Timestamp,
    lang: String,
    text_extracted: String,
    charset: String,
    charset_source: String,
    n_bytes: Int,
    n_chars: Int,
    // element-node count of the parsed DOM (template contents included) —
    // the structural size metric SURVEY §1.2 promises next to the text
    n_nodes: Int,
    n_parse_errors: Int,
    // per-doc parse-error CODES (sorted, builder-capped at 64): the triage
    // column SURVEY §1.2 promises — "which 0.1% of the crawl trips
    // adoption-agency-fe-not-open?" needs codes, not counts (reference
    // counterpart: the ParserErrorEventArgs event channel,
    // Core/TreeBuilder.cs:171-192)
    error_codes: Seq[String],
    quirks_mode: String,
    restarted: Boolean,
    late_meta: Boolean,
    parse_ok: Boolean,
    error: String,
    parse_us: Long)

/** Per-partition lineage + metrics row (north rule: "per-partition lineage
  * + parse-error metrics"). Kept in sync with `ParseJob.metrics` by the
  * encoder: metrics() returns Dataset[PartitionMetrics], so a drifted
  * field fails at analysis time rather than silently. */
final case class PartitionMetrics(
    partition_id: Int,
    n_docs: Long,
    n_ok: Long,
    n_failed: Long,
    n_restarted: Long,
    n_late_meta: Long,
    n_error_docs: Long,
    sum_bytes: Long,
    sum_errors: Long,
    min_url: String,
    max_url: String)

/** The extraction pipeline: pages → (dedup latest) → skew-salted
  * repartition → per-row parse via typed Dataset map → extracted docs (+
  * per-partition metrics). The parse is a pure Array[Byte] ⇒ ExtractedDoc
  * function; everything around it stays declarative so Catalyst owns scan
  * pruning and the dedup window plan.
  */
object ParseJob {

  /** Pure per-row parse: sniff → decode → tokenize+tree-build → extract.
    * Bounded single restart when a meta-declared charset contradicts the
    * default (reference suspends mid-parse instead:
    * Core/Tokenizer.cs:2056-2059). Total: any byte soup yields a row. */
  def parsePage(p: Page): ExtractedDoc = parsePage(p, new HtmlParser.Engine)

  def parsePage(p: Page, engine: HtmlParser.Engine): ExtractedDoc = {
    val bytes = if (p.html == null) Array.emptyByteArray else p.html
    val t0 = System.nanoTime()
    try {
      var sniff = EncodingSniffer.sniff(bytes)
      var html = EncodingSniffer.decode(bytes, sniff)
      var result = engine.parse(html)
      var restarted = false
      var lateMeta = false
      if (sniff.source == EncodingSniffer.SourceDefault) {
        val declared = findMetaCharset(result.doc)
        // Meta-boundary metric (reference NotifyAboutMetaBoundary,
        // Core/Tokenizer.cs:675-678,419-421): a charset-bearing meta the
        // prescan did not see — i.e. it sits beyond the sniff window — is
        // flagged even when it agrees with the default and needs no
        // restart. (Deviation, FIXTURES.md §3: our boundary is the spec's
        // 1024-byte prescan window, not the reference's 512 bytes.)
        lateMeta = declared != null
        if (declared != null && declared != sniff.charset) {
          sniff = EncodingSniffer.Sniff(declared, "meta-in-parse", 0)
          html = EncodingSniffer.decode(bytes, sniff)
          result = engine.parse(html)
          restarted = true
        }
      }
      val text = TextExtractor.extract(result.doc)
      ExtractedDoc(
        url = p.url, warc_ts = p.warc_ts, lang = p.lang,
        text_extracted = text,
        charset = sniff.charset, charset_source = sniff.source,
        n_bytes = bytes.length, n_chars = text.length,
        n_nodes = htmlspark.tree.DomNode.countElements(result.doc),
        n_parse_errors = result.nErrors,
        error_codes = result.errorCodes.sorted,
        quirks_mode = result.quirksMode match {
          case 0 => "no-quirks"; case 1 => "limited-quirks"; case _ => "quirks"
        },
        restarted = restarted, late_meta = lateMeta, parse_ok = true,
        error = null,
        parse_us = (System.nanoTime() - t0) / 1000)
    } catch {
      case e: Throwable =>
        ExtractedDoc(p.url, p.warc_ts, p.lang, "", "", "", bytes.length, 0, 0,
          0, Nil, "", restarted = false, late_meta = false, parse_ok = false,
          error = s"${e.getClass.getSimpleName}: ${e.getMessage}",
          parse_us = (System.nanoTime() - t0) / 1000)
    }
  }

  /** Sniff → decode → parse with the same bounded restart parsePage
    * applies, returning the final DOM (the serialization face p17 needs
    * the tree, not the extracted row). Not used on the extraction hot
    * path — parsePage keeps its fused form. */
  def parseDomOnly(bytes0: Array[Byte],
                   engine: HtmlParser.Engine): htmlspark.tree.DomNode = {
    val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
    var sniff = EncodingSniffer.sniff(bytes)
    var result = engine.parse(EncodingSniffer.decode(bytes, sniff))
    if (sniff.source == EncodingSniffer.SourceDefault) {
      val declared = findMetaCharset(result.doc)
      if (declared != null && declared != sniff.charset)
        result = engine.parse(EncodingSniffer.decode(bytes,
          EncodingSniffer.Sniff(declared, "meta-in-parse", 0)))
    }
    result.doc
  }

  /** Element budget for the in-parse meta-charset walk: a contradicting
    * meta buried megabytes deep must NOT force a full re-decode + re-parse
    * (the reference bounds meta detection; the spec prescan stops at 1024
    * bytes). A genuine charset meta lives in <head>, always within the
    * first few dozen elements of document order.
    *
    * This budget is ALSO the recursion bound of the walk below — walk()
    * recurses only on elements, and every element visit decrements the
    * budget, so stack depth can never exceed MetaWalkBudget even on the
    * adversarially-deep class. Do not "fix" the recursion into an
    * unbounded walk without adding an explicit stack. */
  private val MetaWalkBudget = 512

  private def findMetaCharset(doc: htmlspark.tree.DomNode): String = {
    import htmlspark.tree.Dom
    var found: String = null
    var budget = MetaWalkBudget
    def walk(n: htmlspark.tree.DomNode): Unit = {
      if (found != null || budget <= 0 || n.children == null) return
      var i = 0
      while (i < n.children.length && found == null && budget > 0) {
        val c = n.children(i)
        if (c.kind == Dom.ELEMENT) {
          budget -= 1
          if (c.ns == Dom.NS_HTML && c.name == "meta" && c.attrs != null) {
            val cs = c.attrs.get("charset")
            if (cs != null) found = EncodingSniffer.normalizeLabel(cs)
            else {
              val he = c.attrs.get("http-equiv")
              val content = c.attrs.get("content")
              if (he != null && he.equalsIgnoreCase("content-type") && content != null) {
                val x = EncodingSniffer.extractCharsetFromContent(content)
                if (x != null) found = EncodingSniffer.normalizeLabel(x)
              }
            }
          }
          walk(c)
        }
        i += 1
      }
    }
    walk(doc)
    found
  }

  /** Dedup to the latest crawl per url (north-rule dedup).
    *
    * Shuffle-frugal shape: re-crawled urls are rare (~1%), so never shuffle
    * the 99% singleton payloads. Pass 1 finds duplicated urls with a
    * KEY-ONLY aggregation (map-side partial agg; shuffle carries ~40 B/row,
    * not the html blob). The dup-url set is then broadcast: singletons
    * stream through with NO shuffle, and only the duplicated rows pay the
    * per-url ranking window. At 10^12 rows the broadcast side is the dup
    * URL set, not the corpus — if it outgrows broadcast, swap the two
    * joins for bucketed ones; the payload-shuffle asymmetry still holds. */
  def dedupLatest(pages: Dataset[Page]): Dataset[Page] = {
    import pages.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val dupUrls = pages.groupBy($"url")
      .agg(count(lit(1)).as("n"))
      .filter($"n" > 1)
      .select($"url")
    val singletons = pages
      .join(broadcast(dupUrls), Seq("url"), "left_anti").as[Page]
    // Total-order tiebreak (xxhash64 of the payload) so ties in
    // (url, warc_ts) pick the same survivor on every run/engine.
    val w = Window.partitionBy($"url")
      .orderBy($"warc_ts".desc, xxhash64($"html").desc)
    val dedupedDups = pages
      .join(broadcast(dupUrls), Seq("url"), "left_semi")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn").as[Page]
    singletons.union(dedupedDups)
  }

  /** Fallback for when the dup-url set outgrows broadcast (possible at
    * 10^12 rows with a hostile crawl): same two-join shape with shuffle
    * joins. The anti/semi joins shuffle (url, payload) once; with a
    * bucketed-by-url table layout (IcebergishIO writes bucketed in prod)
    * both joins co-locate and the shuffle disappears entirely. */
  def dedupLatestNoBroadcast(pages: Dataset[Page]): Dataset[Page] = {
    import pages.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val dupUrls = pages.groupBy($"url")
      .agg(count(lit(1)).as("n"))
      .filter($"n" > 1)
      .select($"url")
    val singletons = pages.join(dupUrls, Seq("url"), "left_anti").as[Page]
    val w = Window.partitionBy($"url")
      .orderBy($"warc_ts".desc, xxhash64($"html").desc)
    val dedupedDups = pages.join(dupUrls, Seq("url"), "left_semi")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn").as[Page]
    singletons.union(dedupedDups)
  }

  /** The original full-shuffle variant, kept for A/B in benchmarks. */
  def dedupLatestWindowAll(pages: Dataset[Page]): Dataset[Page] = {
    import pages.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"url")
      .orderBy($"warc_ts".desc, xxhash64($"html").desc)
    pages.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn").as[Page]
  }

  /** Salt-count default: scale-adaptive (r6, guide §2.5) — 2× the
    * session's default parallelism instead of a constant tuned for
    * local[32]: on a 1000-core cluster a fixed 32 salts × 3 size buckets
    * caps the oversized-doc leg at 96 tasks no matter how many oversized
    * docs there are; deriving from the cluster keeps the skew leg's
    * key-space ahead of its task count everywhere. Floor of 32 keeps the
    * local bench exactly as before (local[32] → 64 ≥ 32). Routing-only:
    * salts change which partition a row lands in, never the row set. */
  private def defaultSalts(pages: Dataset[Page]): Int =
    math.max(pages.sparkSession.sparkContext.defaultParallelism * 2, 32)

  /** Skew-salted repartition: CPU cost tracks byte size and nesting, which
    * AQE cannot see (it balances shuffle bytes, and a 2 MB doc costs ~1000×
    * a 2 KB doc in the SAME byte-balanced partition). Route rows by
    * (size_bucket, salt) so pathological docs spread across tasks.
    * `salts <= 0` → scale-adaptive default (defaultSalts).
    */
  def saltBySize(pages: Dataset[Page], salts0: Int = -1,
                 threshold: Int = 65536): Dataset[Page] = {
    import pages.sparkSession.implicits._
    val salts = if (salts0 > 0) salts0 else defaultSalts(pages)
    // Only the skew classes pay the shuffle: ordinary docs (≤ threshold
    // bytes) stay where the scan put them; big/deep docs are hash-spread by
    // (size_bucket, salt). Parsing is order-independent, so the two legs
    // re-unite with a cheap union after the narrow split.
    val small = pages.filter(octet_length($"html") <= threshold)
    val big = pages.filter(octet_length($"html") > threshold)
      .withColumn("size_bucket",
        when(octet_length($"html") > 1000000, 3)
          .when(octet_length($"html") > 262144, 2)
          .otherwise(1))
      .withColumn("salt", pmod(xxhash64($"url"), lit(salts)))
      // hash repartition (not range): no sampling pass over the source
      .repartition(col("size_bucket"), col("salt"))
      .drop("size_bucket", "salt")
      .as[Page]
    small.union(big)
  }

  /** The parse stage: typed Dataset map with ONE parser engine per
    * partition — tokenizer/builder buffers grow to the largest doc in the
    * partition once, then every row parses allocation-lean (the DOM and
    * output strings are the only per-row garbage). */
  def parseAll(pages: Dataset[Page]): Dataset[ExtractedDoc] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      val engine = new HtmlParser.Engine
      it.map(p => parsePage(p, engine))
    }
  }

  /** Single-lineage variant of the salt: every row rides ONE hash
    * repartition keyed by (size_bucket, salt). More shuffled bytes than
    * saltBySize, but the source is evaluated exactly once.
    * `salts <= 0` → scale-adaptive default (defaultSalts). */
  def saltAll(pages: Dataset[Page], salts0: Int = -1): Dataset[Page] = {
    import pages.sparkSession.implicits._
    val salts = if (salts0 > 0) salts0 else defaultSalts(pages)
    pages
      .withColumn("size_bucket",
        when(octet_length($"html") > 1000000, 3)
          .when(octet_length($"html") > 262144, 2)
          .when(octet_length($"html") > 65536, 1)
          .otherwise(0))
      .withColumn("salt", pmod(xxhash64($"url"), lit(salts)))
      .repartition(col("size_bucket"), col("salt"))
      .drop("size_bucket", "salt")
      .as[Page]
  }

  /** Full pipeline: dedup → salt → parse.
    *
    * Two physical strategies for the same logical plan:
    *  - `rescan = true`: shuffle-frugal (dedupLatest + saltBySize) — the
    *    source is scanned up to 5×, but only ~1% of payload bytes ever
    *    shuffle. Right when the source is a columnar table on a cluster:
    *    scans are parallel and cheap, cross-node shuffle is the scarce
    *    resource (the 100 TB default).
    *  - `rescan = false`: single-lineage (window-all dedup + saltAll) — the
    *    source is read exactly once and all rows shuffle twice. Right when
    *    re-evaluating the source is expensive relative to shuffle (local
    *    bench: tmpfs shuffle is parallel memcpy).
    */
  def run(pages: Dataset[Page], strategy: String = "parse-first"): Dataset[ExtractedDoc] =
    strategy match {
      case "rescan" => parseAll(saltBySize(dedupLatest(pages)))
      case "shuffle" => parseAll(saltAll(dedupLatestWindowAll(pages)))
      case _ => runParseFirst(pages)
    }

  /** The (url, warc_ts) tiebreak value, as a row-local kernel: exactly
    * Spark's xxhash64(html) (seed 42 over the raw bytes — the catalyst
    * XXH64 the expression compiles to; XxHashTieSpec pins the equality),
    * computed INSIDE the parse map so the parse-first strategies need no
    * separate projection + tuple-encoder stage around the parse (r6: one
    * less per-row serialize/deserialize round-trip at any scale). Null
    * html returns the seed (42) — exactly what the expression does with a
    * null child — matching StreamingParse.htmlTie, which now delegates
    * here (one source of truth for the survivor tiebreak). */
  private[htmlspark] def tieOf(html: Array[Byte]): Long =
    if (html == null) 42L
    else org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      html, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      html.length, 42L)

  /** Default strategy: parse BEFORE the dedup shuffle.
    *
    * The html payload (~2.5 KB/doc) never shuffles for ordinary docs: the
    * scan→parse stages fuse into one narrow pipeline (selective salting
    * still spreads oversized docs first), and latest-crawl dedup runs on
    * the *extracted* rows (~0.5 KB) — a 5-6× smaller shuffle. Parsing the
    * ~1% stale duplicate crawls costs ~1% extra CPU, far cheaper than
    * shuffling 100% of raw bytes. Output is identical: the parse is pure,
    * so picking the latest row before or after parsing commutes. */
  def runParseFirst(pages: Dataset[Page]): Dataset[ExtractedDoc] = {
    import pages.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    // Tiebreak on xxhash64(html) — the SAME value the dedup-first
    // strategies order by — computed in the parse kernel (tieOf) and
    // carried through it, so all strategies pick the same survivor under
    // (url, warc_ts) ties (hashing text_extracted here would also leave
    // markup-only differences unresolved: identical text,
    // nondeterministic survivor).
    val parsed = saltBySize(pages).mapPartitions { it =>
      val engine = new HtmlParser.Engine
      it.map(p => (parsePage(p, engine), tieOf(p.html)))
    }.toDF("doc", "tie")
    val w = Window.partitionBy($"doc.url")
      .orderBy($"doc.warc_ts".desc, $"tie".desc)
    parsed.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc.*").as[ExtractedDoc]
  }

  /** Narrow-shuffle survivor-stats variant of runParseFirst (r6, guide
    * §2.3/§8): when the consumer only needs per-survivor (n_bytes,
    * parse_ok) — the throughput face — the dedup decision needs just
    * (url, warc_ts, tie) and the payload just those two stats, so the
    * post-parse exchange carries ~40 B/row instead of the full extracted
    * row (~0.5 KB, text included): a 10×+ smaller shuffle at any scale.
    * The survivor per url is the (warc_ts, tie)-lexicographic-max row —
    * exactly the row runParseFirst's rank-1 window picks (row_number over
    * (warc_ts desc, tie desc)) — so the stats are identical; expressing it
    * as max_by additionally enables map-side partial aggregation (plan:
    * partial SortAggregate before the exchange — a sort remains because
    * the struct agg buffer is sort-based, but it runs pre-shuffle and the
    * exchange carries one candidate per (map partition, url)). */
  def runParseFirstStats(pages: Dataset[Page]): DataFrame = {
    import pages.sparkSession.implicits._
    val parsed = saltBySize(pages).mapPartitions { it =>
      val engine = new HtmlParser.Engine
      it.map { p =>
        val tie = tieOf(p.html)
        val d = parsePage(p, engine)
        (d.url, d.warc_ts, tie, d.n_bytes, d.parse_ok)
      }
    }.toDF("url", "warc_ts", "tie", "n_bytes", "parse_ok")
    parsed.groupBy("url")
      .agg(max_by(struct($"n_bytes", $"parse_ok"),
        struct($"warc_ts", $"tie")).as("s"))
      .select($"url", $"s.n_bytes".as("n_bytes"),
        $"s.parse_ok".as("parse_ok"))
  }

  /** Per-partition lineage/metrics over an extracted Dataset (second,
    * cheap aggregation pass — partial aggregation map-side). */
  def metrics(docs: Dataset[ExtractedDoc]): Dataset[PartitionMetrics] = {
    import docs.sparkSession.implicits._
    docs.groupBy(spark_partition_id().as("partition_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("parse_ok"), 1L).otherwise(0L)).as("n_ok"),
        sum(when(col("parse_ok"), 0L).otherwise(1L)).as("n_failed"),
        sum(when(col("restarted"), 1L).otherwise(0L)).as("n_restarted"),
        sum(when(col("late_meta"), 1L).otherwise(0L)).as("n_late_meta"),
        sum(when(col("n_parse_errors") > 0, 1L).otherwise(0L))
          .as("n_error_docs"),
        sum(col("n_bytes").cast("long")).as("sum_bytes"),
        sum(col("n_parse_errors").cast("long")).as("sum_errors"),
        min(col("url")).as("min_url"),
        max(col("url")).as("max_url"))
      .as[PartitionMetrics]
  }
}
