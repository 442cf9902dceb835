package htmlspark.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Job-level relational operators induced by the north rule (SURVEY.md §2.7).
  *
  * Every operator here is declared through the DataFrame API so Catalyst owns
  * the physical strategy (pushdown, pruning, join selection, partial agg, AQE).
  * The HTML engine itself (htmlspark.tokenizer / htmlspark.tree) never appears
  * here — these are the operators *around* the per-row parse.
  *
  * Determinism notes (the driver hash-compares against DuckDB):
  *  - double aggregates are cast to DECIMAL(18,4) pre-sum → exact, engine-agnostic
  *  - every top-k / window has a total-order tiebreak
  *  - integer outputs are cast to BIGINT so both engines agree on width
  */
object RelationalOps {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def dec(c: String) = col(c).cast("decimal(18,4)")

  /** Filter pushdown + partial/final hash aggregation over the fact table. */
  def aggPushdown(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1995-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_price"),
        count(lit(1)).as("n_rows"))

  /** Star join: fact × three small dims. The dims are pre-joined and
    * projected to (c_custkey, r_name) BEFORE the broadcast (r6, guide
    * §3.1/§2.3): the fact side pays ONE hash-probe per row against one
    * compact relation instead of three chained broadcast joins, and the
    * broadcast ships two columns instead of every dim column. Identical
    * result — all joins are inner equi-joins with no intervening filters. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val dims = table(spark, dir, "customer")
      .join(table(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(table(spark, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    table(spark, dir, "orders")
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("r_name")
      .agg(sum(dec("o_totalprice")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  /** Latest-crawl-per-url pattern (north rule dedup) on the events table:
    * keep the newest event per user. Expressed as max_by over the
    * total-order key (ts, event_id) rather than a rank-1 window (r6, guide
    * §2.3 "aggregate before you shuffle"): the lexicographic struct max IS
    * the row row_number() over (ts desc, event_id desc) ranks first, but
    * the aggregate form gets map-side partial aggregation — the exchange
    * ships one candidate per (map partition, user) instead of every event
    * row. Physical shape (plans/r06/q03_dedup_latest_after.txt): partial
    * SortAggregate → Exchange → final SortAggregate — the struct agg
    * buffer keeps the aggregate sort-based, so a sort remains, but it
    * runs BEFORE the shuffle on local rows and the exchange shrinks to
    * ~n_users per map partition. Identical rows (q03 oracle MATCH). */
  def dedupLatest(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy("user_id")
      .agg(max_by(struct(col("event_id"), col("ts")),
        struct(col("ts"), col("event_id"))).as("s"))
      .select(col("user_id"), col("s.event_id").as("latest_event"),
        col("s.ts").as("latest_ts"))

  /** Checkpoint/resume shape: incoming minus already-committed via LEFT ANTI
    * join (preferred over EXCEPT — no shuffle-dedup of the payload side).
    * Here: events whose user has no customer row.
    */
  def resumeAntiJoin(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .join(broadcast(table(spark, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")),
        col("user_id") === col("c_custkey"), "left_anti")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))

  /** Top-k largest docs (skew diagnosis) → TakeOrderedAndProject, no full sort. */
  def topkLargest(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
      .limit(10)

  /** Set op: ids seen in events but not present as customers (EXCEPT). */
  def setExcept(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(col("user_id")).distinct()
      .except(table(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").cast("long").as("user_id")))

  /** Sessionize events: a new session starts after a >30 min gap.
    * Two windows over the same (user_id, ts) partitioning → single shuffle.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    table(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("is_new")).as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  /** Histogram of event values by day (date/time fns + two-level agg). */
  def dailyStats(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec("value")).cast("double").as("sum_value"))
}
