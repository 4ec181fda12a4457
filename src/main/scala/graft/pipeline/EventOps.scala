package graft.pipeline

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-pipeline operators beyond the reference's surface: the
  * session/as-of/rollup shapes every large event store needs.
  *
  * Scale: all three are single-shuffle plans — sessionize and as-of
  * partition by user (window functions over per-user event order),
  * rollup is one hash aggregation with grouping sets (partial agg
  * map-side). Per-user state never leaves one task.
  */
object EventOps {

  /** Session gap threshold in microseconds (30 min). */
  val SessionGapUs = 1800000000L

  /** Gap-based sessionization: a new session starts when a user is idle
    * past the gap. One window shuffle on user_id; the cumulative-sum
    * session index is the standard two-window formulation. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        Num.roundEps(sum(col("value")), 2).as("total_value"))
  }

  /** As-of (backward) join via the custom physical operator
    * (plans/AsofJoin — logical node + strategy + merge-scan SparkPlan,
    * extension-ladder rung (c)): each purchase picks up the value of
    * the same user's most recent strictly-prior click. One hash
    * Exchange per side on user_id and a streaming per-partition merge
    * with O(1) state — the same total shuffle volume as the windowed
    * formulation below (which shuffles clicks+purchases as one
    * stream), without buffering window frames. AsofJoinSpec asserts
    * both formulations agree row-for-row. */
  def asofClickExec(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"), col("value").as("click_value"))
    graft.plans.AsofJoin.asof(purchases, clicks,
      leftKey = "user_id", rightKey = "c_user",
      leftTime = "ts", rightTime = "c_ts",
      rightTieBreak = Seq("click_id"), strict = true)
      .select(col("event_id"), col("user_id"),
        Num.roundEps(col("value"), 2).as("value"),
        Num.roundEps(col("click_value"), 2).as("last_click_value"))
  }

  /** The windowed as-of formulation (union + IGNORE NULLS last_value
    * over an unbounded-to--1 frame) — no join at all, one shuffle of
    * the combined stream on user_id. The better plan when both sides
    * already live in one table; the custom operator above is the
    * general two-table case. */
  def asofClick(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("last_click_value",
        last(when(col("event_type") === "click", col("value")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        Num.roundEps(col("value"), 2).as("value"),
        Num.roundEps(col("last_click_value"), 2).as("last_click_value"))
  }

  /** Multi-granularity rollup (day, hour) with grouping sets. */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .rollup(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        hour(col("ts")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n_events"),
        Num.roundEps(sum(col("value")), 2).as("total_value"))

  /** Heavy hitters: top-10 users per dataset by event count, via the
    * bounded-heap TopKAgg — O(k) state per group with map-side combine,
    * versus a row_number window that shuffle-sorts every (dataset, user)
    * count at scale. */
  def topkUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(graft.functions.TopK.top_k(col("cnt").cast("double"),
        col("user_id"), 10).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("r0", "e")))
      .select(col("event_type"), (col("r0") + 1).cast("long").as("rank"),
        col("e.id").as("user_id"), col("e.score").cast("long").as("cnt"))

  /** Attribution lookback window in days. */
  val AttrWindowDays = 3L

  /** Attribution-window RANGE JOIN: every purchase collects the same
    * user's clicks strictly inside its trailing AttrWindowDays window
    * (click count + summed click value per purchase) — the "all events
    * within Δt" companion to the as-of join's "latest event before".
    *
    * Scale: a plain equi-join on user_id with the time predicate as a
    * post-filter lets one hot user cross-product its entire history;
    * BANDING bounds the blow-up by time instead: both sides key on
    * (user_id, floor(µs / W)) and each click is replicated to its own
    * and the following band, so any (purchase, click) pair within W
    * shares exactly one band key and every candidate pair is at most
    * 2W apart — the standard bucketed-range-join shape. Replication
    * factor is exactly 2; the final window predicate drops the
    * overshoot. One shuffle per side on the band key. */
  def attrWindow(spark: SparkSession, dir: String): DataFrame = {
    val wUs = AttrWindowDays * 86400L * 1000000L
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"), col("value"))
      .withColumn("bkt", floor(col("p_us") / wUs).cast("long"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"), col("value").as("c_value"))
      .withColumn("bkt", explode(array(
        floor(col("c_us") / wUs).cast("long"),
        floor(col("c_us") / wUs).cast("long") + 1)))
    p.join(c,
        p("user_id") === c("c_user") && p("bkt") === c("bkt") &&
          c("c_us") < p("p_us") && c("c_us") > p("p_us") - wUs, "left")
      .groupBy(col("event_id"), col("user_id"), col("value"))
      .agg(count(col("c_us")).as("n_clicks"),
        Num.roundEps(coalesce(sum(col("c_value")), lit(0.0)), 2).as("attr_value"))
      .select(col("event_id"), col("user_id"),
        Num.roundEps(col("value"), 2).as("value"),
        col("n_clicks"), col("attr_value"))
  }

  /** Cohort retention: users grouped by first-activity day, counted per
    * day-offset of return — the engagement matrix every event store
    * derives. Two hash aggregations (first-day per user, then the
    * cohort matrix) — both partial-agg map-side, shuffles on user_id
    * then (cohort, offset); no window, no self-join. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val firsts = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .join(firsts, "user_id")
      .groupBy(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Ordered conversion funnel view → click → purchase: a user reaches
    * stage k+1 only with an event strictly after their stage-k time
    * (first view, first click after that view, first purchase after
    * that click). One shuffle on user_id: the three stage times are
    * unordered window aggregates over the same user partition (no sort,
    * no self-join — the naive formulation is three joins of the event
    * table with itself), then a global 1-row agg reshaped to one row
    * per stage. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val staged = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("tv", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("tc", min(when(col("event_type") === "click" &&
        col("ts") > col("tv"), col("ts"))).over(w))
      .withColumn("tp", min(when(col("event_type") === "purchase" &&
        col("ts") > col("tc"), col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("tv")).as("tv"), max(col("tc")).as("tc"), max(col("tp")).as("tp"))
    staged
      .agg(count(col("tv")).as("n_view"), count(col("tc")).as("n_click"),
        count(col("tp")).as("n_purchase"))
      .select(expr(
        """stack(3,
          |  1L, 'view', n_view,
          |  2L, 'click', n_click,
          |  3L, 'purchase', n_purchase) AS (stage_idx, stage, n_users)"""
          .stripMargin))
  }

  val oracles: Map[String, String] = Map(
    // events are µs-aligned (verified: zero sub-µs components in the
    // corpus), so the engine's µs arithmetic and the oracle's
    // ns-precision interval comparison agree on every boundary
    "events_attr_window" ->
      s"""WITH p AS (
         |  SELECT event_id, user_id, ts, value
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (
         |  SELECT user_id, ts AS c_ts, value AS c_value
         |  FROM events WHERE event_type = 'click')
         |SELECT p.event_id, p.user_id,
         |  round((p.value) + 1e-5, 2) AS value,
         |  count(c.c_ts) AS n_clicks,
         |  round(coalesce(sum(c.c_value), 0) + 1e-5, 2) AS attr_value
         |FROM p LEFT JOIN c ON c.user_id = p.user_id
         |  AND c.c_ts < p.ts AND c.c_ts > p.ts - INTERVAL $AttrWindowDays DAY
         |GROUP BY p.event_id, p.user_id, p.value""".stripMargin,
    "events_funnel" ->
      """WITH s AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS tv
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(ts) AS tc FROM events e JOIN s USING (user_id)
        |  WHERE event_type = 'click' AND ts > tv GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(ts) AS tp FROM events e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > tc GROUP BY e.user_id),
        |agg AS (
        |  SELECT count(tv) AS n_view,
        |    (SELECT count(*) FROM c) AS n_click,
        |    (SELECT count(*) FROM p) AS n_purchase
        |  FROM s)
        |SELECT CAST(t.i AS BIGINT) AS stage_idx,
        |  CASE t.i WHEN 1 THEN 'view' WHEN 2 THEN 'click' ELSE 'purchase' END AS stage,
        |  CASE t.i WHEN 1 THEN n_view WHEN 2 THEN n_click ELSE n_purchase END AS n_users
        |FROM agg, generate_series(1, 3) t(i)""".stripMargin,
    "events_retention" ->
      """WITH firsts AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort,
        |  CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM activity a JOIN firsts f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "events_topk_users" ->
      """SELECT event_type, rank, user_id, cnt FROM (
        |  SELECT event_type, user_id, count(*) AS cnt,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY count(*) DESC, user_id) AS BIGINT) AS rank
        |  FROM events GROUP BY event_type, user_id)
        |WHERE rank <= 10""".stripMargin,
    "events_sessionize" ->
      s"""WITH t AS (
         |  SELECT user_id, ts, event_id, value,
         |    epoch_ns(ts) // 1000 AS us,
         |    lag(epoch_ns(ts) // 1000) OVER
         |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM events),
         |s AS (
         |  SELECT user_id, ts, event_id, value,
         |    CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > $SessionGapUs
         |        THEN 1 ELSE 0 END) OVER
         |      (PARTITION BY user_id ORDER BY ts, event_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM t)
         |SELECT user_id, session_idx,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |  count(*) AS n_events,
         |  round((sum(value)) + 1e-5, 2) AS total_value
         |FROM s GROUP BY user_id, session_idx""".stripMargin,
    // true as-of semantics, matching AsofJoinExec exactly: the click
    // with the greatest (c_ts, click_id) among c_ts STRICTLY before the
    // purchase ts. (The previous windowed ROWS-frame formulation counted
    // an equal-timestamp click with a smaller event_id as "prior" —
    // a latent divergence whenever a user clicks and purchases in the
    // same microsecond.)
    "events_asof_click" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, ts AS c_ts, value AS click_value
        |  FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.event_id, p.user_id, p.value, c.click_value,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY c.c_ts DESC, c.click_id DESC) AS rn
        |  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.c_ts < p.ts)
        |SELECT event_id, user_id, round((value) + 1e-5, 2) AS value,
        |  round((click_value) + 1e-5, 2) AS last_click_value
        |FROM j WHERE rn = 1""".stripMargin,
    "events_hourly_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(extract(hour FROM ts) AS BIGINT) AS hour,
        |  count(*) AS n_events,
        |  round((sum(value)) + 1e-5, 2) AS total_value
        |FROM events GROUP BY ROLLUP (day, hour)""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_sessionize" -> (sessionize _),
    "events_asof_click" -> (asofClickExec _),
    "events_hourly_rollup" -> (hourlyRollup _),
    "events_topk_users" -> (topkUsers _),
    "events_retention" -> (retention _),
    "events_funnel" -> (funnel _),
    "events_attr_window" -> (attrWindow _)
  )
}
