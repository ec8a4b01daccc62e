package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Batch twins of the streaming operators over the `events` fixture —
  * tumbling-window aggregation and gap-based sessionization. The same
  * logic runs under Structured Streaming in graft.streaming (watermark
  * + window / mapGroupsWithState); these batch forms are what the
  * DuckDB oracle can check. Buckets are pure integer arithmetic on
  * epoch-millis so results are engine- and timezone-independent. */
object EventQueries {

  private val HourMs = 3600000L
  private val SessionGapMs = 1800000L // 30 min

  /** Epoch-millis from a timestamp-ish column, robust to how the
    * session maps parquet NANOS timestamps: LongType nanos (under
    * spark.sql.legacy.parquet.nanosAsLong) or TimestampType. Integer
    * `div` — ns magnitudes overflow double precision. */
  private[queries] def epochMsCol(df: DataFrame, name: String): org.apache.spark.sql.Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.LongType => expr(s"$name div 1000000")
      // NTZ values are wall-clock; the sessions pin timeZone=UTC, so the
      // cast reads them as UTC instants — matching DuckDB epoch_ms()
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_millis(col(name).cast(org.apache.spark.sql.types.TimestampType))
      case _ => unix_millis(col(name))
    }

  private def epochMs(df: DataFrame): org.apache.spark.sql.Column = epochMsCol(df, "ts")

  /** Tumbling 1-hour window: events + exact value sum per event_type. */
  def eventWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    ev.select(col("event_type"),
        floor(epochMs(ev) / HourMs).as("hour_bucket"),
        col("value"))
      .groupBy(col("event_type"), col("hour_bucket"))
      .agg(count(lit(1)).as("n_events"),
        asD(sum(dec(col("value")))).as("sum_value"))
      .orderBy(col("event_type"), col("hour_bucket"))
  }

  /** Gap-based sessionization (30-min inactivity): per-user session and
    * event counts. Window-function shape: lag → new-session flag →
    * running sum; shuffles once on user_id. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val ev = t(spark, dir, "events")
    ev.select(col("user_id"), col("event_id"), epochMs(ev).as("ms"))
      .withColumn("new_s",
        when(lag(col("ms"), 1).over(w).isNull ||
          col("ms") - lag(col("ms"), 1).over(w) > SessionGapMs, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("new_s")).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  /** Per-user outlier detection (q90): events whose value deviates
    * more than 3 population standard deviations from that user's mean.
    * The z-test is evaluated as an EXACT integer inequality — value is
    * fixed-pointed (×1000, floor+0.5), and `z² > 9` is algebraically
    * cleared of divisions: `(n·x − S)² > 9·(n·SS − S²)` over
    * DECIMAL(38,0), so no float sum order or sqrt rounding can flip a
    * borderline event differently across engines or partitionings.
    *
    * Scale shape: per-user moments are one partial-agg groupBy (three
    * longs per user cross the shuffle); the per-event test is a
    * broadcast join of that tiny stats frame back onto the scan —
    * events are never shuffled. Only flagged rows (rare by
    * construction) reach the second, anomaly-list aggregate.
    * Overflow headroom: all products stay under 10³⁸ for |value| ≤
    * 10⁶ and up to ~10¹³ events per user. */
  def userAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val base = ev.select(col("user_id"), col("event_id"),
      floor(col("value") * 1000.0 + 0.5).cast("long").as("fp"))
    val stats = base.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      sum(col("fp")).as("s"),
      sum(col("fp") * col("fp")).as("ss"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val lhs = d(col("n_events")) * d(col("fp")) - d(col("s"))
    val anomalous = base.join(broadcast(stats), Seq("user_id"))
      .filter(lhs * lhs > d(lit(9)) * (d(col("n_events")) * d(col("ss")) - d(col("s")) * d(col("s"))))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_anomalies"),
        array_join(sort_array(collect_list(col("event_id"))).cast("array<string>"), ",")
          .as("anomaly_csv"))
    stats.join(anomalous, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"),
        coalesce(col("n_anomalies"), lit(0L)).as("n_anomalies"),
        coalesce(col("anomaly_csv"), lit("")).as("anomaly_csv"))
      .orderBy(col("user_id"))
  }

  /** Winsorized value statistics per event type (q92): exact 5th/95th
    * percentiles, then values clamped into that band before the sum —
    * the standard heavy-tail taming step before a metric feeds a
    * training signal or a mixing weight. `percentile` is the exact
    * sort-based aggregate (identical interpolation to DuckDB
    * `quantile_cont`, the q20 precedent); at 100 TB the same query
    * swaps to `percentile_approx` (mergeable t-digest) — kept exact
    * here so the oracle can hash-check. The tiny per-type quantile
    * frame broadcasts back onto the scan; the winsorized sum is exact
    * decimal(18,4), so add order never shows. */
  def winsorizedStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val qs = ev.groupBy(col("event_type")).agg(
      percentile(col("value"), lit(0.05)).as("p05raw"),
      percentile(col("value"), lit(0.95)).as("p95raw"))
    ev.join(broadcast(qs), Seq("event_type"))
      .withColumn("w", least(greatest(col("value"), col("p05raw")), col("p95raw")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("value") < col("p05raw"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("value") > col("p95raw"), 1L).otherwise(0L)).as("n_above"),
        (round(first(col("p05raw")), 4) + lit(0.0)).as("p05"),
        (round(first(col("p95raw")), 4) + lit(0.0)).as("p95"),
        asD(sum(dec(col("w")))).as("sum_winsorized"))
      .orderBy(col("event_type"))
  }

  private val FunnelW1Ms = 3600000L  // click within 1 h of first view
  private val FunnelW2Ms = 86400000L // purchase within 24 h of that click

  /** Ordered conversion funnel view → click → purchase (q105): a user
    * reaches stage k+1 only with an event of that type STRICTLY after
    * their stage-k time and within that stage's conversion window (the
    * standard product-analytics funnel, e.g. Amplitude/Mixpanel
    * "holding order constant" with a per-step window — unwindowed,
    * every long-lived user trivially converts). Stage times are exact
    * minima, so the result is a pure function of the data —
    * equal-timestamp cross-type events are excluded by the strict
    * inequality identically in both engines.
    *
    * Scale shape: each stage is a conditional-min groupBy on user_id
    * plus one user_id equi-join against the (|users|-sized, NOT
    * broadcastable at 100 TB) previous-stage frame — every shuffle in
    * the chain hashes the SAME key, so a cluster reuses the exchange
    * and the stage joins co-partition. No windows, no event-list
    * collection: per-user state never exceeds one timestamp per
    * stage. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val base = ev.select(col("user_id"), col("event_type"), epochMs(ev).as("ms"))
    val s1 = base.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ms")).as("t1"))
    val s2 = base.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ms") > col("t1") && col("ms") <= col("t1") + FunnelW1Ms)
      .groupBy(col("user_id")).agg(min(col("ms")).as("t2"))
    val s3 = base.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ms") > col("t2") && col("ms") <= col("t2") + FunnelW2Ms)
      .groupBy(col("user_id")).agg(min(col("ms")).as("t3"))
    val row = (label: String, df: DataFrame) =>
      df.agg(count(lit(1)).as("n_users")).select(lit(label).as("stage"), col("n_users"))
    row("0_all", base.select(col("user_id")).distinct())
      .unionByName(row("1_view", s1))
      .unionByName(row("2_click", s2))
      .unionByName(row("3_purchase", s3))
      .orderBy(col("stage"))
  }

  private val DayMs = 86400000L

  /** Cohort retention matrix (q106): users cohorted by first-active
    * day; each cell counts the cohort's users active again `day_offset`
    * days later. The first step collapses events to DISTINCT
    * (user, day) — the frame every later step touches is bounded by
    * |users| × span-days, never by event volume, which is what makes a
    * retention query tractable over years of 100 TB event logs.
    * Cohort assignment is a per-user min over that frame (partial-agg)
    * joined back on user_id; the final cell aggregate needs no
    * count-distinct because (user, day) is already unique. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val ud = ev.select(col("user_id"), floor(epochMs(ev) / DayMs).as("day")).distinct()
    val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ud.join(first, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Join-key skew report (q112): the diagnostic a pipeline runs on a
    * key BEFORE shuffling on it — key cardinality, hottest-key counts,
    * exact p50/p99 of the per-key frequency distribution, and the top
    * heavy keys. This is how the engine's own skew mitigations (q19's
    * salted aggregation, AQE skew-join) get TARGETED instead of
    * applied blind.
    *
    * Scale shape: one partial-agg groupBy builds the per-key count
    * frame (bounded by key cardinality, not row count); everything
    * after aggregates THAT frame — the top-5 rides the bounded-heap
    * [[graft.functions.VectorFunctions.topKPairs]] aggregate (map-side
    * state = 5 pairs per partition), never a global sort. The exact
    * percentiles swap to `percentile_approx` at 100 TB key
    * cardinalities (the q92 rule — kept exact so the oracle can
    * hash-check). */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.topKPairs
    val counts = t(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        (round(percentile(col("cnt"), lit(0.5)), 4) + lit(0.0)).as("p50_cnt"),
        (round(percentile(col("cnt"), lit(0.99)), 4) + lit(0.0)).as("p99_cnt"),
        (round(sum(col("cnt")).cast("double") / count(lit(1)), 4) + lit(0.0)).as("avg_cnt"),
        topKPairs((-col("cnt")).cast("double"), col("user_id"), 5).as("tk"))
      .select(col("n_keys"), col("max_cnt"), col("p50_cnt"), col("p99_cnt"),
        col("avg_cnt"),
        array_join(transform(col("tk"), p => p.getField("id").cast("string")), ",")
          .as("top5_csv"))
  }

  /** Event-type transition matrix (q118): counts of consecutive
    * (prev → next) event-type pairs per user timeline — the behavioral
    * bigram table behind "what do users do after an error", Markov
    * funnel modeling, and bot detection (self-loops at machine rates).
    * One window (lag over the user timeline) on ONE user_id shuffle —
    * the q61 sessionize shape — then a partial-agg count to a
    * #types² frame. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val ev = t(spark, dir, "events")
    ev.select(col("user_id"), col("event_id"), col("event_type"), epochMs(ev).as("ms"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  /** KMV distinct-count sketch card (q123): distinct users per event
    * type estimated by the mergeable k-minimum-values sketch
    * ([[graft.functions.SketchFunctions.kmvDistinct]]) at two widths,
    * next to the exact COUNT(DISTINCT) audit twin. k=256 exceeds the
    * fixture's per-type cardinality, exercising the exact-below-k path
    * (the sketch IS the value set); k=64 exercises the estimator. The
    * sketch hash is an md5 prefix DuckDB recomputes exactly, so the
    * ESTIMATES are hash-oracled, not just error-banded.
    *
    * Scale shape: the sketch's partial state is ≤ k longs per
    * (partition, type) with map-side combine — at 100 TB that replaces
    * the full distinct-value exchange behind an exact COUNT(DISTINCT);
    * the exact twin rides along here as the fixture-size audit. */
  def distinctUserSketch(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
      .groupBy(col("event_type"))
      .agg(
        (round(graft.functions.SketchFunctions.kmvDistinct(col("uid"), 64), 4) + lit(0.0))
          .as("est_k64"),
        (round(graft.functions.SketchFunctions.kmvDistinct(col("uid"), 256), 4) + lit(0.0))
          .as("est_k256"),
        countDistinct(col("uid")).as("exact_distinct"))
      .orderBy(col("event_type"))

  val oracles: Map[String, String] = Map(
    "q60_event_window_agg" ->
      s"""SELECT event_type, epoch_ms(ts) // $HourMs AS hour_bucket,
         |  count(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY event_type, hour_bucket""".stripMargin,
    "q61_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
         |f AS (SELECT user_id,
         |        CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > $SessionGapMs
         |             THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
         |SELECT user_id, count(*) AS n_events, CAST(sum(new_s) AS BIGINT) AS n_sessions
         |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q90_event_anomaly" ->
      """WITH e AS (SELECT user_id, event_id,
        |            CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS fp FROM events),
        |st AS (SELECT user_id, count(*) AS n_events,
        |         CAST(sum(fp) AS DECIMAL(38,0)) AS s,
        |         CAST(sum(fp * fp) AS DECIMAL(38,0)) AS ss
        |       FROM e GROUP BY user_id),
        |a AS (SELECT e.user_id, e.event_id
        |      FROM e JOIN st USING (user_id)
        |      WHERE (CAST(n_events AS DECIMAL(38,0)) * fp - s)
        |            * (CAST(n_events AS DECIMAL(38,0)) * fp - s)
        |            > 9 * (CAST(n_events AS DECIMAL(38,0)) * ss - s * s)),
        |an AS (SELECT user_id, count(*) AS n_anomalies,
        |         array_to_string(list_sort(list(event_id)), ',') AS anomaly_csv
        |       FROM a GROUP BY user_id)
        |SELECT st.user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(COALESCE(n_anomalies, 0) AS BIGINT) AS n_anomalies,
        |  COALESCE(anomaly_csv, '') AS anomaly_csv
        |FROM st LEFT JOIN an ON st.user_id = an.user_id
        |ORDER BY st.user_id""".stripMargin,
    "q92_winsorized" ->
      """WITH q AS (SELECT event_type,
        |             quantile_cont(value, 0.05) AS p05raw,
        |             quantile_cont(value, 0.95) AS p95raw
        |           FROM events GROUP BY event_type),
        |j AS (SELECT e.event_type, value, p05raw, p95raw,
        |        least(greatest(value, p05raw), p95raw) AS w
        |      FROM events e JOIN q USING (event_type))
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN value < p05raw THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |  CAST(sum(CASE WHEN value > p95raw THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  ROUND(any_value(p05raw), 4) + 0.0 AS p05,
        |  ROUND(any_value(p95raw), 4) + 0.0 AS p95,
        |  CAST(SUM(CAST(w AS DECIMAL(18,4))) AS DOUBLE) AS sum_winsorized
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q105_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |s1 AS (SELECT user_id, min(ms) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ms) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ms > t1 AND ms <= t1 + $FunnelW1Ms GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ms) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ms > t2 AND ms <= t2 + $FunnelW2Ms GROUP BY 1)
        |SELECT * FROM (
        |  SELECT '0_all' AS stage, count(DISTINCT user_id) AS n_users FROM e
        |  UNION ALL SELECT '1_view', count(*) FROM s1
        |  UNION ALL SELECT '2_click', count(*) FROM s2
        |  UNION ALL SELECT '3_purchase', count(*) FROM s3)
        |ORDER BY stage""".stripMargin,
    "q106_retention" ->
      s"""WITH ud AS (SELECT DISTINCT user_id, epoch_ms(ts) // $DayMs AS day FROM events),
         |f AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1)
         |SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
         |FROM ud JOIN f USING (user_id)
         |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "q112_skew_report" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1)
        |SELECT count(*) AS n_keys,
        |  max(cnt) AS max_cnt,
        |  ROUND(quantile_cont(cnt, 0.5), 4) + 0.0 AS p50_cnt,
        |  ROUND(quantile_cont(cnt, 0.99), 4) + 0.0 AS p99_cnt,
        |  ROUND(CAST(sum(cnt) AS DOUBLE) / count(*), 4) + 0.0 AS avg_cnt,
        |  array_to_string((list(user_id ORDER BY cnt DESC, user_id))[1:5], ',') AS top5_csv
        |FROM c""".stripMargin,
    "q118_event_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
        |f AS (SELECT event_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_type
        |      FROM e)
        |SELECT prev_type, event_type, count(*) AS n_transitions
        |FROM f WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY prev_type, event_type""".stripMargin,
    // Re-derives the KMV estimates from the same 60-bit md5-prefix
    // hashes: ('0x'||substr(md5(s),1,15))::UBIGINT == the aggregate's
    // big-endian-first-8-bytes >>> 4. 1152921504606846976.0 = 2^60.
    "q123_distinct_sketch" ->
      """WITH e AS (SELECT event_type, CAST(user_id AS VARCHAR) AS uid FROM events),
        |h AS (SELECT DISTINCT event_type,
        |        ('0x' || substr(md5(uid), 1, 15))::UBIGINT AS hv
        |      FROM e WHERE uid IS NOT NULL),
        |r AS (SELECT event_type, hv,
        |        row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS nh
        |      FROM h),
        |a AS (SELECT event_type, max(nh) AS nh,
        |        max(CASE WHEN rn = 64 THEN hv END) AS h64,
        |        max(CASE WHEN rn = 256 THEN hv END) AS h256
        |      FROM r GROUP BY event_type),
        |x AS (SELECT event_type, count(DISTINCT uid) AS exact_distinct FROM e GROUP BY event_type)
        |SELECT a.event_type,
        |  round(CASE WHEN a.nh < 64 THEN CAST(a.nh AS DOUBLE)
        |        ELSE 63.0 * 1152921504606846976.0 / CAST(a.h64 AS DOUBLE) END, 4) + 0.0 AS est_k64,
        |  round(CASE WHEN a.nh < 256 THEN CAST(a.nh AS DOUBLE)
        |        ELSE 255.0 * 1152921504606846976.0 / CAST(a.h256 AS DOUBLE) END, 4) + 0.0 AS est_k256,
        |  x.exact_distinct
        |FROM a JOIN x USING (event_type) ORDER BY event_type""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_event_window_agg" -> (eventWindowAgg _),
    "q61_sessionize" -> (sessionize _),
    "q90_event_anomaly" -> (userAnomalies _),
    "q92_winsorized" -> (winsorizedStats _),
    "q105_funnel" -> (funnel _),
    "q106_retention" -> (cohortRetention _),
    "q112_skew_report" -> (skewReport _),
    "q118_event_transitions" -> (eventTransitions _),
    "q123_distinct_sketch" -> (distinctUserSketch _)
  )
}
