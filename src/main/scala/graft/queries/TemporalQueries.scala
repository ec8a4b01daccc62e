package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins
import Tables._

/** Driver-checked queries for the temporal join operators
  * (graft.operators.TemporalJoins) over the events/orders fixtures:
  * as-of alignment and point-in-interval attribution — the
  * event/feature-alignment primitives of a training-data pipeline.
  * Oracled against DuckDB's native ASOF JOIN / BETWEEN join, so the
  * scalable Spark formulations (union+window, bucket expansion) are
  * checked against an independent reference implementation of the
  * same semantics. */
object TemporalQueries {

  /** As-of join: each non-purchase event joined to the same user's
    * most recent purchase at or before the event time (NULL when none
    * yet) — the feature-alignment shape ("state as of the event").
    * Purchases are pre-aggregated to one row per (user, instant) —
    * max event id wins — so the as-of match is deterministic on both
    * engines. Timestamps of the two sides interleave, exercising the
    * real as-of semantics rather than a degenerate latest-row lookup. */
  def asofPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val base = ev.filter(col("user_id") < 100L)
      .select(col("event_id"), col("user_id"), col("event_type"),
        EventQueries.epochMsCol(ev, "ts").as("ms"))
    val left = base.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ms"))
    val purchases = base.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ms").as("pms"))
      .agg(max(col("event_id")).as("purchase_id"))
    TemporalJoins.asofJoin(left, purchases, key = "user_id",
        leftTs = "ms", rightTs = "pms", payload = Seq("purchase_id"))
      .select(col("event_id"), col("user_id"),
        col("asof_purchase_id").as("asof_purchase_id"))
      .orderBy(col("event_id"))
  }

  private val HourMs = 3600000L

  /** Point-in-interval: per purchase event, how many of the same
    * user's click events fall inside the hour after the purchase
    * (purchases with zero clicks drop out — inner semantics). Bucket
    * width = the interval length, so each interval expands to at most
    * 2 buckets. */
  def clicksAfterPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val ms = EventQueries.epochMsCol(ev, "ts")
    val base = ev.filter(col("user_id") < 100L)
      .select(col("event_id"), col("user_id"), col("event_type"), ms.as("ms"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ms"))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ms").as("start_ms"), (col("ms") + HourMs).as("end_ms"))
    TemporalJoins.pointInInterval(clicks, purchases, key = "user_id",
        pointTs = "ms", startTs = "start_ms", endTs = "end_ms", bucketWidth = HourMs)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks_1h"))
      .orderBy(col("purchase_id"))
  }

  val oracles: Map[String, String] = Map(
    "q62_asof_join" ->
      """WITH base AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms
        |              FROM events WHERE user_id < 100),
        |e AS (SELECT event_id, user_id, ms FROM base WHERE event_type <> 'purchase'),
        |p AS (SELECT user_id, ms AS pms, max(event_id) AS purchase_id
        |      FROM base WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, p.purchase_id AS asof_purchase_id
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND p.pms <= e.ms
        |ORDER BY event_id""".stripMargin,
    "q63_interval_join" ->
      s"""WITH base AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms
         |              FROM events WHERE user_id < 100),
         |c AS (SELECT event_id, user_id, ms FROM base WHERE event_type = 'click'),
         |p AS (SELECT event_id AS purchase_id, user_id, ms AS start_ms, ms + $HourMs AS end_ms
         |      FROM base WHERE event_type = 'purchase')
         |SELECT p.purchase_id, count(*) AS n_clicks_1h
         |FROM p JOIN c ON c.user_id = p.user_id AND c.ms BETWEEN p.start_ms AND p.end_ms
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_asof_join" -> (asofPurchase _),
    "q63_interval_join" -> (clicksAfterPurchase _)
  )
}
