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
         |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_event_window_agg" -> (eventWindowAgg _),
    "q61_sessionize" -> (sessionize _)
  )
}
