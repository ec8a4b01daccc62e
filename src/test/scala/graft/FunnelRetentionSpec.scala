package graft

import graft.queries.EventQueries

/** Ordered-funnel and cohort-retention semantics (q105/q106): stage
  * k+1 requires an event STRICTLY after the stage-k time (same-ms
  * events and out-of-order chains must not count), and retention
  * counts a user once per active day regardless of event volume. */
class FunnelRetentionSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, Long, String, Long)], prefix: String): String = {
    val ss = spark
    import ss.implicits._
    val dir = tmpDir(prefix)
    // ts as raw parquet-nanos longs, the layout EventQueries.epochMsCol
    // normalizes under spark.sql.legacy.parquet.nanosAsLong
    rows.map { case (u, ms, tpe, eid) => (eid, ms * 1000000L, u, tpe) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel: strictly-ordered windowed stages; same-ms, out-of-order, and past-window events do not advance") {
    val H = 3600000L // click window after first view
    // user 1: full chain view@10 < click@20 < purchase@30, all in window
    // user 2: click@1 BEFORE its first view@2, none after -> stops at view
    // user 3: view@1, purchase@15, click@20 -> purchase precedes the click -> stops at click
    // user 4: no view at all -> counted only in 0_all
    // user 5: click at the SAME ms as its first view -> strict > excludes it
    // user 6: click at EXACTLY view + 1h -> inclusive bound counts it
    // user 7: click at view + 1h + 1ms -> past the window -> stops at view
    val rows = Seq(
      (1L, 10L, "view", 1L), (1L, 20L, "click", 2L), (1L, 30L, "purchase", 3L),
      (2L, 1L, "click", 4L), (2L, 2L, "view", 5L),
      (3L, 1L, "view", 6L), (3L, 15L, "purchase", 7L), (3L, 20L, "click", 8L),
      (4L, 5L, "click", 9L), (4L, 6L, "purchase", 10L),
      (5L, 5L, "view", 11L), (5L, 5L, "click", 12L),
      (6L, 100L, "view", 13L), (6L, 100L + H, "click", 14L),
      (7L, 100L, "view", 15L), (7L, 101L + H, "click", 16L))
    val dir = writeEvents(rows, "funnel")
    val out = EventQueries.funnel(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("0_all" -> 7L, "1_view" -> 6L, "2_click" -> 3L, "3_purchase" -> 1L),
      s"got $out")
  }

  test("cohortRetention: one count per (user, day); cohort = first active day") {
    val Day = 86400000L
    // user 1 active days 0,1,3 (cohort 0); user 2 days 1,3 (cohort 1);
    // user 3 day 0 twice (must count once)
    val rows = Seq(
      (1L, 0L * Day + 5L, "view", 1L), (1L, 1L * Day + 9L, "click", 2L),
      (1L, 3L * Day + 2L, "view", 3L),
      (2L, 1L * Day + 1L, "view", 4L), (2L, 3L * Day + 7L, "error", 5L),
      (3L, 0L * Day + 1L, "view", 6L), (3L, 0L * Day + 999L, "click", 7L))
    val dir = writeEvents(rows, "retention")
    val out = EventQueries.cohortRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L), s"got $out")
  }
}
