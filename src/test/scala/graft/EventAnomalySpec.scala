package graft

import org.apache.spark.sql.functions._

import graft.queries.EventQueries

/** Exact-integer z-score outlier detection (q90): the planted extreme
  * event is flagged, in-band events and zero-variance users are not —
  * and the decision is reproducible because the z² > 9 test never
  * leaves integer arithmetic. */
class EventAnomalySpec extends SparkSpec {

  test("userAnomalies flags only the planted outlier; zero-variance users report none") {
    val ss = spark
    import ss.implicits._
    val user1 = (1 to 30).map(i => (1L, i.toLong, 10.0)) :+ ((1L, 31L, 500.0))
    val user2 = (101 to 110).map(i => (2L, i.toLong, 7.5))
    val dir = tmpDir("anomaly")
    (user1 ++ user2).toDF("user_id", "event_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.userAnomalies(spark, dir)
      .select("user_id", "n_events", "n_anomalies", "anomaly_csv")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((1L, 31L, 1L, "31")), s"got ${out(1L)}")
    assert(out(2L) == ((2L, 10L, 0L, "")), s"got ${out(2L)}")
  }

  test("userAnomalies is partitioning-independent (exact integer moments)") {
    val ss = spark
    import ss.implicits._
    val rows = (1 to 200).map(i => (i.toLong % 5, i.toLong, (i % 37) * 1.25 + 0.01))
    val dir1 = tmpDir("anomaly1"); val dir8 = tmpDir("anomaly8")
    rows.toDF("user_id", "event_id", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir1/events.parquet")
    rows.toDF("user_id", "event_id", "value").repartition(8)
      .write.mode("overwrite").parquet(s"$dir8/events.parquet")
    val a = EventQueries.userAnomalies(spark, dir1).collect().toSeq
    val b = EventQueries.userAnomalies(spark, dir8).collect().toSeq
    assert(a == b)
  }
}
