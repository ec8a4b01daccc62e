package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the temporal joins: as-of boundary behavior (<=, NULL
  * before the first right row) and interval inclusivity / no-dup under
  * bucket expansion. */
class TemporalJoinsSpec extends SparkSpec {

  test("asofJoin picks the latest right row at or before each left ts") {
    val ss = spark
    import ss.implicits._
    val left = Seq(
      (1L, 5L, 100L), // before any right row -> NULL
      (1L, 10L, 101L), // exactly at right ts 10 -> matches it (<=)
      (1L, 14L, 102L), // between 10 and 20 -> 10
      (1L, 25L, 103L), // after 20 -> 20
      (2L, 50L, 104L) // other key, no right rows -> NULL
    ).toDF("k", "t", "event")
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoin(left, right, key = "k", leftTs = "t",
        rightTs = "rt", payload = Seq("v"))
      .orderBy(col("event"))
      .select(col("event"), col("asof_v")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(out.toSeq == Seq(
      100L -> None, 101L -> Some("a"), 102L -> Some("a"),
      103L -> Some("b"), 104L -> None))
  }

  test("asofJoin carries the newest right row ATOMICALLY (no torn multi-column payload)") {
    val ss = spark
    import ss.implicits._
    val left = Seq((1L, 12L, 100L)).toDF("k", "t", "event")
    // newest right row has b = NULL: it must STAY null, not backfill
    // from the older row — and a/b must come from the same row
    val right = Seq(
      (1L, 5L, Some(0L), Some(7L)),
      (1L, 10L, Some(1L), None)
    ).toDF("k", "rt", "a", "b")
    val out = TemporalJoins.asofJoin(left, right, key = "k", leftTs = "t",
        rightTs = "rt", payload = Seq("a", "b")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("asof_a") == 1L)
    assert(r.isNullAt(r.fieldIndex("asof_b")), "NULL in the newest right row must be preserved")
  }

  test("asofJoin rejects reserved internal column names and preserves the ts type") {
    val ss = spark
    import ss.implicits._
    // reserved-name collision must fail fast, not mis-plan
    val badLeft = Seq((1L, 5L, 9L)).toDF("k", "t", "__side")
    val right = Seq((1L, 3L, "a")).toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(badLeft, right, key = "k", leftTs = "t",
        rightTs = "rt", payload = Seq("v"))
    }
    assert(e.getMessage.contains("__side"))
    // an INT left ts must come back as INT, not silently widened to long
    val left = Seq((1, 5, 100L)).toDF("k", "t", "event")
      .select(col("k").cast("long").as("k"), col("t").cast("int").as("t"), col("event"))
    val r2 = Seq((1L, 3, "a")).toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoin(left, r2, key = "k", leftTs = "t",
      rightTs = "rt", payload = Seq("v"))
    assert(out.schema("t").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.select(col("asof_v")).head().getString(0) == "a")
  }

  test("pointInInterval buckets exactly at nanosecond magnitudes (beyond double precision)") {
    val ss = spark
    import ss.implicits._
    // epoch-nanos scale: 1.7e18 is far above 2^53, where double
    // division mis-buckets near boundaries
    val base = 1700000000000000000L
    val w = 3600000000000L // 1h in ns
    val points = Seq((1L, base + w - 1L, 1L), (1L, base + w, 2L), (1L, base + 2 * w, 3L))
      .toDF("k", "t", "pid")
    val intervals = Seq((1L, base, base + w, 900L)).toDF("k", "s", "e", "iid")
    val out = TemporalJoins.pointInInterval(points, intervals, key = "k",
        pointTs = "t", startTs = "s", endTs = "e", bucketWidth = w)
      .select(col("pid")).collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 2L)) // inclusive end; base+2w outside
  }

  test("pointInInterval is inclusive on both bounds and never duplicates") {
    val ss = spark
    import ss.implicits._
    val points = Seq(
      (1L, 0L, 200L), // before -> no match
      (1L, 10L, 201L), // at start -> match
      (1L, 15L, 202L), // inside -> match
      (1L, 30L, 203L), // at end -> match
      (1L, 31L, 204L), // after -> no match
      (2L, 15L, 205L) // other key -> no match
    ).toDF("k", "t", "pid")
    // interval spans several buckets (width 7 vs length 20): the
    // bucket-expansion path must still yield exactly one pair per hit
    val intervals = Seq((1L, 10L, 30L, 900L)).toDF("k", "s", "e", "iid")
    val out = TemporalJoins.pointInInterval(points, intervals, key = "k",
        pointTs = "t", startTs = "s", endTs = "e", bucketWidth = 7L)
      .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq == Seq(201L -> 900L, 202L -> 900L, 203L -> 900L))
  }
}
