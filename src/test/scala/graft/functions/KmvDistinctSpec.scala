package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** KMV distinct-count sketch ([[SketchFunctions.kmvDistinct]]):
  * exact-below-k path, partition-invariant merge (the mergeability
  * that makes map-side partial aggregation sound), estimator accuracy
  * at the ~1/sqrt(k-2) band, NULL handling, and the SQL surface. */
class KmvDistinctSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("below k distinct values the sketch is exact") {
    val df = (0 until 1000).map(i => s"v${i % 37}").toDF("s")
    val est = df.agg(SketchFunctions.kmvDistinct(col("s"), 64)).head.getDouble(0)
    assert(est == 37.0)
  }

  test("estimate is invariant under repartitioning (merge is associative + order-free)") {
    val vals = (0 until 5000).map(i => s"item-$i")
    val one = vals.toDF("s").repartition(1)
      .agg(SketchFunctions.kmvDistinct(col("s"), 128)).head.getDouble(0)
    val many = vals.toDF("s").repartition(16)
      .agg(SketchFunctions.kmvDistinct(col("s"), 128)).head.getDouble(0)
    val skewed = (vals ++ vals ++ vals).toDF("s").repartition(7)
      .agg(SketchFunctions.kmvDistinct(col("s"), 128)).head.getDouble(0)
    assert(one == many)
    assert(one == skewed) // duplicates never move the estimate
  }

  test("relative error within 3/sqrt(k-2) of the true distinct count") {
    val df = (0 until 20000).map(i => s"tok-$i").toDF("s")
    for (k <- Seq(64, 256, 1024)) {
      val est = df.agg(SketchFunctions.kmvDistinct(col("s"), k)).head.getDouble(0)
      val relErr = math.abs(est - 20000.0) / 20000.0
      assert(relErr < 3.0 / math.sqrt(k - 2.0), s"k=$k est=$est relErr=$relErr")
    }
  }

  test("NULLs are ignored, matching COUNT(DISTINCT); all-null group yields 0") {
    val df = Seq(Some("a"), None, Some("b"), None, Some("a")).toDF("s")
    assert(df.agg(SketchFunctions.kmvDistinct(col("s"), 8)).head.getDouble(0) == 2.0)
    val allNull = Seq[Option[String]](None, None).toDF("s")
    assert(allNull.agg(SketchFunctions.kmvDistinct(col("s"), 8)).head.getDouble(0) == 0.0)
  }

  test("SQL surface: graft_kmv_distinct registered, per-group, non-string input coerced") {
    graft.GraftExtensions.register(spark)
    (0 until 900).map(i => (i % 3, i % 450)).toDF("g", "v")
      .createOrReplaceTempView("kmv_in")
    val rows = spark.sql(
      """SELECT g, graft_kmv_distinct(v, 1024) AS est FROM kmv_in
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    // 1024 > 150 distinct per group: exact path, ints coerced via CAST
    assert(rows.map(_.getDouble(1)).toSeq == Seq(150.0, 150.0, 150.0))
  }

  test("plan: map-side partial aggregation — one shuffle, partial+final object-hash stages") {
    val df = (0 until 4000).map(i => (i % 5, s"u-${i % 700}")).toDF("g", "s")
      .repartition(8)
      .groupBy(col("g")).agg(SketchFunctions.kmvDistinct(col("s"), 64).as("est"))
    df.count()
    val aggs = collectPlanNodes(df) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    // partial (pre-shuffle, k-bounded state) + final — the property that
    // caps the exchange at k longs per (partition, group)
    assert(aggs.size == 2, s"expected partial+final object-hash aggregate, got ${aggs.size}")
    // exactly one exchange beyond the test's own repartition(8): the
    // group-key shuffle between the partial and final stages
    val aggShuffles = collectShuffles(df).collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
        if s.shuffleOrigin == org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => s
    }
    assert(aggShuffles.size == 1, s"expected 1 group-key shuffle, got ${aggShuffles.size}")
  }

  test("k below 2 refuses at construction") {
    val e = intercept[IllegalArgumentException] {
      graft.functions.expressions.KmvDistinctAgg(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 1)
    }
    assert(e.getMessage.contains("k >= 2"))
  }
}
