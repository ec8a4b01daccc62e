package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Bucketing is the 100 TB co-location story: two fact tables bucketed
  * on the join key join WITHOUT shuffling either side — the scan's
  * bucket layout satisfies the join's distribution requirement. This
  * spec proves the engine's plan actually does that (no
  * ShuffleExchange anywhere in the executed join), not just that
  * bucketing is available. */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans with zero shuffle exchanges") {
    val wh = tmpDir("graft-bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // force a sort-merge join: broadcast would trivially avoid the
    // shuffle and prove nothing about bucket co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"))
      li.write.mode("overwrite").option("path", s"$wh/li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("graft_li_bucketed")
      o.write.mode("overwrite").option("path", s"$wh/o")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("graft_o_bucketed")
      val joined = spark.table("graft_li_bucketed")
        .join(spark.table("graft_o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      val n = joined.count()
      assert(n > 0)
      // collectShuffles descends through the AQE wrapper — a bare
      // executedPlan.collect is vacuous under adaptive execution
      val shuffles = collectShuffles(joined)
      // join AND the groupBy ride the bucket distribution: zero shuffles
      assert(shuffles.isEmpty,
        s"expected shuffle-free co-located join, found ${shuffles.size} exchange(s)")
      // and the result matches the plain (shuffling) join
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      assert(joined.exceptAll(plain).count() == 0 && plain.exceptAll(joined).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_o_bucketed")
    }
  }
}
