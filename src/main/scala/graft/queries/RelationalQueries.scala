package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Relational analytics over the TPC-H-ish fixture tables — the engine's
  * general query surface (scan/filter/project/agg/join/window/top-k,
  * SURVEY.md §2.2 categories).
  *
  * Scale design notes (local[32] now, 1000 executors later):
  *  - Aggregations use exact decimal sums (Tables.dec) so results are
  *    order-independent: partial (map-side) aggregation + shuffle by
  *    group key is the plan Catalyst picks, and the result is identical
  *    at any parallelism.
  *  - Dimension tables (nation/region/customer at this ratio) are
  *    broadcast explicitly — no shuffle of the fact table for joins.
  *  - Window top-k shuffles by partition key only, and AQE coalesces
  *    the post-shuffle partitions.
  */
object RelationalQueries {

  /** Flagship pricing summary (TPC-H Q1 shape) over lineitem. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asD(sum(dec(col("l_quantity")))).as("sum_qty"),
        asD(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        asD(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** ROLLUP totals over (returnflag, linestatus) — the grouping-sets
    * surface (subtotals + grand total in one pass; Spark plans one
    * Expand + single aggregation, so the fact table is still scanned
    * once). Grouping nulls are coalesced to 'ALL' on both engines —
    * cross-engine null normalization is the driver gate's weak spot. */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asD(sum(dec(col("l_quantity")))).as("sum_qty"),
        count(lit(1)).as("count_order"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("count_order"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Revenue by nation: fact table joined to broadcast dims
    * (customer -> nation), grouped. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        asD(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("n_name"))
  }

  /** Top-3 orders per customer by total price — window top-k with
    * deterministic tie-break. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"),
        asD(dec(col("o_totalprice"))).as("total_price"), col("rnk"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** Order-priority counts by status — semi-join shape (orders having
    * at least one lineitem shipped after a date). */
  def orderPriorityCount(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
      .select(col("l_orderkey")).distinct()
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Customers with no orders since mid-1997 — anti-join shape. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-06-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Wide-format (pivot) aggregation: order counts per priority x
    * status — the relational cross-tab shape. Pivot values are
    * declared explicitly so the plan needs no pre-pass. */
  def orderStatusPivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
      .orderBy(col("o_orderpriority"))

  /** Supplier account-balance quartiles per nation — ntile window with
    * deterministic tie-break. */
  def supplierBalanceQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal"), col("s_suppkey"))
    t(spark, dir, "supplier")
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("s_nationkey"), col("quartile"))
      .agg(count(lit(1)).as("n_suppliers"),
        asD(max(dec(col("s_acctbal")))).as("max_acctbal"))
      .orderBy(col("s_nationkey"), col("quartile"))
  }

  /** Salted (skew-mitigated) aggregation over lineitem by partkey —
    * the ORACLE is the plain direct aggregation, proving the salted
    * two-phase plan yields identical results. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedAgg(
      t(spark, dir, "lineitem"),
      col("l_partkey"), dec(col("l_quantity")), salts = 16)
      .select(col("key").as("l_partkey"), col("n_rows"), asD(col("sum_value")).as("sum_qty"))
      .filter(col("l_partkey") <= 200)
      .orderBy(col("l_partkey"))

  /** Exact interpolated quantiles of extended price per return flag —
    * the distribution-profiling shape (data-quality checks in a
    * training pipeline). `percentile` is the exact sort-based
    * aggregate, identical semantics to DuckDB `quantile_cont`; at
    * 100 TB the same query swaps to `percentile_approx` (t-digest,
    * mergeable, one pass) — kept exact here so the oracle can
    * hash-check it. */
  def priceQuantiles(spark: SparkSession, dir: String): DataFrame = {
    def q(p: Double, name: String) =
      (round(percentile(col("l_extendedprice"), lit(p)), 4) + lit(0.0)).as(name)
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(q(0.25, "p25"), q(0.5, "p50"), q(0.75, "p75"), q(0.95, "p95"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** q151: sketch quantiles with a measured rank-error gate — the
    * 100 TB path for the q20 dashboard. Exact `percentile` shuffles
    * and sorts every value; [[graft.functions.SketchFunctions
    * .kllQuantiles]] carries an O(k·log n) mergeable summary per
    * partition instead. Pass 2 re-scans once to measure each
    * estimate's EXACT rank (five conditional counts in one aggregate)
    * and emits `rank_recall = 1 − max |rank − p|` — the recall-gate
    * column oracle_check enforces (≥ 0.70; k = 256 lands ~0.99), the
    * same honesty contract as the ANN tiers: the approximate path
    * ships WITH its measured quality, never on faith. */
  def sketchQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.SketchFunctions
    val probs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val price = t(spark, dir, "lineitem")
      .select(col("l_extendedprice").cast("double").as("x"))
    val est = price.agg(
        SketchFunctions.kllQuantiles(col("x"), probs).as("est"),
        count(lit(1)).as("n"))
      .head()
    val ests = est.getSeq[Double](0)
    val n = est.getLong(1)
    // rank error against the tie interval [frac(< est), frac(<= est)]
    // — a point rank would overshoot p on heavily repeated values even
    // for the exact quantile
    val rankCols = ests.zipWithIndex.flatMap { case (e, i) => Seq(
      (sum(when(col("x") < e, 1L).otherwise(0L)).cast("double") / n).as(s"lo$i"),
      (sum(when(col("x") <= e, 1L).otherwise(0L)).cast("double") / n).as(s"hi$i"))
    }
    val ranks = price.agg(rankCols.head, rankCols.tail: _*).head()
    val errs = probs.indices.map { i =>
      val lo = ranks.getDouble(2 * i); val hi = ranks.getDouble(2 * i + 1)
      val p = probs(i)
      if (p < lo) lo - p else if (p > hi) p - hi else 0.0
    }
    val ss = spark
    import ss.implicits._
    Seq((n,
      BigDecimal(ests.head).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(ests(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(ests(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(errs.max).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(1.0 - errs.max).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_rows", "est_p01", "est_p50", "est_p99", "max_rank_err", "rank_recall")
  }

  /** Large-volume orders (q120, TPC-H Q18 shape): orders whose total
    * line quantity clears a threshold, joined out to customer — the
    * aggregate-HAVING semi-join pattern. Scale shape: the HAVING
    * aggregate is a partial-agg groupBy on the fact table whose
    * SURVIVORS are a tiny frame (84 rows at sf0.01 — AQE broadcasts it
    * into orders); the customer join is a plain keyed equi-join (never
    * assume the dimension fits in memory at 100 TB); the top-20 plans
    * as TakeOrdered, no global sort. Sums ride the exact decimal
    * chain, so the threshold compare can't flip cross-engine. */
  def bigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(asD(sum(dec(col("l_quantity")))).as("sum_qty"))
      .filter(col("sum_qty") > 280.0)
    t(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(spark, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Above-group-average filter via CORRELATED scalar subqueries
    * (q121): customers whose balance beats their nation's average —
    * phrased with two correlated scalars so Catalyst's decorrelation
    * (RewriteCorrelatedScalarSubquery → aggregate + join) is the
    * surface under test; driven through `spark.sql` because the
    * DataFrame API has no correlated-subquery syntax (the q21
    * precedent: SQL strings are first-class). The comparison is
    * cleared of DIVISION — `bal · count > sum` over exact decimals —
    * because cross-engine AVG over doubles is sum-order-dependent and
    * a boundary row would flip. The plan after decorrelation is the
    * same aggregate + same-key join a hand-written form produces:
    * one customer scan per aggregate, nation-keyed shuffles. */
  def aboveNationAvg(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("graft_q121_customer")
    spark.sql(
      """SELECT c_nationkey, c_custkey, c_acctbal FROM graft_q121_customer c1
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) *
        |        (SELECT COUNT(*) FROM graft_q121_customer c2
        |         WHERE c2.c_nationkey = c1.c_nationkey)
        |      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4)))
        |         FROM graft_q121_customer c3
        |         WHERE c3.c_nationkey = c1.c_nationkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin)
  }

  /** Z-order layout audit (q164): Morton-interleave (l_partkey,
    * l_suppkey), cut the z range into ~64 scale-invariant buckets
    * (the write-time file boundaries `repartitionByRange(zValue2)`
    * would produce), and report each bucket's row count and BOTH
    * keys' min/max spans — the per-file statistics that prove
    * predicates on EITHER column prune. All integer arithmetic
    * ([[graft.operators.Layout]]); one partial-agg shuffle after the
    * narrow z map (the zmax probe is a 1-row broadcast). */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val l = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        Layout.zValue2(col("l_partkey"), col("l_suppkey")).as("z"))
    val zmax = l.agg(max(col("z")).as("zmax"))
    l.crossJoin(broadcast(zmax))
      .select(col("l_partkey"), col("l_suppkey"),
        // divide by the bucket WIDTH (zmax/64 + 1) instead of the
        // textbook (z*64)/(zmax+1): the multiply-first form overflows
        // long for z > 2^57, which real 2×31-bit z values reach
        expr("z div ((zmax div 64) + 1)").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("part_lo"), max(col("l_partkey")).as("part_hi"),
        min(col("l_suppkey")).as("supp_lo"), max(col("l_suppkey")).as("supp_hi"))
      .orderBy(col("bucket"))
  }

  /** The [[graft.operators.Layout.spreadBits]] dilation as DuckDB SQL
    * over a column expression `x`. */
  private def spreadSql(x: String): String = {
    def step(e: String, sh: Int, m: Long) = s"(($e | ($e << $sh)) & $m)"
    val x0 = s"(CAST($x AS BIGINT) & ${0xFFFFFFFFL})"
    val x1 = step(x0, 16, 0x0000FFFF0000FFFFL)
    val x2 = step(x1, 8, 0x00FF00FF00FF00FFL)
    val x3 = step(x2, 4, 0x0F0F0F0F0F0F0F0FL)
    val x4 = step(x3, 2, 0x3333333333333333L)
    step(x4, 1, 0x5555555555555555L)
  }

  val oracles: Map[String, String] = Map(
    "q164_zorder_layout" ->
      s"""WITH z AS (SELECT l_partkey, l_suppkey,
         |        (${spreadSql("l_partkey")} | (${spreadSql("l_suppkey")} << 1)) AS z
         |      FROM lineitem),
         |m AS (SELECT max(z) AS zmax FROM z)
         |SELECT z.z // ((m.zmax // 64) + 1) AS bucket, count(*) AS n_rows,
         |       min(l_partkey) AS part_lo, max(l_partkey) AS part_hi,
         |       min(l_suppkey) AS supp_lo, max(l_suppkey) AS supp_hi
         |FROM z CROSS JOIN m
         |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q121_above_nation_avg" ->
      """SELECT c_nationkey, c_custkey, c_acctbal FROM customer c1
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) *
        |        (SELECT COUNT(*) FROM customer c2
        |         WHERE c2.c_nationkey = c1.c_nationkey)
        |      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4)))
        |         FROM customer c3
        |         WHERE c3.c_nationkey = c1.c_nationkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "q120_big_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |    FROM lineitem GROUP BY 1
        |    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 280.0)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice, big.sum_qty
        |FROM big JOIN orders o ON o.o_orderkey = big.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20""".stripMargin,
    "q20_price_quantiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.25), 4) + 0.0 AS p25,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) + 0.0 AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.75), 4) + 0.0 AS p75,
        |  ROUND(quantile_cont(l_extendedprice, 0.95), 4) + 0.0 AS p95,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q16_customers_without_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1997-06-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q17_order_status_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q18_supplier_quartiles" ->
      """WITH r AS (SELECT s_nationkey, s_acctbal, s_suppkey,
        |    ntile(4) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS quartile
        |  FROM supplier)
        |SELECT s_nationkey, quartile, COUNT(*) AS n_suppliers,
        |  CAST(MAX(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS max_acctbal
        |FROM r GROUP BY s_nationkey, quartile ORDER BY s_nationkey, quartile""".stripMargin,
    "q19_salted_agg" ->
      """SELECT l_partkey, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_partkey <= 200
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,
    // sum_disc_price/revenue rescale the scale-8 product sum to
    // DECIMAL(38,4) BEFORE the double cast (exact: every product is
    // ≤ 4dp money): DuckDB's wide-decimal→double goes int128→double
    // then ÷10^scale — TWO roundings once the scaled integer passes
    // 2^53, and at sf0.1 sum_disc_price landed on a boundary where
    // that differs from the correctly-rounded value Spark's
    // BigDecimal.doubleValue produces (2706323975.3560996 vs .3561).
    // At scale 4 the scaled integer stays exact in double and the
    // single division is correctly rounded.
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q24_rollup_summary" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q11_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q12_top_orders_per_customer" ->
      """WITH r AS (SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS total_price,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, total_price, rnk FROM r
        |WHERE rnk <= 3 AND o_custkey <= 100 ORDER BY o_custkey, rnk""".stripMargin,
    "q13_order_priority_count" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |              AND l_shipdate >= TIMESTAMP '1995-01-01')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_big_orders" -> (bigOrders _),
    "q121_above_nation_avg" -> (aboveNationAvg _),
    "q01_pricing_summary" -> (pricingSummary _),
    "q24_rollup_summary" -> (rollupSummary _),
    "q11_revenue_by_nation" -> (revenueByNation _),
    "q12_top_orders_per_customer" -> (topOrdersPerCustomer _),
    "q13_order_priority_count" -> (orderPriorityCount _),
    "q16_customers_without_orders" -> (customersWithoutOrders _),
    "q17_order_status_pivot" -> (orderStatusPivot _),
    "q18_supplier_quartiles" -> (supplierBalanceQuartiles _),
    "q19_salted_agg" -> (saltedAgg _),
    "q20_price_quantiles" -> (priceQuantiles _),
    "q151_sketch_quantiles" -> (sketchQuantiles _),
    "q164_zorder_layout" -> (zorderLayout _)
  )
}
