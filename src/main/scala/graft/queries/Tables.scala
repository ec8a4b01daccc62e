package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-checked query inventory. */
object Tables {

  /** Read one of the driver fixture tables from an sf directory. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact-money arithmetic: double -> decimal(18,4) so sums are exact
    * and order-independent (shuffle-safe), then back to double at the
    * very end. The DuckDB oracle applies the identical cast chain, so
    * results hash-match bit-for-bit regardless of aggregation order —
    * this is what makes distributed sums reproducible at any scale. */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Final cast for an exact decimal aggregate back to double. */
  def asD(c: Column): Column = c.cast("double")

  /** Partition by WORK, not bytes: a kilobyte-scale parquet scan yields
    * 1 input split, so any O(n²) operator downstream (cross joins,
    * shingle self-joins) would run single-threaded — and AQE's
    * byte-based coalescing keeps it that way. Round-robin the rows to
    * full core parallelism before compute-dense stages. On a cluster
    * this is a cheap O(n) exchange that decouples compute parallelism
    * from file layout; for TB-scale inputs the scan is already split
    * and this becomes a no-op choice. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
