package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting: two-phase aggregation where phase one
  * groups on (key, salt) — spreading a hot key over `salts` reducers —
  * and phase two merges the partials by key. Results are identical to
  * the direct aggregation (the DuckDB oracle for q19 checks exactly
  * that); only the shuffle distribution changes.
  *
  * When to use at 100 TB: a power-law key (one customer = 20% of rows)
  * makes one reducer the straggler. AQE's skew-join splitting handles
  * the JOIN case; salting handles the AGGREGATION case and composes
  * with exact decimal sums because addition is associative. */
object Skew {

  /** Salted count + exact decimal sum per key. `valueCol` must be
    * decimal-summable (cast upstream via Tables.dec). */
  def saltedAgg(df: DataFrame, keyCol: Column, valueCol: Column, salts: Int): DataFrame = {
    val salted = df.select(
      keyCol.as("key"),
      valueCol.as("v"),
      (pmod(hash(monotonically_increasing_id()), lit(salts))).as("salt"))
    salted
      .groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pc")).as("n_rows"), sum(col("ps")).as("sum_value"))
  }
}
