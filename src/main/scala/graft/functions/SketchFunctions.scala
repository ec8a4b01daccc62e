package graft.functions

import org.apache.spark.sql.Column

import graft.functions.expressions.KmvDistinctAgg

/** Mergeable-sketch aggregates for corpus-card statistics.
  *
  * At 100 TB the "how many distinct X" questions (vocabulary size per
  * source, unique URLs per shard, …) are exactly the ones an exact
  * `COUNT(DISTINCT)` makes expensive — its plan shuffles the full
  * distinct value set. A sketch's partial state is size-bounded and
  * merges associatively, so the shuffle per group is constant-size and
  * map-side partial aggregation applies. Unlike Spark's built-in
  * `approx_count_distinct` (HLL++, whose estimate no other engine
  * reproduces), these sketches are hash-transparent: the estimate is a
  * deterministic function of md5 prefixes any engine can recompute, so
  * correctness is oracle-checked end to end, not just error-banded.
  */
object SketchFunctions {

  import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}

  /** KMV distinct-count estimate of a STRING column; exact below k
    * distinct values, expected relative error ~1/sqrt(k-2) above. */
  def kmvDistinct(value: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvDistinctAgg(ExpressionUtils.expression(value), k).toAggregateExpression())

  /** Misra–Gries frequent-items summary (`map<item, lower_bound>`,
    * ≤ k entries): contains every item with true frequency > N/k;
    * stored counts undercount by at most N/k. The bounded-state
    * candidate stage of exact two-pass heavy-hitter mining
    * ([[graft.operators.TextAnalysis.frequentNgrams]]). */
  def mgSummary(value: Column, k: Int): Column =
    ExpressionUtils.column(
      expressions.MisraGriesAgg(ExpressionUtils.expression(value), k).toAggregateExpression())

  /** KLL-style mergeable approximate quantiles of a DOUBLE column:
    * one estimate (an actual input value) per requested probability.
    * The rank-statistics counterpart of [[kmvDistinct]]/[[mgSummary]]:
    * exact `percentile` shuffles and sorts the whole column per group;
    * this carries an O(k·log(n/k)) summary per partition with
    * map-side combine. Gate consumers on measured rank error
    * (the q151 pattern) — sketch values depend on partitioning. */
  def kllQuantiles(value: Column, probs: Seq[Double], k: Int = 256): Column =
    ExpressionUtils.column(
      expressions.KllQuantilesAgg(ExpressionUtils.expression(value), probs, k)
        .toAggregateExpression())

  /** Bloom-filter build aggregate: BINARY serialized filter over the
    * column's non-null values. Partial state is the fixed bit array;
    * merge is bitwise OR. Size with
    * [[graft.functions.expressions.BloomBuffer.optimalNumBits]]. */
  def bloomAgg(value: Column, numBits: Int, numHashes: Int): Column =
    ExpressionUtils.column(
      expressions.BloomAgg(ExpressionUtils.expression(value), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe against a built filter (`filter` must be a
    * `lit(bytes)` of [[bloomAgg]]'s result). False positives possible
    * at the sized rate; false negatives never. */
  def bloomContains(filter: Column, value: Column): Column =
    ExpressionUtils.column(
      expressions.BloomMightContain(
        ExpressionUtils.expression(filter), ExpressionUtils.expression(value)))
}
