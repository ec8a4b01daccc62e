package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distance / similarity primitives over `ARRAY<FLOAT>` columns.
  *
  * Mirrors the reference's metric surface (Euclidean default, cosine
  * tested; reference `/root/reference/src/LMDiskANN.jl:58,62,242`) as
  * Catalyst column expressions built from the codegen'd higher-order
  * functions `zip_with` / `aggregate` — no UDFs, so the whole distance
  * computation stays inside WholeStageCodegen and is usable in any
  * pushed-down/pruned plan.
  *
  * Determinism contract (needed for the DuckDB oracle): every element is
  * cast to double FIRST, then combined left-to-right in array order, so
  * the floating-point result is bit-identical to any engine that does the
  * same sequential fold (DuckDB `list_sum(list_transform(...))`).
  *
  * Scale note: these are per-row scalar expressions — they shuffle
  * nothing and parallelize embarrassingly. At 100 TB the cost model is
  * simply bytes-scanned; keep the vector column pruned (`select` only
  * `vec`) and these expressions pipeline inside the scan stage.
  */
object VectorFunctions {

  import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}

  import graft.functions.expressions.{BoundedCollectListAgg, DotProduct, FirstEqualIndex, PairExpand, SimhashSumsAgg, SquaredL2, TopKPairsAgg}

  /** Sum of an `ARRAY<DOUBLE>` column, sequential left-to-right fold. */
  private def seqSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (s, v) => s + v)

  /** Squared Euclidean distance — native fused-loop kernel. */
  def squaredEuclidean(a: Column, b: Column): Column =
    ExpressionUtils.column(SquaredL2(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Euclidean (L2) distance — the reference's default metric. */
  def euclidean(a: Column, b: Column): Column = sqrt(squaredEuclidean(a, b))

  /** Dot product — native fused-loop kernel. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** 1-based first index where two ARRAY<BIGINT> columns agree (0 if
    * none) — native fused loop, the allocation-free twin of
    * `array_position(zip_with(a, b, _===_), true)`. */
  def firstEqualIndex(a: Column, b: Column): Column =
    ExpressionUtils.column(FirstEqualIndex(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** HOF (aggregate/zip_with) formulations — bit-identical to the
    * native kernels; kept for plan comparison and as the portable
    * fallback. */
  def squaredEuclideanHof(a: Column, b: Column): Column =
    seqSum(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }))
  def dotHof(a: Column, b: Column): Column =
    seqSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Per-group top-k by (dist, id): k smallest pairs ascending as
    * ARRAY<STRUCT<dist,id>>. Map-side partial aggregation (bounded
    * heap) — use instead of Window row_number for top-k at scale. */
  def topKPairs(dist: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKPairsAgg(ExpressionUtils.expression(dist), ExpressionUtils.expression(id), k)
        .toAggregateExpression())

  /** topKPairs that also de-duplicates ids inside the heap — for
    * iterative consumers whose candidate stream repeats (id, dist)
    * pairs deterministically (beam search frontiers), replacing a
    * separate dedup shuffle. */
  def topKPairsDistinct(dist: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKPairsAgg(ExpressionUtils.expression(dist), ExpressionUtils.expression(id), k,
        distinctIds = true).toAggregateExpression())

  /** `collect_list` of a BIGINT column bounded at `limit` values per
    * group: the full list when the group holds ≤ limit, NULL when it
    * holds more — with per-key aggregation state capped at `limit`
    * longs (a skewed key never materializes; see
    * [[graft.functions.expressions.BoundedCollectListAgg]]). */
  def boundedCollectList(v: Column, limit: Int): Column =
    ExpressionUtils.column(
      BoundedCollectListAgg(ExpressionUtils.expression(v), limit).toAggregateExpression())

  /** All SimHash bit-sums in one aggregation buffer — ARRAY<BIGINT>
    * of length a.length; see
    * [[graft.functions.expressions.SimhashSumsAgg]]. */
  def simhashSums(tid: Column, cnt: Column,
      a: Array[Long], b: Array[Long], p: Long): Column =
    ExpressionUtils.column(
      SimhashSumsAgg(ExpressionUtils.expression(tid), ExpressionUtils.expression(cnt),
        a, b, p).toAggregateExpression())

  /** Ordered-pair expansion of a (sorted) ARRAY<BIGINT>: the diagonal
    * (x, x) plus every (x, y) with y after x, as
    * ARRAY<STRUCT<a, b>> — native fused loop (see
    * [[graft.functions.expressions.PairExpand]]). */
  def pairExpand(ids: Column): Column =
    ExpressionUtils.column(PairExpand(ExpressionUtils.expression(ids)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. Zero-norm vectors get similarity 0
    * — via try_divide, which yields NULL on a zero divisor under BOTH
    * ANSI and legacy modes (plain `/` THROWS under ANSI, the Spark 4
    * default, so the coalesce alone would never see the row) —
    * Metric.Cosine likewise defines distance 1.0 for zero vectors, so
    * the distributed and serving paths agree. */
  def cosineSimilarity(a: Column, b: Column): Column =
    cosineSimFromNorms(dot(a, b), l2Norm(a), l2Norm(b))

  /** The single source of the zero-norm/ANSI contract, for callers
    * that precompute norms (exact-kNN, near-dup pair loops): TRY
    * division + coalesce — four hand-rolled copies of this previously
    * drifted (one site kept plain `/`, which THROWS under ANSI). */
  def cosineSimFromNorms(dotAB: Column, nrmA: Column, nrmB: Column): Column =
    coalesce(try_divide(dotAB, nrmA * nrmB), lit(0.0))

  /** Cosine distance = 1 - cosine similarity (Distances.jl CosineDist). */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** L2-normalize a float array column (returns ARRAY<DOUBLE>);
    * all-zero vectors normalize to all-zero (TRY division — plain `/`
    * throws under ANSI). WARNING: the norm expression is re-evaluated
    * per ELEMENT inside the transform lambda (O(d²) per row) — for hot
    * paths materialize `l2Norm` into a column first and divide by it
    * (see GraphBuilder.lshKnnEdges). Kept for small-d convenience. */
  def l2Normalize(a: Column): Column =
    transform(a, x => coalesce(try_divide(x.cast("double"), l2Norm(a)), lit(0.0)))

  /** L2-normalized ARRAY<FLOAT> copy given a PRE-MATERIALIZED norm
    * column; zero vectors pass through unchanged. The norm must be its
    * own column — inlining `l2Norm(vec)` into the transform lambda
    * re-evaluates the full dot product per element (O(d²)/row). */
  def normalizedByNorm(vec: Column, nrm: Column): Column =
    when(nrm === 0.0, vec.cast("array<float>"))
      .otherwise(transform(vec, x => x.cast("double") / nrm).cast("array<float>"))

  /** One-pass fixed-point co-moment aggregate:
    * `[n, S₁..S_d, P₁₁..P_dd]` as ARRAY<BIGINT> — the covariance /
    * Gram / whitening input without the n·d²/2-row explode-shuffle.
    * See [[graft.functions.expressions.CoMomentAgg]]. */
  def coMoment(vec: Column, dim: Int): Column =
    ExpressionUtils.column(
      graft.functions.expressions.CoMomentAgg(ExpressionUtils.expression(vec), dim)
        .toAggregateExpression())

  /** ARRAY<FLOAT> → BINARY binary16 packing (2 bytes per component) —
    * the storage form of eltype="Float16" indexes. */
  def halfPack(a: Column): Column =
    ExpressionUtils.column(graft.functions.expressions.FloatArrayToHalf(ExpressionUtils.expression(a)))

  /** BINARY binary16 packing → ARRAY<FLOAT> (exact decode). */
  def halfUnpack(a: Column): Column =
    ExpressionUtils.column(graft.functions.expressions.HalfToFloatArray(ExpressionUtils.expression(a)))
}
