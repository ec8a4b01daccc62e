package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Coalesce, Divide, Expression, ExpressionInfo, Literal, Multiply, Sqrt, Subtract}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

import graft.functions.expressions.{DotProduct, PQAdc, SquaredL2, StringRollingHash, TopKPairsAgg}

/** SQL-surface registration for the engine's native functions, so they
  * are usable from `spark.sql(...)` / `expr(...)` strings, not just
  * the Scala Column API:
  *
  *   - graft_squared_l2(a, b)      — fused squared-L2 kernel
  *   - graft_dot(a, b)             — fused dot-product kernel
  *   - graft_l2(a, b)              — sqrt(graft_squared_l2)
  *   - graft_cosine_sim(a, b)      — cosine similarity (0.0 on zero norm)
  *   - graft_cosine_dist(a, b)     — 1 - graft_cosine_sim
  *   - graft_topk_pairs(d, id, k)  — bounded-heap top-k aggregate
  *   - graft_kmv_distinct(s, k)    — KMV distinct-count sketch aggregate
  *   - graft_mg_summary(s, k)      — Misra–Gries frequent-items summary
  *   - graft_co_moment(v, d)       — one-pass fixed-point co-moment aggregate
  *   - graft_kll_quantiles(x, ps, k) — KLL approximate-quantiles aggregate
  *   - graft_bloom_agg(s, m, k)    — Bloom-filter build aggregate (BINARY)
  *   - graft_bloom_contains(f, s)  — Bloom membership probe (no false negatives)
  *   - graft_pq_adc(codes, lut, k) — PQ asymmetric distance (codes vs
  *                                   a flattened per-query LUT)
  *   - graft_normalize_unicode(s[, form]) — Unicode normalization
  *                                   (literal NFC/NFD/NFKC/NFKD)
  *   - graft_multi_match(s, pats)  — Aho–Corasick substring screen
  *                                   against a literal pattern array
  *   - graft_deflate_size(s)       — DEFLATE byte count (compressibility
  *                                   quality signal)
  *   - graft_zvalue2(a, b)         — 64-bit Z-order interleave (layout
  *                                   clustering key)
  *   - graft_set_contains(s, set)  — O(1) frozen-set membership
  *                                   (literal ARRAY<STRING> as a
  *                                   plan-resident hash set)
  *
  * Two wiring paths share the same builders:
  * {{{
  *   // at session build (or spark.sql.extensions=graft.GraftExtensions):
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // on a live session:
  *   GraftExtensions.register(spark)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.SqrtCompareRewrite)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Same composition as VectorFunctions.cosineSimilarity: zero-norm
    * pairs yield 0.0. TRY division — ANSI-mode Divide THROWS on a zero
    * divisor instead of returning the NULL the coalesce expects. */
  /** Extract a literal ARRAY<STRING> argument (shared by the
    * multi-match family — the automaton must compile at plan time). */
  private def stringArrayLiteral(fn: String, e: Expression): Seq[String] = e match {
    case Literal(a: org.apache.spark.sql.catalyst.util.ArrayData,
        ArrayType(_: org.apache.spark.sql.types.StringType, _)) =>
      (0 until a.numElements()).map { i =>
        val u = a.getUTF8String(i)
        if (u == null) null else u.toString
      }
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _)
        if children.forall(_.foldable) =>
      children.map(_.eval() match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case null => null
        case other => throw new IllegalArgumentException(
          s"$fn pattern entries must be string literals, got $other")
      })
    case other => throw new IllegalArgumentException(
      s"$fn patterns must be a string-array literal, got $other")
  }

  private def cosineSim(a: Expression, b: Expression): Expression =
    Coalesce(Seq(
      Divide(DotProduct(a, b),
        Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))),
        org.apache.spark.sql.catalyst.expressions.EvalMode.TRY),
      Literal(0.0, DoubleType)))

  val builders: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_squared_l2"),
      info("graft_squared_l2", "squared Euclidean distance between two ARRAY<FLOAT>"),
      (args: Seq[Expression]) => SquaredL2(args(0), args(1))),
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product of two ARRAY<FLOAT>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_l2"),
      info("graft_l2", "Euclidean distance between two ARRAY<FLOAT>"),
      (args: Seq[Expression]) => Sqrt(SquaredL2(args(0), args(1)))),
    (FunctionIdentifier("graft_cosine_sim"),
      info("graft_cosine_sim", "cosine similarity of two ARRAY<FLOAT> (0.0 for zero-norm)"),
      (args: Seq[Expression]) => cosineSim(args(0), args(1))),
    (FunctionIdentifier("graft_cosine_dist"),
      info("graft_cosine_dist", "cosine distance (1 - similarity) of two ARRAY<FLOAT>"),
      (args: Seq[Expression]) =>
        Subtract(Literal(1.0, DoubleType), cosineSim(args(0), args(1)))),
    (FunctionIdentifier("graft_topk_pairs"),
      info("graft_topk_pairs", "k smallest (dist, id) pairs per group, ascending"),
      (args: Seq[Expression]) => {
        val k = args(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk_pairs k must be an integer literal, got $other")
        }
        TopKPairsAgg(args(0), args(1), k).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_kmv_distinct"),
      info("graft_kmv_distinct",
        "KMV distinct-count sketch of a STRING column: exact below k distinct values, (k-1)*2^60/h_k above (h_k = k-th smallest 60-bit md5-prefix hash)"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv_distinct k must be an integer literal, got $other")
        }
        graft.functions.expressions.KmvDistinctAgg(args(0), k).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_mg_summary"),
      info("graft_mg_summary",
        "Misra-Gries frequent-items summary of a STRING column: map<item, lower_bound> of <= k entries containing every item with frequency > N/k"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_mg_summary k must be an integer literal, got $other")
        }
        graft.functions.expressions.MisraGriesAgg(args(0), k).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_co_moment"),
      info("graft_co_moment",
        "one-pass fixed-point co-moment aggregate of an ARRAY<FLOAT> column -> ARRAY<BIGINT> [n, S_1..S_d, P_11..P_dd] (upper triangle); dim is an integer literal"),
      (args: Seq[Expression]) => {
        val d = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_co_moment dim must be an integer literal, got $other")
        }
        graft.functions.expressions.CoMomentAgg(args(0), d).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_kll_quantiles"),
      info("graft_kll_quantiles",
        "KLL mergeable approximate-quantiles aggregate of a DOUBLE column -> ARRAY<DOUBLE>; probs is an ARRAY<DOUBLE> literal, k an integer literal"),
      (args: Seq[Expression]) => {
        val probs = args(1) match {
          case Literal(a: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(DoubleType, _)) => a.toDoubleArray().toSeq
          case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _)
              if children.forall(_.isInstanceOf[Literal]) =>
            children.map(_.asInstanceOf[Literal].value match {
              case d: Double => d
              case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
              case i: Int => i.toDouble
              case other => throw new IllegalArgumentException(
                s"graft_kll_quantiles probs entries must be numeric literals, got $other")
            })
          case other => throw new IllegalArgumentException(
            s"graft_kll_quantiles probs must be an array literal, got $other")
        }
        val k = args(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kll_quantiles k must be an integer literal, got $other")
        }
        graft.functions.expressions.KllQuantilesAgg(args(0), probs, k)
          .toAggregateExpression()
      }),
    (FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "Bloom-filter build aggregate over a STRING column -> BINARY filter; numBits (multiple of 64) and numHashes are integer literals"),
      (args: Seq[Expression]) => {
        val (bits, hashes) = (args(1), args(2)) match {
          case (Literal(b: Int, _), Literal(h: Int, _)) => (b, h)
          case other => throw new IllegalArgumentException(
            s"graft_bloom_agg numBits/numHashes must be integer literals, got $other")
        }
        graft.functions.expressions.BloomAgg(args(0), bits, hashes).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains",
        "membership probe of a STRING key against a graft_bloom_agg filter literal; no false negatives"),
      (args: Seq[Expression]) =>
        graft.functions.expressions.BloomMightContain(args(0), args(1))),
    (FunctionIdentifier("graft_set_contains"),
      info("graft_set_contains",
        "O(1) membership of a STRING value in a frozen ARRAY<STRING> literal set (plan-resident hash set; array_contains over a literal is O(n) per row)"),
      (args: Seq[Expression]) => {
        val values = args(1) match {
          case Literal(a: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(StringType, _)) =>
            a.toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
              .map(v => if (v == null) null else v.toString).toSeq
          case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _)
              if children.forall(c => c.foldable && c.dataType == StringType) =>
            children.map { c =>
              val v = c.eval()
              if (v == null) null else v.toString
            }
          case other => throw new IllegalArgumentException(
            s"graft_set_contains set must be an ARRAY<STRING> literal, got $other")
        }
        graft.functions.expressions.StringSetContains(args(0), values)
      }),
    (FunctionIdentifier("graft_term_hash"),
      info("graft_term_hash",
        "rolling polynomial code-point hash (mult 31, mod 1e9+7) — the dedup tier's term id"),
      (args: Seq[Expression]) => StringRollingHash(args(0), 31L, 1000000007L)),
    (FunctionIdentifier("graft_term_hash2"),
      info("graft_term_hash2",
        "independent second rolling hash (mult 37, mod 999999937)"),
      (args: Seq[Expression]) => StringRollingHash(args(0), 37L, 999999937L)),
    (FunctionIdentifier("graft_pq_adc"),
      info("graft_pq_adc",
        "PQ asymmetric distance: ARRAY<TINYINT> codes scored against a flattened ARRAY<FLOAT> LUT of k entries per subspace"),
      (args: Seq[Expression]) => {
        val k = args(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_pq_adc k must be an integer literal, got $other")
        }
        PQAdc(args(0), args(1), k)
      }),
    (FunctionIdentifier("graft_normalize_unicode"),
      info("graft_normalize_unicode",
        "Unicode-normalize a STRING; form is a literal 'NFC'|'NFD'|'NFKC'|'NFKD' (default NFC)"),
      (args: Seq[Expression]) => {
        val form = args.lift(1) match {
          case None => "NFC"
          case Some(Literal(s, _: org.apache.spark.sql.types.StringType)) if s != null =>
            s.toString
          case Some(other) => throw new IllegalArgumentException(
            s"graft_normalize_unicode form must be a string literal, got $other")
        }
        graft.functions.expressions.NormalizeUnicode(args(0), form)
      }),
    (FunctionIdentifier("graft_multi_match"),
      info("graft_multi_match",
        "distinct 1-based indices of literal patterns occurring as substrings of a STRING (Aho-Corasick: one text walk regardless of pattern count)"),
      (args: Seq[Expression]) => {
        val pats = stringArrayLiteral("graft_multi_match", args(1))
        graft.functions.expressions.MultiPatternMatches(args(0), pats)
      }),
    (FunctionIdentifier("graft_multi_count"),
      info("graft_multi_count",
        "per-pattern substring occurrence counts against a literal pattern array (Aho-Corasick, one text walk)"),
      (args: Seq[Expression]) => {
        val pats = stringArrayLiteral("graft_multi_count", args(1))
        graft.functions.expressions.MultiPatternCounts(args(0), pats)
      }),
    (FunctionIdentifier("graft_zvalue2"),
      info("graft_zvalue2",
        "64-bit Z-order (Morton) interleave of two non-negative 32-bit BIGINTs - the write-time clustering key for dual-column scan pruning"),
      (args: Seq[Expression]) =>
        graft.operators.Layout.zValue2Expr(args(0), args(1))),
    (FunctionIdentifier("graft_deflate_size"),
      info("graft_deflate_size",
        "DEFLATE-compressed byte count of a STRING's UTF-8 bytes (level 6, raw) - compressibility quality signal"),
      (args: Seq[Expression]) => graft.functions.expressions.DeflateSize(args(0))))

  /** Register into an already-running session: function registry plus
    * the sqrt-comparison optimizer rule (idempotent — a second
    * register() must not stack duplicate rules). */
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.FunctionRegistration.register(spark, builders)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.SqrtCompareRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SqrtCompareRewrite
  }
}
