package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole per-document statistics block in ONE compiled pass over
  * the token array — the native kernel behind
  * [[graft.operators.TextAnalysis.withTextStats]]. The HOF
  * formulation evaluated, per row: `size(array_distinct(toks))`
  * TWICE (each allocating a fresh array), an interpreted `aggregate`
  * lambda per token for the length sum, and an interpreted `filter`
  * lambda with a 5-way OR per token for the stopword count — and
  * `aggregate`/`filter` are CodegenFallback, so the stats projection
  * dropped out of whole-stage codegen entirely.
  *
  * The RATIOS AND QUALITY SCORE are computed inside the kernel too,
  * not as downstream column arithmetic, deliberately: quality-gated
  * consumers filter on `quality_score`, and predicate pushdown
  * substitutes a projected alias's DEFINING EXPRESSION into the
  * filter condition — a formula referencing the counts struct 12
  * times became 12 full kernel copies in the filter (FilterExec does
  * no subexpression elimination), measured SLOWER than the HOFs it
  * replaced. With every output a single struct field, a pushed-down
  * `quality_score >= τ` carries exactly ONE kernel copy.
  *
  * Bit-identity with the HOF formulation (TextStatsKernelSpec pins
  * it differentially):
  * - n_tokens   = size(toks); n_distinct = size(array_distinct(toks))
  *   (binary string equality; a NULL element is one distinct value)
  * - distinct_ratio = round(n_distinct / n_tokens, 4),
  *   avg_token_len  = round(sum(length(t)) / n_tokens, 4),
  *   stopword_ratio = round(n_stop / n_tokens, 4) — same IEEE double
  *   division and the exact Round semantics (HALF_UP via
  *   BigDecimal.valueOf, NaN/Infinity passthrough; 0/0 stays NaN)
  * - a NULL element nulls the length sum (null + x = null), so
  *   avg_token_len is null then — mirrored by the nullable field;
  *   the stopword filter DROPS null elements (NULL predicate)
  * - quality_score = round(Σ of four 0.25 terms, 2) with each
  *   `when(cond, 0.25).otherwise(0.0)` false on NULL/NaN — exactly
  *   Java comparison semantics on the same doubles
  * (tokens() output never actually contains NULL elements — split
  * never emits them — but the mirror is exact anyway.) */
case class TextStats(child: Expression, markers: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "graft_text_stats"
  // NOT nullIntolerant: on NULL tokens the HOF block emits NULL for
  // every stat EXCEPT quality_score, whose when-chain's NULL
  // conditions all fall to otherwise(0.0) — so quality is 0.0, not
  // NULL, and the struct itself is never NULL.
  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = true),
    StructField("n_distinct", LongType, nullable = true),
    StructField("distinct_ratio", DoubleType, nullable = true),
    StructField("avg_token_len", DoubleType, nullable = true),
    StructField("stopword_ratio", DoubleType, nullable = true),
    StructField("quality_score", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }

  @transient private lazy val markerBytes: Array[UTF8String] =
    markers.map(UTF8String.fromString).toArray

  // Distinct counting runs on a generation-stamped open-address
  // scratch table (ThreadLocal — the CompressExpressions Deflater
  // idiom): a java.util.HashSet per ROW allocates and zeroes a
  // 2n-bucket table plus one Node per distinct token, and that churn
  // alone measured comparable to the interpreted HOFs it replaced.
  // Stamps make per-row reset O(1); the table persists across the
  // rows of a task and doubles rarely.
  @transient private lazy val scratch = new ThreadLocal[TextStats.Scratch] {
    override def initialValue(): TextStats.Scratch = new TextStats.Scratch
  }

  /** round(x, s) with Spark's exact Round semantics (RoundBase,
    * HALF_UP): NaN/Infinity pass through, else BigDecimal.valueOf. */
  private def rnd(x: Double, s: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  private val nullRow: InternalRow =
    InternalRow(null, null, null, null, null, 0.0)

  def compute(v: ArrayData): InternalRow = {
    if (v == null) return nullRow
    val n = v.numElements()
    val s = scratch.get()
    s.reset(n)
    var seenNull = false
    var sumLen = 0L
    var sumIsNull = false
    var nStop = 0L
    var nDistinct = 0L
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) { seenNull = true; sumIsNull = true }
      else {
        val t = v.getUTF8String(i)
        if (s.add(t)) nDistinct += 1
        sumLen += t.numChars()
        val m = markerBytes
        var j = 0
        while (j < m.length) {
          if (t.equals(m(j))) { nStop += 1; j = m.length } else j += 1
        }
      }
      i += 1
    }
    if (seenNull) nDistinct += 1
    val nTok = n.toDouble
    val distinctRatio = rnd(nDistinct / nTok, 4)
    val avgLen = if (sumIsNull) null else java.lang.Double.valueOf(rnd(sumLen / nTok, 4))
    val stopRatio = rnd(nStop / nTok, 4)
    val quality = rnd(
      (if (n >= 20 && n <= 1000) 0.25 else 0.0) +
      (if (avgLen != null && avgLen.doubleValue() >= 3.0 && avgLen.doubleValue() <= 12.0)
         0.25 else 0.0) +
      (if (distinctRatio >= 0.3) 0.25 else 0.0) +
      (if (stopRatio >= 0.01 && stopRatio <= 0.6) 0.25 else 0.0), 2)
    InternalRow(n.toLong, nDistinct, distinctRatio, avgLen, stopRatio, quality)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    // one virtual call per document into the compiled loop; the
    // child's null folds into the kernel's null-row rule above
    val ref = ctx.addReferenceObj("textStatsSelf", this, classOf[TextStats].getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          $ref.compute(${c.isNull} ? null : ${c.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): TextStats =
    copy(child = c)
}

object TextStats {
  /** Open-address distinct set with generation stamps: a slot is live
    * iff `stamps(i) == gen`, so per-row reset is one increment — no
    * table zeroing, no per-entry Node allocation. Linear probing,
    * power-of-two capacity kept at least 2× the row's token count. */
  final class Scratch {
    private var keys: Array[UTF8String] = new Array[UTF8String](1024)
    private var stamps: Array[Int] = new Array[Int](1024)
    private var gen = 0

    def reset(n: Int): Unit = {
      var cap = keys.length
      if (cap < n * 2) {
        while (cap < n * 2) cap <<= 1
        keys = new Array[UTF8String](cap)
        stamps = new Array[Int](cap)
        gen = 0
      }
      gen += 1
      if (gen == Int.MaxValue) { // stamp wrap: zero once, restart
        java.util.Arrays.fill(stamps, 0)
        gen = 1
      }
    }

    /** true iff `t` was not in the set yet (and inserts it). */
    def add(t: UTF8String): Boolean = {
      val mask = keys.length - 1
      var i = t.hashCode() & mask
      while (stamps(i) == gen) {
        if (keys(i).equals(t)) return false
        i = (i + 1) & mask
      }
      keys(i) = t
      stamps(i) = gen
      true
    }
  }
}

/** Word k-shingles joined by single spaces — the native kernel behind
  * [[graft.operators.TextAnalysis.shingles]]. The HOF formulation
  * (`transform(sequence(...), i => concat_ws(" ", element_at×k))`)
  * ran interpreted per WINDOW: a lambda dispatch, k element_at
  * evaluations, and a concat_ws expression tree each — and dropped
  * the projection out of whole-stage codegen (HOFs are
  * CodegenFallback). One compiled loop building each window string
  * once. Output is bit-identical (same strings, same order, same
  * `< k tokens → empty array` rule, including the when-guard's
  * NULL-input → empty-array behavior, and concat_ws's skip-NULLs
  * contract inside a window).
  *
  * NOT nullIntolerant: the HOF's `when(size(toks) >= k, ...)
  * .otherwise(array())` turns a NULL token array into an EMPTY
  * shingle array, so this kernel never returns NULL either. */
case class ShingleJoin(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  require(k >= 1, s"shingle k must be >= 1, got $k")

  override def prettyName: String = s"graft_shingles_$k"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val space = UTF8String.fromString(" ")

  private val emptyResult = new GenericArrayData(new Array[Any](0))

  def shingle(v: ArrayData): ArrayData = {
    if (v == null) return emptyResult
    val n = v.numElements()
    if (n < k) return emptyResult
    val out = new Array[Any](n - k + 1)
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        window(j) = if (v.isNullAt(i + j)) null else v.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    shingle(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("shingleJoinSelf", this, classOf[ShingleJoin].getName)
    // never-null result: fold the child's null into the kernel's
    // null-input → empty-array rule
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.shingle(${c.isNull} ? null : ${c.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): ShingleJoin =
    copy(child = c)
}
