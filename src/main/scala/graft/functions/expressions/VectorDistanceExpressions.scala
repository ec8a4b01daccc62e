package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd distance kernels over ARRAY<FLOAT> columns.
  *
  * The HOF formulation (`aggregate(zip_with(...))`) is semantically
  * identical but materializes an intermediate array per row and runs a
  * lambda per element; these expressions generate a single fused
  * primitive loop (`getFloat` straight off Tungsten ArrayData, no
  * boxing, no allocation), which benches ~5-10x faster on the 4M-pair
  * graph-build joins. Arithmetic is the engine-wide determinism
  * contract: widen each element to double FIRST, accumulate
  * left-to-right — bit-identical to the HOF path and to the DuckDB
  * oracle.
  *
  * Both kernels stay inside WholeStageCodegen (no CodegenFallback), so
  * scan -> distance -> top-k pipelines fuse into one stage.
  */
abstract class FloatVecBinaryKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>/ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // Per-side element access: DOUBLE operands (e.g. PCA projections)
  // read directly, FLOAT widens first — identical to the HOF
  // formulation's cast-then-combine order in both cases.
  private def sideIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @inline protected final def elemL(v: ArrayData, i: Int): Double =
    if (sideIsFloat(left)) v.getFloat(i).toDouble else v.getDouble(i)
  @inline protected final def elemR(v: ArrayData, i: Int): Double =
    if (sideIsFloat(right)) v.getFloat(i).toDouble else v.getDouble(i)
  protected final def elemJavaL(v: String, i: String): String =
    if (sideIsFloat(left)) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
  protected final def elemJavaR(v: String, i: String): String =
    if (sideIsFloat(right)) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"

  /** Java source for the fused loop body; `a`/`b` are ArrayData vars,
    * `result` the output double var. */
  protected def loopBody(a: String, b: String, n: String, i: String, result: String): String

  /** Interpreted twin of the codegen loop. */
  protected def compute(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Mismatched dimensions are an ERROR, not a truncation: silently
    * folding over min(len) returns a plausible-but-wrong distance and
    * corrupts top-k results. The reference errors likewise
    * (ServingIndex.search's require(q.length == dim) mirrors it). */
  protected final def checkedLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"$prettyName: vector dimension mismatch: $n vs ${b.numElements()}")
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector dimension mismatch: " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |${loopBody(a, b, n, i, acc)}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Sum of squared element differences (squared L2). */
case class SquaredL2(left: Expression, right: Expression) extends FloatVecBinaryKernel {
  override def prettyName: String = "graft_squared_l2"
  override protected def loopBody(a: String, b: String, n: String, i: String, acc: String): String =
    s"""for (int $i = 0; $i < $n; $i++) {
       |  double d = ${elemJavaL(a, i)} - ${elemJavaR(b, i)};
       |  $acc += d * d;
       |}""".stripMargin
  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = checkedLen(a, b)
    var s = 0.0; var i = 0
    while (i < n) { val d = elemL(a, i) - elemR(b, i); s += d * d; i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SquaredL2 = copy(l, r)
}

/** Int8 ADC squared L2: `Σ (q_i − code_i·t_i)²` — the asymmetric
  * distance the int8-compressed serving scan runs per (row, query)
  * pair, against the dequantized code column. `t` (= scale/127 per
  * dimension) is a fit-time constant, so it rides the expression as a
  * reference object (one Java array shared by every row), not a child
  * column: the generated loop reads the query straight off Tungsten
  * ArrayData and the codes as ints — no per-element `element_at`
  * lambda, no boxed Seq, no interpreted `aggregate` (Spark never
  * codegens HOFs, so the previous formulation dropped the whole scan
  * stage out of WholeStageCodegen). Arithmetic is bit-identical to the
  * HOF it replaces: widen to double first, accumulate left-to-right. */
case class Int8AdcSquaredL2(left: Expression, right: Expression, t: Array[Double])
    extends BinaryExpression {
  import org.apache.spark.sql.types.IntegerType

  override def prettyName: String = "graft_int8_adc_l2"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT> query, ARRAY<INT> codes), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]; val c = b.asInstanceOf[ArrayData]
    val n = c.numElements()
    if (q.numElements() != n || t.length != n)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch: q=${q.numElements()} codes=$n scales=${t.length}")
    var s = 0.0; var i = 0
    while (i < n) {
      val d = q.getFloat(i).toDouble - c.getInt(i) * t(i)
      s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val tRef = ctx.addReferenceObj("int8AdcScales", t, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $c.numElements();
         |if ($q.numElements() != $n || $tRef.length != $n) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch: q=" + $q.numElements() +
         |    " codes=" + $n + " scales=" + $tRef.length);
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double d = (double) $q.getFloat($i) - $c.getInt($i) * $tRef[$i];
         |  $acc += d * d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8AdcSquaredL2 =
    copy(left = l, right = r)
}

/** Int8 quantization encode: `code_i = floor(v_i·127/scale_i + 0.5)`
  * (0 where the dimension's scale is 0) — the per-row encode pass of
  * the int8 serving tier, native for the same reason as
  * [[Int8AdcSquaredL2]]: the transform-over-sequence HOF ran
  * interpreted on every corpus row. Scales are the fit-time constant
  * reference object; output is a primitive int array. Bit-identical
  * to the HOF: the double product floors first, then narrows to int. */
case class Int8Encode(child: Expression, scales: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.IntegerType

  override def prettyName: String = "graft_int8_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  private def encode(v: ArrayData): ArrayData = {
    val n = v.numElements()
    if (scales.length != n)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch: vec=$n scales=${scales.length}")
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val s = scales(i)
      out(i) = if (s == 0.0) 0
        else math.floor(v.getFloat(i).toDouble * 127.0 / s + 0.5).toInt
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => {
      // one virtual call per ROW into the compiled encode loop (the
      // HOF alternative walked an expression tree per ELEMENT)
      val ref = ctx.addReferenceObj("int8EncodeSelf", this, classOf[Int8Encode].getName)
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($v)"
    })

  override protected def withNewChildInternal(c: Expression): Int8Encode =
    copy(child = c)
}

/** Rolling polynomial string hash — the native kernel behind
  * [[graft.operators.TextAnalysis.termHash]]/`termHash2`, which the
  * whole dedup/fingerprint tier evaluates once per token/shingle. The
  * HOF formulation (split("") → transform(ascii) → aggregate fold)
  * allocates a per-character array and walks an interpreted lambda per
  * element for EVERY term; this runs one compiled code-point loop.
  *
  * Bit-identical contract (pinned by a ScalaCheck property and every
  * hash-oracled dedup query): iterate CODE POINTS (Spark's `split(s,
  * "")` splits per character and `ascii` is `codePointAt(0)` of the
  * first char — verified against spark-catalyst 4.1.2 bytecode); seed
  * = first code point UNreduced; then `h = (h·mult + cp) % mod`
  * left-to-right; empty string → 0. */
case class StringRollingHash(child: Expression, mult: Long, mod: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}

  override def prettyName: String = "graft_rolling_hash"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }

  def hash(s: String): Long = {
    if (s.isEmpty) return 0L
    var i = 0
    var h = 0L
    var first = true
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (first) { h = cp.toLong; first = false }
      else h = (h * mult + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  override def nullSafeEval(input: Any): Any =
    hash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => {
      // one virtual call per term into the compiled loop
      val ref = ctx.addReferenceObj("rollingHashSelf", this,
        classOf[StringRollingHash].getName)
      s"$ref.hash($s.toString())"
    })

  override protected def withNewChildInternal(c: Expression): StringRollingHash =
    copy(child = c)
}

/** The ~60-bit windowed chunk-id array behind the chunk/winnowing
  * dedup tier ([[graft.operators.Dedup]]): for every window start `i`,
  * two independent k-long polynomial folds over two per-token hash
  * streams, packed `fold1·1e9 + fold2`. The HOF formulation
  * (transform over sequence, with a `slice` allocation and an
  * interpreted aggregate per window) did O(n·k) lambda dispatches and
  * O(n) array copies per document; this is one compiled O(n·k)
  * primitive loop, zero allocations beyond the output. Arithmetic is
  * the exact contract the DuckDB twins replay: seed = stream value at
  * the window start (unreduced), then `(f·31 + h1[j]) % 1000000007`
  * and `(f·37 + h2[j]) % 999999937` left-to-right.
  *
  * Inputs must be equal-length and `>= k` — every caller filters
  * `size(tids) >= k` first (the HOF's descending-sequence degenerate
  * case was a bug surface, not a behavior to keep). */
case class DualWindowHash(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  import org.apache.spark.sql.types.LongType
  require(k >= 1, s"window k must be >= 1, got $k")

  override def prettyName: String = "graft_dual_window_hash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  def compute(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"$prettyName: stream length mismatch: $n vs ${b.numElements()}")
    if (n < k)
      throw new IllegalArgumentException(
        s"$prettyName: need >= $k token hashes, got $n (callers filter size >= k)")
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var f1 = a.getLong(i)
      var f2 = b.getLong(i)
      var j = 1
      while (j < k) {
        f1 = (f1 * 31L + a.getLong(i + j)) % 1000000007L
        f2 = (f2 * 37L + b.getLong(i + j)) % 999999937L
        j += 1
      }
      out(i) = f1 * 1000000000L + f2
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // one virtual call per document into the compiled window loop
      val ref = ctx.addReferenceObj("dualWindowHashSelf", this,
        classOf[DualWindowHash].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DualWindowHash =
    copy(left = l, right = r)
}

/** 1-based index of the first position where two ARRAY<BIGINT> agree,
  * 0 when they agree nowhere — the native kernel behind the LSH
  * first-matching-table dedup filter
  * ([[graft.index.GraphBuilder.lshKnnEdges]]). The HOF formulation
  * (`array_position(zip_with(a, b, _===_), true)`) allocated a fresh
  * boolean array per evaluated row, and the bucket join evaluates the
  * filter on EVERY (pair, table) match — up to numHashTables times
  * per candidate pair, tens of millions of allocations per build.
  * This is one compiled loop over (typically 8) longs, no allocation.
  * Bit-identical predicate: same 1-based position, same 0-if-absent
  * convention as `array_position`. */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.LongType

  override def prettyName: String = "graft_first_equal_index"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"$prettyName: array length mismatch: $n vs ${y.numElements()}")
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) return (i + 1).toLong
      i += 1
    }
    0L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: array length mismatch: " + $n + " vs " + $b.numElements());
         |}
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) { ${ev.value} = $i + 1L; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FirstEqualIndex =
    copy(left = l, right = r)
}

/** Ordered-pair expansion of a posting list — the native kernel behind
  * the shingle pair generator ([[graft.operators.Dedup]]): for a
  * sorted ARRAY<BIGINT> `ids`, emits `(ids(i), ids(i))` (the diagonal
  * size-contribution row) followed by `(ids(i), ids(j))` for every
  * j > i+1... precisely, for each i ascending: the self pair then the
  * pairs with every later element — the exact flatten order of the
  * HOF it replaces:
  * `flatten(transform(ids, (x, i) => concat(array(struct(x, x)),
  * transform(slice(ids, i + 2, size(ids)), y => struct(x, y)))))`.
  * The HOF ran interpreted per ELEMENT and the inner `slice`
  * allocated a fresh tail copy per element (O(f²) copies for an
  * f-long list); this is one compiled loop writing the output structs
  * directly. Output size is the same f·(f+1)/2 the HOF materialized —
  * the hot-shingle cap bounds f on the capped tier, and the uncapped
  * tier's f² blowup is the caller's documented opt-in. */
case class PairExpand(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def prettyName: String = "graft_pair_expand"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.simpleString}")
  }

  def expand(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n * (n + 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val x = v.getLong(i)
      out(k) = InternalRow(x, x)
      k += 1
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(x, v.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = expand(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => {
      // one virtual call per posting list into the compiled loop
      val ref = ctx.addReferenceObj("pairExpandSelf", this, classOf[PairExpand].getName)
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.expand($v)"
    })

  override protected def withNewChildInternal(c: Expression): PairExpand =
    copy(child = c)
}

/** Dot product. */
case class DotProduct(left: Expression, right: Expression) extends FloatVecBinaryKernel {
  override def prettyName: String = "graft_dot"
  override protected def loopBody(a: String, b: String, n: String, i: String, acc: String): String =
    s"""for (int $i = 0; $i < $n; $i++) {
       |  $acc += ${elemJavaL(a, i)} * ${elemJavaR(b, i)};
       |}""".stripMargin
  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = checkedLen(a, b)
    var s = 0.0; var i = 0
    while (i < n) { s += elemL(a, i) * elemR(b, i); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct = copy(l, r)
}
