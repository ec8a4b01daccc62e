package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring matcher (Aho & Corasick 1975,
  * "Efficient String Matching: An Aid to Bibliographic Search").
  *
  * The 100 TB problem this solves: phrase-blocklist screening — NSFW /
  * policy wordlists, contamination canaries, PII trigger phrases —
  * where the pattern set is thousands of entries and the corpus is the
  * whole crawl. Token-level ops ([[graft.operators.Dedup]]'s exact-key
  * blocklist joins, bloom membership) can't see MULTI-WORD or
  * mid-token substrings, and the naive `patterns.map(contains(text,_))
  * .reduce(or)` evaluates |patterns| substring searches per row —
  * O(rows · patterns · |text|). The automaton walks each document's
  * bytes ONCE: O(rows · |text| + matches), independent of |patterns|.
  *
  * Spark shape: the automaton is compiled ONCE from the literal
  * pattern list and rides into generated code as a reference object
  * (the [[BloomMightContain]] idiom) — a narrow, whole-stage-codegen
  * map with zero per-row setup. Byte-level trie over UTF-8, so
  * matching is exact for any input and never decodes code points on
  * the hot path. Case handling is the caller's (pass `lower(text)`
  * and lowercase patterns).
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "AhoCorasick needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern would match everywhere")

  // Flat trie: child table indexed [node * 256 + byte] -> node (dense
  // — pattern sets are small relative to corpus; a 10k-phrase English
  // blocklist is ~60k nodes = 61 MB of ints, executor-resident once).
  // fail(n) = longest proper suffix of n's string that is a node;
  // out(n) = pattern indices ending at n; outLink(n) = nearest fail
  // ancestor with non-empty out (so match collection skips the empty
  // chain instead of walking every fail hop).
  private val (goto_, fail, outHead, outNext, outPat, outLink) = build()

  private def build(): (Array[Int], Array[Int], Array[Int], Array[Int], Array[Int], Array[Int]) = {
    val pats = patterns.map(_.getBytes("UTF-8"))
    val maxNodes = 1 + pats.map(_.length).sum
    val children = Array.fill(maxNodes * 256)(-1)
    var nNodes = 1
    // out lists as linked cells: outHead(node) -> cell, cell -> (pat, next)
    val outHeadB = Array.fill(maxNodes)(-1)
    val outNextB = new Array[Int](pats.length)
    val outPatB = new Array[Int](pats.length)
    var nCells = 0
    for (pi <- pats.indices) {
      var node = 0
      for (b <- pats(pi)) {
        val idx = node * 256 + (b & 0xff)
        if (children(idx) == -1) { children(idx) = nNodes; nNodes += 1 }
        node = children(idx)
      }
      outPatB(nCells) = pi
      outNextB(nCells) = outHeadB(node)
      outHeadB(node) = nCells
      nCells += 1
    }
    // BFS fail links; missing transitions completed in place so the
    // match loop is a single array read per byte (no fail-chasing).
    val failB = new Array[Int](nNodes)
    val outLinkB = Array.fill(nNodes)(-1)
    val queue = new java.util.ArrayDeque[Integer]()
    var b = 0
    while (b < 256) {
      val c = children(b)
      if (c == -1) children(b) = 0
      else { failB(c) = 0; queue.add(c) }
      b += 1
    }
    while (!queue.isEmpty) {
      val n = queue.poll()
      val f = failB(n)
      outLinkB(n) = if (outHeadB(f) != -1) f else outLinkB(f)
      var bb = 0
      while (bb < 256) {
        val c = children(n * 256 + bb)
        val viaFail = children(f * 256 + bb)
        if (c == -1) children(n * 256 + bb) = viaFail
        else { failB(c) = viaFail; queue.add(c) }
        bb += 1
      }
    }
    (java.util.Arrays.copyOf(children, nNodes * 256), failB,
      java.util.Arrays.copyOf(outHeadB, nNodes), outNextB, outPatB, outLinkB)
  }

  /** Distinct 1-based indices of patterns occurring in `text`,
    * ascending (1-based to mirror SQL array indexing — the DuckDB
    * oracle replays with `pats[i]`). */
  def matchesUtf8(text: UTF8String): ArrayData =
    new GenericArrayData(matchSet(text.getBytes).map(_ + 1))

  def matchSet(bytes: Array[Byte]): Array[Int] = {
    val seen = new java.util.BitSet(patterns.length)
    var node = 0
    var i = 0
    while (i < bytes.length) {
      node = goto_(node * 256 + (bytes(i) & 0xff))
      var m = if (outHead(node) != -1) node else outLink(node)
      while (m != -1) {
        var cell = outHead(m)
        while (cell != -1) { seen.set(outPat(cell)); cell = outNext(cell) }
        m = outLink(m)
      }
      i += 1
    }
    val res = new Array[Int](seen.cardinality())
    var j = 0
    var p = seen.nextSetBit(0)
    while (p >= 0) { res(j) = p; j += 1; p = seen.nextSetBit(p + 1) }
    res
  }

  /** Per-pattern occurrence counts over `text` — EVERY match position
    * (overlapping included: the automaton reports all ending
    * positions). For patterns with no proper border (no prefix that is
    * also a suffix — true of multi-word phrases) occurrences cannot
    * self-overlap, and this equals the left-to-right non-overlapping
    * count any `replace`-based SQL replay computes (the q167 oracle
    * identity). 1-based index i of the result mirrors `patterns[i]`. */
  def countsUtf8(text: UTF8String): ArrayData =
    new GenericArrayData(countAll(text.getBytes))

  def countAll(bytes: Array[Byte]): Array[Int] = {
    val counts = new Array[Int](patterns.length)
    var node = 0
    var i = 0
    while (i < bytes.length) {
      node = goto_(node * 256 + (bytes(i) & 0xff))
      var m = if (outHead(node) != -1) node else outLink(node)
      while (m != -1) {
        var cell = outHead(m)
        while (cell != -1) { counts(outPat(cell)) += 1; cell = outNext(cell) }
        m = outLink(m)
      }
      i += 1
    }
    counts
  }

  // fail retained for debuggability/asserts; matching never consults
  // it (transitions were completed in build()).
  locally { val _ = fail }
}

/** `graft_multi_match(text)` over a compile-time pattern list —
  * ARRAY<INT> of the distinct 1-based pattern indices found in `text`
  * (empty array if none; NULL text -> NULL). See [[AhoCorasick]]. */
case class MultiPatternMatches(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"text must be STRING, got ${child.dataType.catalogString}")
    else if (patterns.isEmpty || patterns.exists(p => p == null || p.isEmpty))
      TypeCheckResult.TypeCheckFailure(
        "patterns must be a non-empty list of non-empty strings")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val automaton = new AhoCorasick(patterns.toArray)

  override def nullSafeEval(text: Any): Any =
    automaton.matchesUtf8(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", automaton, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, text => s"${ev.value} = $acRef.matchesUtf8($text);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternMatches =
    copy(child = newChild)
  override def prettyName: String = "graft_multi_match"
}

/** `graft_multi_count(text)` over a compile-time pattern list —
  * ARRAY<INT> of per-pattern occurrence counts (position i = pattern
  * i+1; NULL text -> NULL). Same automaton, same one-walk cost as
  * [[MultiPatternMatches]]; see [[AhoCorasick.countsUtf8]] for the
  * overlap/`replace`-count equivalence contract. */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"text must be STRING, got ${child.dataType.catalogString}")
    else if (patterns.isEmpty || patterns.exists(p => p == null || p.isEmpty))
      TypeCheckResult.TypeCheckFailure(
        "patterns must be a non-empty list of non-empty strings")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val automaton = new AhoCorasick(patterns.toArray)

  override def nullSafeEval(text: Any): Any =
    automaton.countsUtf8(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", automaton, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, text => s"${ev.value} = $acRef.countsUtf8($text);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCounts =
    copy(child = newChild)
  override def prettyName: String = "graft_multi_count"
}

/** O(1) membership test against a FROZEN string set that rides the
  * plan as a reference object (the [[AhoCorasick]] idiom applied to
  * set membership). The streaming OOV monitor previously tested each
  * token with `array_contains` over a vocabulary literal — an
  * O(|vocab|) linear scan per token, which at realistic frozen-vocab
  * sizes (32k–256k entries) dominates the stream's per-row cost; a
  * literal MAP fares no better (Spark map literals are array-backed,
  * `element_at` is also a linear scan). Here the set is hashed ONCE
  * per executor (transient lazy), each probe is one UTF8String hash
  * lookup, and the expression stays inside whole-stage codegen.
  * NULL token → NULL (nullSafeEval), matching array_contains over a
  * null-free literal array. */
case class StringSetContains(child: Expression, values: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"value must be STRING, got ${child.dataType.catalogString}")
    else if (values == null || values.contains(null))
      TypeCheckResult.TypeCheckFailure("the set must not be or contain null")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(16, values.size * 2))
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  /** Exposed for codegen (called through the reference object). */
  def containsUtf8(t: UTF8String): Boolean = set.contains(t)

  override def nullSafeEval(t: Any): Any =
    containsUtf8(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("setContainsSelf", this,
      classOf[StringSetContains].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.containsUtf8($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): StringSetContains =
    copy(child = newChild)
  override def prettyName: String = "graft_set_contains"
}
