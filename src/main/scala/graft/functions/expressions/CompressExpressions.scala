package graft.functions.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compressed size of a string's UTF-8 bytes — the
  * compressibility quality signal (used as a repetition/noise screen
  * in production LLM corpus pipelines, e.g. Gopher's quality rules,
  * Rae et al. 2021 §A1.2): highly repetitive boilerplate compresses
  * far below normal prose, random noise barely compresses at all, so
  * compressed_size / raw_size separates both tails with ONE
  * language-agnostic pass — no tokenizer, no vocabulary.
  *
  * Determinism: fixed level (6), fixed strategy (default), raw-deflate
  * (nowrap — no zlib header/checksum variance), one full-input
  * deflate call per row. java.util.zip delegates to the JVM's bundled
  * zlib, so the byte count is stable across executors of one cluster;
  * it is NOT a cross-engine contract (DuckDB has no zlib surface), so
  * q159 is rows-only by design and CompressSpec pins the semantic
  * properties (repetitive << prose << random, determinism, bounds).
  *
  * Per-thread Deflater reuse: a Deflater holds native zlib state;
  * allocating one per row would dominate the walk. The thread-local is
  * reset per call — same cost shape as the AhoCorasick reference
  * object, one setup per executor thread.
  *
  * DELIBERATE TRADE — the per-thread Deflaters are never `end()`d, so
  * each task-pool thread that ever evaluates this expression pins one
  * native zlib stream (~256 KB with the default windowBits) for the
  * thread's lifetime. Spark executors run a FIXED task pool (threads
  * are reused, not rotated), so the pinned total is bounded by
  * `cores × 256 KB` per executor — flat, not growing — and dies with
  * the thread. The alternatives are strictly worse on the hot path:
  * per-call `new Deflater`/`end()` pays native init per ROW (the cost
  * this cache exists to remove), and a TaskContext completion hook
  * would re-pay it per TASK (thousands of tasks per scan reusing the
  * same few threads). Revisit only if this expression is ever used
  * from a host with large/rotating thread pools (a streaming receiver
  * pool, a web server), where the per-thread pin would multiply.
  */
object DeflateUtil {
  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, true)
  }

  def size(s: UTF8String): Int = {
    val in = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** `graft_deflate_size(s)` — DEFLATE-compressed byte count of the
  * string's UTF-8 encoding (NULL -> NULL). Divide by octet_length for
  * the compressibility ratio. */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"input must be STRING, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(s: Any): Any =
    DeflateUtil.size(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.DeflateUtil.size($s);")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
  override def prettyName: String = "graft_deflate_size"
}
