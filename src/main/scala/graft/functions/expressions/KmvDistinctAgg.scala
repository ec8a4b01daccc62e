package graft.functions.expressions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** k-minimum-values buffer: the k smallest DISTINCT 60-bit hashes seen
  * so far (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD 2007). A TreeSet keeps
  * membership + eviction O(log k); k is a sketch width (≤ a few
  * thousand), so the buffer is bytes-bounded regardless of input size.
  */
final class KmvBuffer(val k: Int) {
  val hashes = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (hashes.size < k) { hashes.add(h); () }
    else if (h < hashes.last && !hashes.contains(h)) {
      hashes.add(h)
      hashes.pollLast()
      ()
    }
  }
}

/** KMV distinct-count sketch: `kmv_distinct(s, k)` estimates
  * `COUNT(DISTINCT s)` from the k smallest md5-derived hashes.
  *
  * Why a sketch: exact distinct per group shuffles every distinct
  * value (Spark plans `countDistinct` as a full dedup exchange). This
  * aggregate's partial state is ≤ k longs per (partition, group) — at
  * 100 TB (billions of tokens, thousands of groups) the shuffle
  * carries kilobytes per group instead of the value set itself, and
  * states merge associatively, so map-side partial aggregation works.
  *
  * Why THIS hash: h = first 15 hex digits of md5(s) as a 60-bit int —
  * both Spark SQL (`conv(substr(md5(s),1,15),16,10)`) and DuckDB
  * (`('0x' || substr(md5(s),1,15))::UBIGINT`) can compute it exactly,
  * which makes the estimate — not just some error band — verifiable
  * by an independent engine: the k-th smallest hash is a deterministic
  * function of the value SET, so est = (k-1) * 2^60 / h_k reproduces
  * bit-identically (IEEE double division of identical inputs).
  *
  * Estimator: with fewer than k distinct hashes the sketch IS the
  * distinct value set (exact count, the oracle's small-group path);
  * at ≥ k, the unbiased KMV estimate (k-1)/U_(k) with
  * U_(k) = h_k / 2^60. Expected relative error ~ 1/sqrt(k-2)
  * (≈ 6% at k=256). NULLs are ignored, matching COUNT(DISTINCT).
  */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with ImplicitCastInputTypes {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  // One digest per task-deserialized instance; reset() per row. MD5 is
  // a required JCE algorithm, so getInstance cannot fail at runtime.
  @transient private lazy val digest: MessageDigest =
    MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      digest.reset()
      val md5 = digest.digest(v.asInstanceOf[UTF8String].getBytes)
      // First 15 hex digits == big-endian first 8 bytes >>> 4 (drop the
      // 16th digit = low nibble of byte 7). Range [0, 2^60).
      var be = 0L
      var i = 0
      while (i < 8) { be = (be << 8) | (md5(i) & 0xffL); i += 1 }
      buf.add(be >>> 4)
    }
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.hashes.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    if (buf.hashes.size < k) buf.hashes.size.toDouble
    else (k - 1).toDouble * KmvDistinctAgg.TwoPow60 / buf.hashes.last.toDouble

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.hashes.size * 8)
    bb.putInt(buf.k).putInt(buf.hashes.size)
    val it = buf.hashes.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(child = c(0))
  override def prettyName: String = "graft_kmv_distinct"
}

object KmvDistinctAgg {
  /** 2^60 — exactly representable in a double. */
  val TwoPow60: Double = 1152921504606846976.0
}
