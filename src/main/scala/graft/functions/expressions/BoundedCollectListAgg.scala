package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-bounded long-list buffer: collects values until the count
  * EXCEEDS `limit`, then flips to overflow and discards everything —
  * the constant-space posting-list collector behind the hot-shingle
  * cap ([[graft.operators.Dedup.shinglePairCounts]]). A plain
  * `collect_list` + `size(ids) <= cap` filter materializes the FULL
  * list of every key — including the skewed key the cap exists to
  * drop — in one aggregation buffer before the filter runs; this
  * buffer never holds more than `limit` elements per key, so a
  * stopword-like shingle shared by 10⁸ docs costs 8·limit bytes, not
  * a multi-GB array in one reducer (guide §5). */
final class BoundedListBuffer(val limit: Int) {
  var overflow = false
  var size = 0
  var values = new Array[Long](math.min(limit, 16))

  def add(v: Long): Unit = {
    if (overflow) return
    if (size == limit) { overflow = true; size = 0; values = Array.empty; return }
    if (size == values.length)
      values = java.util.Arrays.copyOf(values, math.min(limit, math.max(16, size * 2)))
    values(size) = v
    size += 1
  }
}

/** `boundedCollectList(v, limit)` — ARRAY<BIGINT> of every input value
  * (arrival order, nulls skipped, duplicates kept — `collect_list`
  * semantics) when the group holds ≤ `limit` values, NULL when it
  * holds more. Map-side partial aggregation with per-key state capped
  * at `limit` longs on both the partial and merge sides, so the
  * overflow keys that a post-aggregation size filter would have
  * materialized in full never occupy more than the bound. Equivalent
  * by construction to
  * `collect_list(v) ... filter(size(ids) <= limit)` followed by the
  * caller dropping NULL rows. */
case class BoundedCollectListAgg(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedListBuffer] with ImplicitCastInputTypes {

  require(limit > 0, "limit must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BoundedListBuffer = new BoundedListBuffer(limit)

  override def update(buf: BoundedListBuffer, input: InternalRow): BoundedListBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedListBuffer, other: BoundedListBuffer): BoundedListBuffer = {
    if (other.overflow) { buf.overflow = true; buf.size = 0; buf.values = Array.empty }
    else {
      var i = 0
      while (i < other.size && !buf.overflow) { buf.add(other.values(i)); i += 1 }
    }
    buf
  }

  override def eval(buf: BoundedListBuffer): Any =
    if (buf.overflow) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf.values, buf.size))

  override def serialize(buf: BoundedListBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(9 + buf.size * 8)
    bb.putInt(buf.limit).putInt(buf.size).put(if (buf.overflow) 1.toByte else 0.toByte)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedListBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val lim = bb.getInt; val n = bb.getInt
    val buf = new BoundedListBuffer(lim)
    if (bb.get() == 1.toByte) { buf.overflow = true; buf.values = Array.empty }
    else {
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedCollectListAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedCollectListAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BoundedCollectListAgg =
    copy(child = c(0))
  override def prettyName: String = s"graft_bounded_collect_list_$limit"
}
