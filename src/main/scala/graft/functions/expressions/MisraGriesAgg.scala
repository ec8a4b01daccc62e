package graft.functions.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary: at most k (item, count) pairs.
  *
  * Invariant (Misra & Gries 1982; mergeable form per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): after absorbing a stream of N
  * items, every item's stored count lower-bounds its true frequency by
  * at most N/k, and every item with true frequency > N/k is present.
  * Merging two summaries (sum counts, then subtract the (k+1)-th
  * largest count and drop non-positives) preserves the bound over the
  * combined stream, so partial states combine map-side like any other
  * Spark partial aggregate.
  */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()
  var n: Long = 0L

  def add(item: String, c: Long): Unit = {
    n += c
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + c)
    else if (counts.size < k) counts.put(item, c)
    else {
      // Full and item absent: decrement the whole summary by the
      // insert weight (capped at the smallest stored count so a
      // heavy insert cannot over-penalise survivors), then retry the
      // remainder. For c=1 this is the classic decrement-all step;
      // each sweep removes at least one entry, so the amortised cost
      // stays O(1) per input row.
      var min = Long.MaxValue
      val it0 = counts.values().iterator()
      while (it0.hasNext) { val v = it0.next(); if (v < min) min = v }
      val dec = math.min(min, c)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - dec
        if (v <= 0L) it.remove() else e.setValue(v)
      }
      val rest = c - dec
      if (rest > 0L) { n -= c; add(item, rest) } // retry with freed slots
    }
  }

  /** Subtract `dec` from every count, dropping non-positives. */
  def decrementAll(dec: Long): Unit = {
    if (dec > 0L) {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - dec
        if (v <= 0L) it.remove() else e.setValue(v)
      }
    }
  }
}

/** `graft_mg_summary(s, k)` — bounded-state frequent-items candidates.
  *
  * Returns `map<string, bigint>` of ≤ k surviving items with their
  * lower-bound counts. Guarantee: the map contains EVERY item whose
  * true frequency exceeds N/k (N = non-null input rows), and each
  * stored count c satisfies c ≤ true ≤ c + N/k.
  *
  * Why: an exact `groupBy(item).count` shuffles one row per distinct
  * item per partition — at 100 TB of n-grams that is the corpus over
  * again. This aggregate's partial state is ≤ k entries regardless of
  * input size, so the heavy-hitter CANDIDATE set costs a bounded
  * shuffle; a second, candidate-filtered pass (broadcast semi-join +
  * partial-agg count) then makes the final answer exact and
  * deterministic — see [[graft.operators.TextAnalysis.frequentNgrams]].
  * The candidate SET itself depends on partition/merge order (any MG
  * summary does); only supersets of the guaranteed items are stable,
  * which is exactly what the two-pass consumer needs.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with ImplicitCastInputTypes {

  require(k >= 1, s"graft_mg_summary needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    // Sum counts for the union of items, then restore |summary| ≤ k by
    // subtracting the (k+1)-th largest count from everything.
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.counts.get(e.getKey)
      buf.counts.put(e.getKey, cur + e.getValue)
    }
    buf.n += other.n
    if (buf.counts.size > buf.k) {
      val vals = new Array[Long](buf.counts.size)
      var i = 0
      val vit = buf.counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      buf.decrementAll(vals(vals.length - buf.k - 1)) // (k+1)-th largest
    }
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    // Deterministic presentation: items sorted lexicographically.
    val items = new Array[String](buf.counts.size)
    buf.counts.keySet().toArray(items)
    java.util.Arrays.sort(items, java.util.Comparator.naturalOrder[String]())
    val keys = new Array[Any](items.length)
    val vals = new Array[Any](items.length)
    var i = 0
    while (i < items.length) {
      keys(i) = UTF8String.fromString(items(i))
      vals(i) = buf.counts.get(items(i))
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val entries = new Array[(Array[Byte], Long)](buf.counts.size)
    var total = 4 + 8 + 4
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries(i) = (b, e.getValue)
      total += 4 + b.length + 8
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(buf.k).putLong(buf.n).putInt(entries.length)
    i = 0
    while (i < entries.length) {
      bb.putInt(entries(i)._1.length).put(entries(i)._1).putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(bb.getInt)
    buf.n = bb.getLong
    val m = bb.getInt
    var i = 0
    while (i < m) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = c(0))
  override def prettyName: String = "graft_mg_summary"
}
