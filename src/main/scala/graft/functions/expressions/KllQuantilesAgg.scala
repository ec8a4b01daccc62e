package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL-style compactor stack (Karnin, Lang & Liberty 2016, the
  * equal-capacity practical variant): level i holds items of weight
  * 2^i; an over-full level sorts and keeps every other item (the
  * survivors move up one level, doubling their weight), with the
  * starting offset alternating per level compaction — deterministic,
  * no RNG, and the alternation cancels rank drift the way the
  * randomized coin does in expectation. Total state is O(k · log(n/k))
  * values regardless of input size.
  */
final class KllBuffer(val k: Int) {
  val levels = ArrayBuffer(new ArrayBuffer[Double]())
  val parities = ArrayBuffer(0)
  var n: Long = 0L

  def insert(v: Double): Unit = {
    levels(0) += v
    n += 1L
    if (levels(0).length > k) compact(0)
  }

  def compact(lvl: Int): Unit = {
    if (lvl + 1 >= levels.length) { levels += new ArrayBuffer[Double](); parities += 0 }
    val buf = levels(lvl)
    val sorted = buf.sortInPlace()
    val off = parities(lvl)
    parities(lvl) = 1 - off
    val up = levels(lvl + 1)
    var i = off
    while (i < sorted.length) { up += sorted(i); i += 2 }
    buf.clear()
    if (up.length > k) compact(lvl + 1)
  }

  def mergeIn(other: KllBuffer): Unit = {
    var lvl = 0
    while (lvl < other.levels.length) {
      if (lvl >= levels.length) { levels += new ArrayBuffer[Double](); parities += 0 }
      levels(lvl) ++= other.levels(lvl)
      lvl += 1
    }
    n += other.n
    lvl = 0
    while (lvl < levels.length) {
      if (levels(lvl).length > k) compact(lvl)
      lvl += 1
    }
  }

  /** Lower-quantile estimates: smallest retained value whose cumulative
    * weight reaches ⌈q·W⌉ over the (value, 2^level)-weighted summary. */
  def quantiles(probs: Seq[Double]): Array[Double] = {
    if (n == 0L) return probs.map(_ => Double.NaN).toArray
    val items = new ArrayBuffer[(Double, Long)]()
    var lvl = 0
    while (lvl < levels.length) {
      val w = 1L << lvl
      levels(lvl).foreach(v => items += ((v, w)))
      lvl += 1
    }
    val sorted = items.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    probs.map { q =>
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      var i = 0
      var out = sorted.last._1
      var found = false
      while (i < sorted.length && !found) {
        cum += sorted(i)._2
        if (cum >= target) { out = sorted(i)._1; found = true }
        i += 1
      }
      out
    }.toArray
  }
}

/** Mergeable approximate quantiles over a DOUBLE column:
  * `kll_quantiles(x, probs, k)` → `ARRAY<DOUBLE>` (one estimate per
  * requested probability, each an ACTUAL input value).
  *
  * Why: Spark's exact `percentile` shuffles every value of every group
  * and sorts — at 100 TB the percentile dashboard job moves the whole
  * column. This buffer's partial state is O(k·log(n/k)) values
  * (k = 256 → a few KB) with map-side combine and element-wise level
  * merge, so the shuffle carries ONE summary per partition — the same
  * argument as co_moment / Misra-Gries, for rank statistics. Rank
  * error is O(1/k)·n with small constants (gated end-to-end by q151
  * against exact ranks; KllSketchSpec pins bounds under adversarial
  * orders and partitionings).
  *
  * Determinism: compaction drops alternating offsets (no RNG), so a
  * fixed input ORDER gives a fixed summary; the result still depends
  * on partitioning (like any mergeable sketch) — callers gate on rank
  * error, never on exact values. NULLs are skipped; NaN inputs raise
  * (they would poison the sort order silently).
  */
case class KllQuantilesAgg(
    child: Expression,
    probs: Seq[Double],
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with ImplicitCastInputTypes {

  require(k >= 8, s"kll_quantiles needs k >= 8, got $k")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"probabilities must be in [0, 1], got $probs")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (d.isNaN)
        throw new IllegalArgumentException("kll_quantiles: NaN input")
      buf.insert(d)
    }
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllBuffer): Any =
    new GenericArrayData(buf.quantiles(probs))

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val nLevels = buf.levels.length
    val nItems = buf.levels.iterator.map(_.length).sum
    val bb = ByteBuffer.allocate(4 + 8 + 4 + nLevels * (4 + 4) + nItems * 8)
    bb.putInt(buf.k)
    bb.putLong(buf.n)
    bb.putInt(nLevels)
    buf.levels.zip(buf.parities).foreach { case (lv, par) =>
      bb.putInt(lv.length)
      bb.putInt(par)
      lv.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KllBuffer(bb.getInt)
    buf.n = bb.getLong
    val nLevels = bb.getInt
    buf.levels.clear(); buf.parities.clear()
    var l = 0
    while (l < nLevels) {
      val len = bb.getInt
      val par = bb.getInt
      val lv = new ArrayBuffer[Double](len)
      var i = 0
      while (i < len) { lv += bb.getDouble; i += 1 }
      buf.levels += lv
      buf.parities += par
      l += 1
    }
    buf
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "kll_quantiles"
}
