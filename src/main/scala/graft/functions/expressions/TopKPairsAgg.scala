package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k smallest (dist, id) pairs under
  * lexicographic (dist, id) order — exactly the ordering of
  * `row_number() OVER (ORDER BY dist, id) <= k`. Max-heap so the
  * current worst is O(1) to test/evict.
  *
  * `distinct = true` skips a pair already present in the buffer —
  * valid when the distance of a given id is deterministic (the same
  * (dist, id) arrives for every duplicate), which lets iterative
  * consumers (beam search) fold their dedup step into this aggregate
  * instead of paying a separate groupBy shuffle. The containment scan
  * is O(k) per add — k is a beam width, bounded and small. */
final class TopKBuffer(val k: Int, val distinct: Boolean = false) {
  var size = 0
  val dists = new Array[Double](k)
  val ids = new Array[Long](k)

  @inline private def gt(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  private def containsPair(d: Double, id: Long): Boolean = {
    var i = 0
    while (i < size) {
      if (ids(i) == id && dists(i) == d) return true
      i += 1
    }
    false
  }

  def add(d: Double, id: Long): Unit = {
    if (distinct && containsPair(d, id)) return
    if (size < k) {
      var c = size
      dists(c) = d; ids(c) = id; size += 1
      while (c > 0 && gt(dists(c), ids(c), dists((c - 1) / 2), ids((c - 1) / 2))) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    } else if (gt(dists(0), ids(0), d, id)) {
      dists(0) = d; ids(0) = id
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = 2 * c + 2
        var m = c
        if (l < size && gt(dists(l), ids(l), dists(m), ids(m))) m = l
        if (r < size && gt(dists(r), ids(r), dists(m), ids(m))) m = r
        if (m == c) done = true else { swap(c, m); c = m }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val td = dists(i); dists(i) = dists(j); dists(j) = td
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  /** Ascending (dist, id) order. */
  def sorted: Array[(Double, Long)] =
    (0 until size).map(i => (dists(i), ids(i))).sortBy(identity).toArray
}

/** Top-k-by-distance aggregate: `topKPairs(dist, id, k)` returns the k
  * smallest (dist, id) pairs, ascending, as ARRAY<STRUCT<dist, id>>.
  *
  * This replaces the `Window.partitionBy(key).orderBy(dist, id)` +
  * `row_number <= k` pattern for per-group top-k. The window plan
  * shuffles EVERY candidate row and sorts each group in full; this
  * aggregate keeps a k-bounded heap per group with map-side partial
  * aggregation, so the shuffle carries at most k pairs per (partition,
  * group) — at 100 TB (billions of candidates, thousands of groups)
  * that is the difference between shuffling terabytes and megabytes.
  * Results are identical to the window formulation (same lexicographic
  * (dist, id) tie-break). */
case class TopKPairsAgg(
    distExpr: Expression,
    idExpr: Expression,
    k: Int,
    distinctIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(distExpr, idExpr)
  // Coerce (or reject) at analysis time: a FloatType dist / IntegerType
  // id from SQL would otherwise ClassCastException mid-task in update().
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, distinctIds)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val d = distExpr.eval(input)
    val id = idExpr.eval(input)
    if (d != null && id != null) {
      buf.add(d.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.add(other.dists(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (d, id) => InternalRow(d, id) })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(9 + buf.size * 16)
    bb.putInt(buf.k).putInt(buf.size).put(if (buf.distinct) 1.toByte else 0.toByte)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.dists(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt; val n = bb.getInt; val dist = bb.get() == 1.toByte
    val buf = new TopKBuffer(kk, dist)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKPairsAgg =
    copy(distExpr = c(0), idExpr = c(1))
  override def prettyName: String = "graft_topk_pairs"
}
