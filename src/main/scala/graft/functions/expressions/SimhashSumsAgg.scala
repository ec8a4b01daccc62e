package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All `bits` SimHash bit-sums in ONE aggregation buffer — the native
  * twin of the `bits` separate `sum(when(g_b(tid) odd, cnt, -cnt))`
  * declarative aggregates the fold used to run
  * ([[graft.operators.Dedup.simhash]]): per input row those evaluate
  * 32–64 independent CASE expressions, each re-deriving `(tid·A_b +
  * B_b) mod P mod 2` through the expression interpreter/codegen and
  * updating its own buffer slot; this aggregate runs one compiled
  * loop over a primitive long[bits] buffer. Arithmetic is identical —
  * non-negative long multiply/mod in the same ranges, exact integer
  * sums (order-independent), the same null semantics (a NULL cnt
  * contributes nothing; a NULL tid takes the CASE's otherwise branch,
  * −cnt) — so every downstream fingerprint is bit-for-bit unchanged.
  *
  * Emits the raw sums as ARRAY<BIGINT> (length `bits`); callers
  * assemble fingerprints with the same sign tests as before
  * ([[graft.operators.Dedup.simhash]]'s bit assembly).
  *
  * @param a per-bit multipliers (simA), length = bits
  * @param b per-bit addends (simB), length = bits
  * @param p the modulus (MinhashPrime)
  */
case class SimhashSumsAgg(
    tidExpr: Expression,
    cntExpr: Expression,
    a: Array[Long],
    b: Array[Long],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(a.length == b.length && a.length > 0, "simA/simB must align")
  private def bits: Int = a.length

  override def children: Seq[Expression] = Seq(tidExpr, cntExpr)
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val cntAny = cntExpr.eval(input)
    if (cntAny == null) return buf // sum skips a NULL addend either way
    val cnt = cntAny.asInstanceOf[Long]
    val tidAny = tidExpr.eval(input)
    if (tidAny == null) {
      // CASE's null predicate falls to otherwise(-cnt) — mirror it
      var i = 0
      while (i < bits) { buf(i) -= cnt; i += 1 }
      return buf
    }
    val tid = tidAny.asInstanceOf[Long]
    var i = 0
    while (i < bits) {
      if (((tid * a(i) + b(i)) % p) % 2 == 1) buf(i) += cnt else buf(i) -= cnt
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimhashSumsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimhashSumsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SimhashSumsAgg =
    copy(tidExpr = c(0), cntExpr = c(1))
  override def prettyName: String = s"graft_simhash_sums_$bits"
}
