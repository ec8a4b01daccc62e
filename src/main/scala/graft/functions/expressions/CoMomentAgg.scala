package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fixed-point co-moment buffer: row count, per-dimension first-moment
  * sums (×10⁶), and upper-triangle product sums (×10⁶) — everything a
  * covariance / Gram / PCA-whitening computation needs, in one pass.
  * Size is 1 + d + d(d+1)/2 longs (d=64 → ~17 KB), independent of
  * input row count.
  */
final class CoMomentBuffer(val dim: Int) {
  val cells = new Array[Long](1 + dim + dim * (dim + 1) / 2)
  def n: Long = cells(0)
}

/** One-pass second-moment aggregate over an `ARRAY<FLOAT>` column:
  * `co_moment(vec, d)` → `ARRAY<BIGINT>` `[n, S₁..S_d, P₁₁, P₁₂.. P_dd]`
  * with Sᵢ = Σ floor(xᵢ·10⁶ + ½) and Pᵢⱼ = Σ floor(xᵢxⱼ·10⁶ + ½)
  * (upper triangle, row-major). Covariance then derives outside the
  * aggregate: cov(i,j) = P/(10⁶n) − S_i/(10⁶n) · S_j/(10⁶n).
  *
  * Why an imperative aggregate: the naive SQL formulation explodes
  * every row into d(d+1)/2 (i, j, xᵢxⱼ) tuples and shuffles n·d²/2
  * rows — at 100 TB that multiplies the corpus by ~2000×. This
  * buffer's partial state is the fixed d²/2-long array: map-side
  * combine applies, merge is element-wise long addition, and the
  * shuffle carries ONE buffer per partition. (The same argument as
  * Similarity.labelCentroids, one moment order higher.)
  *
  * Determinism: every accumulated term is floor(v + 0.5) of an IEEE
  * double product — floor is exact and `+` correctly rounded, so the
  * quantization is bit-identical in any engine that evaluates
  * `CAST(FLOOR(x*1e6 + 0.5) AS BIGINT)` (the int8Quantize rounding
  * pin: FLOOR semantics are universal, round-half rules are not).
  * Integer sums are add-order free, so partitioning never matters.
  * Overflow: |x| ≤ 10³ keeps each term < 10⁹·10⁶ and the sums exact
  * to ~9×10⁹ rows; the fixture's unit-scale embeddings are far inside.
  *
  * NULL vectors are skipped (n counts accumulated rows); rows whose
  * array length ≠ dim raise — a silent truncation would corrupt every
  * downstream covariance.
  */
case class CoMomentAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CoMomentBuffer] with ImplicitCastInputTypes {

  require(dim >= 1, s"co_moment needs dim >= 1, got $dim")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val Fp = 1e6

  @inline private def fp(v: Double): Long =
    math.floor(v * Fp + 0.5).toLong

  override def createAggregationBuffer(): CoMomentBuffer = new CoMomentBuffer(dim)

  override def update(buf: CoMomentBuffer, input: InternalRow): CoMomentBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"co_moment(dim=$dim) saw a vector of length ${arr.numElements()}")
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      val c = buf.cells
      c(0) += 1L
      i = 0
      var off = 1 + dim
      while (i < dim) {
        c(1 + i) += fp(x(i))
        var j = i
        while (j < dim) {
          c(off) += fp(x(i) * x(j))
          off += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: CoMomentBuffer, other: CoMomentBuffer): CoMomentBuffer = {
    var i = 0
    while (i < buf.cells.length) { buf.cells(i) += other.cells(i); i += 1 }
    buf
  }

  override def eval(buf: CoMomentBuffer): Any = new GenericArrayData(buf.cells)

  override def serialize(buf: CoMomentBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.cells.length * 8)
    bb.putInt(buf.dim)
    var i = 0
    while (i < buf.cells.length) { bb.putLong(buf.cells(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CoMomentBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CoMomentBuffer(bb.getInt)
    var i = 0
    while (i < buf.cells.length) { buf.cells(i) = bb.getLong; i += 1 }
    buf
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): CoMomentAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CoMomentAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "co_moment"
}
