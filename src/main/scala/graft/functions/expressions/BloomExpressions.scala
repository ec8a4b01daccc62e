package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership sketch over STRING keys.
  *
  * The 100 TB problem this solves: a membership test against a key set
  * that is too large to inline as a literal array (q59's shape) or to
  * broadcast as raw values, but whose BITS fit an executor — e.g. a
  * 100M-entry URL/document blocklist is gigabytes of strings but
  * ~125 MB of bloom at 10 bits/key. A plain semi/anti join would
  * shuffle the full corpus on the key; with the bloom broadcast as a
  * scan-side filter, the exchange carries only rows that MIGHT match
  * (true members + the fp-rate sliver), and the exact join afterwards
  * removes the false positives — so the final answer is EXACT, which
  * is what lets the operator be oracle-checked end to end
  * ([[graft.operators.Dedup.bloomPrunedSemiJoin]]).
  *
  * Layout: a word-aligned bit array; k indexes per key derived from
  * two independent 64-bit hashes via the Kirsch–Mitzenmacher
  * double-hashing scheme (h1 + i·h2, "Less Hashing, Same Performance",
  * ESA 2006), the construction Guava's BloomFilter uses. Partial
  * states merge by bitwise OR — associative and commutative, so the
  * build is one map-side-combined aggregate whose shuffle carries
  * numBits/8 bytes per partition, never the key set.
  */
final class BloomBuffer(val numBits: Int, val numHashes: Int) extends Serializable {
  require(numBits >= 64 && (numBits & 63) == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  val words = new Array[Long](numBits >>> 6)

  def put(bytes: Array[Byte]): Unit = {
    val h1 = BloomBuffer.hash64(bytes, BloomBuffer.Seed1)
    val h2 = BloomBuffer.hash64(bytes, BloomBuffer.Seed2) | 1L // odd: full cycle
    var i = 0
    while (i < numHashes) {
      val idx = ((h1 + i * h2) & Long.MaxValue) % numBits
      words((idx >>> 6).toInt) |= 1L << (idx & 63)
      i += 1
    }
  }

  def mightContain(bytes: Array[Byte]): Boolean = {
    val h1 = BloomBuffer.hash64(bytes, BloomBuffer.Seed1)
    val h2 = BloomBuffer.hash64(bytes, BloomBuffer.Seed2) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = ((h1 + i * h2) & Long.MaxValue) % numBits
      if ((words((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def mightContainUtf8(s: UTF8String): Boolean = mightContain(s.getBytes)

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numBits).putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

object BloomBuffer {
  // Arbitrary fixed seeds — the filter is an in-flight artifact, not a
  // persisted format, but determinism across JVMs keeps builds
  // partition-order independent.
  private val Seed1 = 0x7A3C9B1FD4E82657L
  private val Seed2 = 0x1B8E4D2A9F36C075L

  /** FNV-1a 64 over the bytes, then the MurmurHash3 fmix64 avalanche —
    * cheap per byte, well-mixed low bits (the modulo consumer). */
  def hash64(bytes: Array[Byte], seed: Long): Long = {
    var h = seed ^ 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001B3L
      i += 1
    }
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^ (h >>> 33)
  }

  def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BloomBuffer(bb.getInt, bb.getInt)
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong; i += 1 }
    buf
  }

  /** Bits for a target false-positive rate at n keys (standard
    * m = -n·ln(p)/ln(2)², rounded up to a word multiple). */
  def optimalNumBits(n: Long, fpp: Double): Int = {
    require(n > 0 && fpp > 0.0 && fpp < 1.0, s"need n > 0, 0 < fpp < 1; got n=$n fpp=$fpp")
    val m = math.ceil(-n * math.log(fpp) / (math.log(2.0) * math.log(2.0))).toLong
    val aligned = math.min(((m + 63L) / 64L) * 64L, 1L << 30)
    math.max(64L, aligned).toInt
  }

  /** Hash count minimizing fp at that sizing (k = m/n·ln 2). */
  def optimalNumHashes(n: Long, numBits: Int): Int =
    math.max(1, math.round(numBits.toDouble / n * math.log(2.0)).toInt)
}

/** `graft_bloom_agg(s, numBits, numHashes)` — build the filter as an
  * aggregate: partial state is the fixed-size bit array, merge is
  * bitwise OR, result is the serialized filter (BINARY). NULL keys are
  * skipped (a NULL never "matches" a membership list, mirroring
  * semi-join semantics on null keys). */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(numBits, numHashes)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buf.put(v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(buf: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    require(buf.numBits == other.numBits && buf.numHashes == other.numHashes,
      s"cannot merge bloom filters of different shapes: " +
        s"(${buf.numBits},${buf.numHashes}) vs (${other.numBits},${other.numHashes})")
    var i = 0
    while (i < buf.words.length) { buf.words(i) |= other.words(i); i += 1 }
    buf
  }

  override def eval(buf: BloomBuffer): Any = buf.serialize()
  override def serialize(buf: BloomBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): BloomBuffer = BloomBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c(0))
  override def prettyName: String = "graft_bloom_agg"
}

/** `graft_bloom_contains(filter, s)` — scan-side membership probe.
  *
  * The filter argument must be FOLDABLE (a literal of the built
  * filter's bytes): the probe decodes it once per task and codegen
  * references the decoded object, so the hot path is hash + k bit
  * tests per row with no per-row deserialization. A non-foldable
  * filter column would force exactly that per-row decode, so it is
  * rejected at analysis time. NULL key → NULL (three-valued logic,
  * like `IN`); NULL filter → analysis error upstream (lit of a built
  * filter is never null).
  */
case class BloomMightContain(filter: Expression, child: Expression)
  extends Expression {

  import org.apache.spark.sql.catalyst.expressions.codegen.Block._

  override def children: Seq[Expression] = Seq(filter, child)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = BooleanType
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (filter.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"filter must be BINARY, got ${filter.dataType.catalogString}")
    else if (!filter.foldable)
      TypeCheckResult.TypeCheckFailure(
        "filter must be a foldable literal (build it with graft_bloom_agg, " +
          "collect, and inline with lit(...)); a per-row filter column would " +
          "deserialize the bit array for every probe")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"probe key must be STRING, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val decoded: BloomBuffer = {
    val bytes = filter.eval(null)
    require(bytes != null, "bloom filter literal is null")
    BloomBuffer.deserialize(bytes.asInstanceOf[Array[Byte]])
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else decoded.mightContainUtf8(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The decoded filter rides along as a reference object: the hot
    // path is hash + k bit probes, no per-row deserialization.
    val bloomRef = ctx.addReferenceObj("bloom", decoded, classOf[BloomBuffer].getName)
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bloomRef.mightContainUtf8(${c.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomMightContain =
    copy(filter = c(0), child = c(1))
  override def prettyName: String = "graft_bloom_contains"
}
