package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout clustering keys — the write-time optimization that
  * makes multi-column scan pruning work at 100 TB. Range-partitioning
  * on ONE column gives that column tight per-file min/max stats and
  * leaves every other column's stats useless; interleaving the bits of
  * two columns (Morton / Z-order — the Delta/Iceberg `OPTIMIZE ZORDER
  * BY` machinery) bounds BOTH dimensions inside every z-range, so
  * predicates on either column prune files. The engine side is
  * deliberately just a COLUMN: sort/`repartitionByRange` on
  * [[zValue2]] at write time and parquet min/max stats do the rest —
  * no custom reader, no new file format.
  *
  * Pure integer bit arithmetic (shift/mask spreads, no loops, no
  * UDFs): whole-stage-codegen'd in Spark and bit-for-bit replayable in
  * any engine with 64-bit integer ops — which is what lets q164
  * hash-oracle the layout decision itself.
  */
object Layout {

  /** Spread the low 32 bits of `c` so bit i lands at position 2·i —
    * the classic magic-mask dilation (Morton 1966; "Bit Twiddling
    * Hacks" interleave). Input must be in [0, 2³¹); values are masked
    * to 32 bits first so a stray high bit cannot corrupt neighbors. */
  private def spreadBits(c: Column): Column = {
    def step(x: Column, sh: Int, mask: Long): Column =
      (x.bitwiseOR(shiftleft(x, sh))).bitwiseAND(lit(mask))
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = step(x0, 16, 0x0000FFFF0000FFFFL)
    val x2 = step(x1, 8, 0x00FF00FF00FF00FFL)
    val x3 = step(x2, 4, 0x0F0F0F0F0F0F0F0FL)
    val x4 = step(x3, 2, 0x3333333333333333L)
    step(x4, 1, 0x5555555555555555L)
  }

  /** 64-bit Z-order value of two keys in [0, 2³¹): bits of `a` at even
    * positions, `b` at odd. Monotone locality: rows close in z are
    * close in BOTH a and b.
    *
    * The domain is [0, 2³¹) — NOT the full unsigned 32 bits — because
    * `b`'s bit 31 would land at position 63, the LONG SIGN BIT: such a
    * z sorts before every positive z and silently breaks the range
    * clustering this key exists for. Out-of-domain inputs (either key
    * negative or ≥ 2³¹) therefore yield NULL — a loud, groupable
    * signal at write time — instead of a wrong-but-plausible key. For
    * skewed/unbounded domains, rank-normalize into the domain first
    * (e.g. [[Sampling.percentileBlend]]'s percentile machinery, or a
    * fixed-point quantization) — z-order on raw values clusters by
    * magnitude, which is usually what a key-like column wants anyway. */
  def zValue2(a: Column, b: Column): Column = {
    val al = a.cast("long")
    val bl = b.cast("long")
    // negative inputs set high bits under the long cast, so one mask
    // test catches both "negative" and ">= 2^31" for both keys
    val bad = (al.bitwiseOR(bl)).bitwiseAND(lit(~0x7FFFFFFFL))
    when(bad === 0L, spreadBits(al).bitwiseOR(shiftleft(spreadBits(bl), 1)))
  }

  /** The same composition as RESOLVED catalyst expressions — the SQL
    * registration path (`graft_zvalue2`): a function builder must
    * return a constructible tree, and the Column API's operators
    * produce unresolved function nodes there. Same ops, same masks;
    * LayoutSpec pins SQL == column API. */
  private[graft] def zValue2Expr(
      a: org.apache.spark.sql.catalyst.expressions.Expression,
      b: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    def l(v: Long) = Literal(v, LongType)
    def step(x: Expression, sh: Int, mask: Long): Expression =
      BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(sh))), l(mask))
    def spreadE(c: Expression): Expression = {
      val x0 = BitwiseAnd(c, l(0xFFFFFFFFL))
      val x1 = step(x0, 16, 0x0000FFFF0000FFFFL)
      val x2 = step(x1, 8, 0x00FF00FF00FF00FFL)
      val x3 = step(x2, 4, 0x0F0F0F0F0F0F0F0FL)
      val x4 = step(x3, 2, 0x3333333333333333L)
      step(x4, 1, 0x5555555555555555L)
    }
    val al = Cast(a, LongType)
    val bl = Cast(b, LongType)
    // same [0, 2^31) domain guard as the column API — out-of-domain
    // yields NULL instead of a sign-bit-corrupted sort key
    val bad = BitwiseAnd(BitwiseOr(al, bl), l(~0x7FFFFFFFL))
    If(EqualTo(bad, l(0L)),
      BitwiseOr(spreadE(al), ShiftLeft(spreadE(bl), Literal(1))),
      Literal(null, LongType))
  }
}
