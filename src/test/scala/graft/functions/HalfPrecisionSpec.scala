package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.Half

/** binary16 conversion semantics (scalar + column level): exact
  * round-trip for representable values, round-to-nearest-even,
  * specials, and the pack/unpack column pair. */
class HalfPrecisionSpec extends SparkSpec {

  test("half-representable values round-trip exactly") {
    val exact = Seq(0f, -0f, 1f, -1f, 0.5f, 1.5f, -0.25f, 2f, 1024f, 65504f,
      5.9604645e-8f /* min subnormal */, 6.1035156e-5f /* min normal */)
    exact.foreach { f =>
      val rt = Half.halfBitsToFloat(Half.floatToHalfBits(f))
      assert(rt == f, s"$f -> $rt")
      // sign of zero is preserved
      if (f == 0f) assert(1f / rt == 1f / f)
    }
  }

  test("encode rounds to nearest-even and clamps correctly") {
    // 1 + 2^-11 is exactly between 1.0 and the next half (1 + 2^-10):
    // RNE picks the even mantissa -> 1.0
    assert(Half.halfBitsToFloat(Half.floatToHalfBits(1.0004883f)) == 1.0f)
    // just above the midpoint rounds up
    assert(Half.halfBitsToFloat(Half.floatToHalfBits(1.0005f)) == 1.0009765625f)
    // overflow -> infinity; max finite survives
    assert(Half.halfBitsToFloat(Half.floatToHalfBits(65520f)).isPosInfinity)
    assert(Half.halfBitsToFloat(Half.floatToHalfBits(65504f)) == 65504f)
    assert(Half.halfBitsToFloat(Half.floatToHalfBits(-70000f)).isNegInfinity)
    // underflow -> signed zero
    assert(Half.halfBitsToFloat(Half.floatToHalfBits(1e-9f)) == 0f)
    // NaN stays NaN
    assert(Half.halfBitsToFloat(Half.floatToHalfBits(Float.NaN)).isNaN)
    // relative error of any normal value is <= 2^-11
    val rng = new scala.util.Random(7)
    (0 until 1000).foreach { _ =>
      val f = (rng.nextFloat() - 0.5f) * 100f
      val rt = Half.halfBitsToFloat(Half.floatToHalfBits(f))
      assert(math.abs(rt - f) <= math.max(math.abs(f) * 4.8829e-4, 5.97e-8), s"$f -> $rt")
    }
  }

  test("halfPack/halfUnpack column pair round-trips through a DataFrame") {
    val ss = spark
    import ss.implicits._
    val vals = Seq(Seq(0.1f, -2.5f, 65504f, 0.333f), Seq(1f, 0f, -0f, 0.0001f))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val packed = df.select(col("id"), VectorFunctions.halfPack(col("vec")).as("p"))
    // 2 bytes per component
    assert(packed.select(length(col("p"))).collect().forall(_.getInt(0) == 8))
    val back = packed.select(col("id"), VectorFunctions.halfUnpack(col("p")).as("vec"))
      .orderBy(col("id")).collect().map(_.getSeq[Float](1))
    vals.indices.foreach { i =>
      back(i).zip(vals(i)).foreach { case (g, w) =>
        assert(math.abs(g - w) <= math.max(math.abs(w) * 4.8829e-4, 5.97e-8))
        // and the stored value is exactly the scalar quantization
        assert(g == Half.halfBitsToFloat(Half.floatToHalfBits(w)))
      }
    }
  }
}
