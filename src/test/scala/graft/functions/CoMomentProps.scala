package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.expressions.{CoMomentAgg, CoMomentBuffer}

/** ScalaCheck properties for the co-moment buffer: any partitioning of
  * the input into merged partial buffers must produce the single-pass
  * result EXACTLY (the map-side-combine contract the covariance rides
  * on), and serialization must round-trip. Exercised at the catalyst
  * level (BoundReference + InternalRow) — no SparkSession needed, so
  * 100 cases run in milliseconds. */
object CoMomentProps extends Properties("CoMomentAgg") {

  private val dim = 3
  private val agg = CoMomentAgg(
    BoundReference(0, ArrayType(FloatType), nullable = true), dim)

  private def rowOf(v: Array[Float]): InternalRow =
    InternalRow(ArrayData.toArrayData(v))

  private def evalAll(rows: Seq[Array[Float]]): Seq[Long] = {
    val buf = rows.foldLeft(agg.createAggregationBuffer())(
      (b, v) => agg.update(b, rowOf(v)))
    buf.cells.toSeq
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(dim, Gen.chooseNum(-50f, 50f)).map(_.toArray)
  private val rowsGen: Gen[List[Array[Float]]] =
    Gen.listOf(vecGen).map(_.take(60))

  property("merge of any partition split equals the single pass") =
    Prop.forAll(rowsGen, Gen.choose(0, 59)) { (rows, cutRaw) =>
      val cut = if (rows.isEmpty) 0 else cutRaw % (rows.length + 1)
      val (a, b) = rows.splitAt(cut)
      val bufA = a.foldLeft(agg.createAggregationBuffer())(
        (buf, v) => agg.update(buf, rowOf(v)))
      val bufB = b.foldLeft(agg.createAggregationBuffer())(
        (buf, v) => agg.update(buf, rowOf(v)))
      agg.merge(bufA, bufB).cells.toSeq == evalAll(rows)
    }

  property("serialize / deserialize round-trips the buffer") =
    Prop.forAll(rowsGen) { rows =>
      val buf = rows.foldLeft(agg.createAggregationBuffer())(
        (b, v) => agg.update(b, rowOf(v)))
      agg.deserialize(agg.serialize(buf)).cells.toSeq == buf.cells.toSeq
    }

  property("null rows never change the buffer") =
    Prop.forAll(rowsGen) { rows =>
      val withNulls = rows.flatMap(v => Seq(Some(v), None))
      val buf = withNulls.foldLeft(agg.createAggregationBuffer()) {
        case (b, Some(v)) => agg.update(b, rowOf(v))
        case (b, None) => agg.update(b, InternalRow(null))
      }
      buf.cells.toSeq == evalAll(rows)
    }

  property("cells match the closed-form fixed-point sums") =
    Prop.forAll(rowsGen) { rows =>
      def fp(v: Double) = math.floor(v * 1e6 + 0.5).toLong
      val cells = evalAll(rows)
      val n = rows.length.toLong
      val s = (0 until dim).map(i => rows.map(r => fp(r(i).toDouble)).sum)
      val p = for (i <- 0 until dim; j <- i until dim)
        yield rows.map(r => fp(r(i).toDouble * r(j).toDouble)).sum
      cells == (n +: (s ++ p))
    }

  property("buffer size is fixed regardless of row count") =
    Prop.forAll(rowsGen) { rows =>
      val buf = rows.foldLeft(agg.createAggregationBuffer())(
        (b, v) => agg.update(b, rowOf(v)))
      buf.cells.length == new CoMomentBuffer(dim).cells.length
    }
}
