package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.expressions.{FixedPointSquaredL2Const, ProjectVec, SrpKernel, SrpSignature}

/** ScalaCheck properties for the fused clustering/PCA/SRP kernels'
  * interpreted eval against independent plain-Scala folds — random
  * dims, values, and BOTH element types. (The codegen path and the
  * HOF twins are pinned by ClusteringKernelSpec through collect; this
  * hammers the eval semantics 100× per property with no SparkSession,
  * so it runs in milliseconds.) */
object KernelProps extends Properties("ClusteringKernels") {

  private val vecGen: Gen[Array[Double]] = for {
    d <- Gen.choose(1, 16)
    xs <- Gen.listOfN(d, Gen.chooseNum(-50.0, 50.0))
  } yield xs.toArray

  private def floatLit(v: Array[Double]): Literal =
    Literal.create(ArrayData.toArrayData(v.map(_.toFloat)),
      ArrayType(FloatType, containsNull = false))
  private def doubleLit(v: Array[Double]): Literal =
    Literal.create(ArrayData.toArrayData(v),
      ArrayType(DoubleType, containsNull = false))

  property("FixedPointSquaredL2Const == sequential floor fold, float + double") =
    Prop.forAll(vecGen, vecGen) { (v, c0) =>
      val cent = c0.take(v.length).padTo(v.length, 1.25)
      def ref(xs: Array[Double]): Long =
        xs.zip(cent).foldLeft(0L) { case (s, (x, cc)) =>
          val d = x - cc
          s + math.floor(d * d * 1e8 + 0.5).toLong
        }
      val fromD = FixedPointSquaredL2Const(doubleLit(v), cent).eval(null)
      val fromF = FixedPointSquaredL2Const(floatLit(v), cent).eval(null)
      fromD == ref(v) && fromF == ref(v.map(x => x.toFloat.toDouble))
    }

  property("ProjectVec == per-component centered dot, whitened and raw") =
    Prop.forAll(vecGen, Gen.choose(1, 4), Gen.chooseNum(0.1, 9.0)) { (v, k, s0) =>
      val mean = v.map(_ / 3.0)
      val comps = Array.tabulate(k, v.length)((c, i) => ((c + 1) * (i + 2)) / 7.0 - 1.0)
      val scales = Array.tabulate(k)(c => s0 + c)
      def ref(xs: Array[Double], div: Array[Double]): Seq[Double] =
        comps.toSeq.zipWithIndex.map { case (w, c) =>
          val dot = xs.indices.foldLeft(0.0)((s, i) => s + (xs(i) - mean(i)) * w(i))
          if (div.isEmpty) dot else dot / div(c)
        }
      def got(lit: Literal, div: Array[Double]): Seq[Double] =
        ProjectVec(lit, mean, comps, div).eval(null)
          .asInstanceOf[ArrayData].toDoubleArray().toSeq
      got(doubleLit(v), Array.empty) == ref(v, Array.empty) &&
        got(doubleLit(v), scales) == ref(v, scales) &&
        got(floatLit(v), scales) == ref(v.map(x => x.toFloat.toDouble), scales)
    }

  property("SrpSignature == per-bit sign-table fold, all nBits, float + double") =
    Prop.forAll(vecGen, Gen.oneOf(1, 7, 32)) { (v, nBits) =>
      val signs = SrpKernel.signTable(nBits, v.length)
      def ref(xs: Array[Double]): Long =
        (0 until nBits).foldLeft(0L) { (sig, b) =>
          val dot = xs.indices.foldLeft(0.0)((s, j) => s + xs(j) * signs(b)(j))
          if (dot > 0.0) sig | (1L << b) else sig
        }
      SrpSignature(doubleLit(v), nBits).eval(null) == ref(v) &&
        SrpSignature(floatLit(v), nBits).eval(null) == ref(v.map(x => x.toFloat.toDouble))
    }

  property("dimension mismatch throws, never truncates") =
    Prop.forAll(vecGen) { v =>
      val cent = v ++ Array(1.0) // one longer than the vector
      Prop.throws(classOf[IllegalArgumentException]) {
        FixedPointSquaredL2Const(doubleLit(v), cent).eval(null)
      } && Prop.throws(classOf[IllegalArgumentException]) {
        ProjectVec(doubleLit(v), cent, Array(cent)).eval(null)
      }
    }
}
