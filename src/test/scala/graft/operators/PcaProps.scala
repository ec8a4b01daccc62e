package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the driver-side Jacobi eigensolver — the
  * one numerical kernel whose correctness everything PCA-shaped rides
  * on (components, whitening scales, the q144 prefilter geometry). */
object PcaProps extends Properties("Pca.jacobiEigen") {

  private val dimGen = Gen.choose(2, 6)

  /** Random symmetric matrix with bounded entries. */
  private val symGen: Gen[Array[Array[Double]]] = for {
    d <- dimGen
    cells <- Gen.listOfN(d * d, Gen.chooseNum(-10.0, 10.0))
  } yield {
    val raw = cells.toArray.grouped(d).toArray
    Array.tabulate(d, d)((i, j) => (raw(i)(j) + raw(j)(i)) / 2.0)
  }

  private def eigen(m: Array[Array[Double]]) = Pca.jacobiEigen(m)

  property("eigenvalue sum equals the trace") = Prop.forAll(symGen) { m =>
    val (values, _) = eigen(m)
    val trace = m.indices.map(i => m(i)(i)).sum
    math.abs(values.sum - trace) < 1e-7
  }

  property("eigenvector columns are orthonormal") = Prop.forAll(symGen) { m =>
    val d = m.length
    val (_, v) = eigen(m)
    (0 until d).forall { c1 =>
      (0 until d).forall { c2 =>
        val dot = (0 until d).map(r => v(r)(c1) * v(r)(c2)).sum
        math.abs(dot - (if (c1 == c2) 1.0 else 0.0)) < 1e-8
      }
    }
  }

  property("A v = lambda v for every pair") = Prop.forAll(symGen) { m =>
    val d = m.length
    val (values, v) = eigen(m)
    // the scale-relative convergence cut bounds the residual near
    // 1e-13·‖A‖_F (≤ 60 here) — 1e-8 is three orders of headroom,
    // where the old absolute 1e-12 SQUARED-norm cut genuinely
    // produced 1e-6 residuals (caught by this property at its old
    // 1e-6 boundary, then reproduced by a 5·10⁵-matrix fuzz)
    (0 until d).forall { c =>
      (0 until d).forall { r =>
        val av = (0 until d).map(k => m(r)(k) * v(k)(c)).sum
        math.abs(av - values(c) * v(r)(c)) < 1e-8
      }
    }
  }
}
