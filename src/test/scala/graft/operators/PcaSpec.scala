package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.index.ArtifactStore

/** Pca contract: principal directions recovered, orthonormal
  * components, unit-variance whitening, artifact round-trip with
  * tamper refusal, and the narrow-map transform plan. */
class PcaSpec extends SparkSpec {

  // deterministic 2-D cloud stretched along (1, 1): u ~ ±[0..2), tiny
  // orthogonal wobble — dominant eigenvector must align with (1,1)/√2
  private def cloud = {
    val ss = spark
    import ss.implicits._
    (0 until 200).map { i =>
      val u = (i % 40) * 0.1 - 2.0
      val w = ((i * 7) % 11) * 0.01 - 0.05
      (i.toLong, Seq((u + w).toFloat, (u - w).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("fit recovers the stretched direction with descending eigenvalues") {
    val m = Pca.fit(cloud, dim = 2, k = 2)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(m.eigenvalues(0) > 10 * m.eigenvalues(1)) // strongly anisotropic
    val c0 = m.components(0)
    val align = math.abs(c0(0) * 0.7071067811865476 + c0(1) * 0.7071067811865476)
    assert(align > 0.999, s"first component $c0 not aligned with (1,1)/sqrt2")
    // orthonormal rows
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(m.components(0), m.components(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-9)
  }

  test("whitened output has ~unit variance per coordinate and no shuffle in the plan") {
    val m = Pca.fit(cloud, dim = 2, k = 2)
    val out = Pca.transform(cloud, m)
    assert(collectShuffles(out.select(col("proj"))).isEmpty,
      "transform must be a narrow map")
    val projected = out.select(col("proj")).collect().map(_.getSeq[Double](0))
    val n = projected.length.toDouble
    (0 until 2).foreach { c =>
      val xs = projected.map(_(c))
      val mu = xs.sum / n
      val varc = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(varc - 1.0) < 0.01,
        s"coordinate $c variance $varc after whitening")
    }
  }

  test("save -> load round-trips the model; tampered content is refused") {
    val m = Pca.fit(cloud, dim = 2, k = 1)
    val dir = tmpDir("pca-artifact")
    Pca.save(m, dir)
    val back = Pca.load(dir)
    assert(back.fingerprint == m.fingerprint)
    assert(back.mean.toSeq == m.mean.toSeq)
    assert(back.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
    assert(back.eigenvalues.toSeq == m.eigenvalues.toSeq)
    // tamper a VALUE (shape preserved): the re-hash must refuse
    val content = s"$dir/pca-${m.fingerprint}.json"
    val raw = new String(ArtifactStore.current.readBytes(content), "UTF-8")
    val tampered = raw.replaceFirst(""""mean":\[[-0-9.eE]+,""", """"mean":[0.123456789,""")
    assert(tampered != raw, "tamper regex failed to change the content")
    ArtifactStore.current.writeAtomic(content, tampered.getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] { Pca.load(dir) }
    assert(e.getMessage.contains("fingerprint"))
  }

test("jacobiEigen: equal-diagonal matrix rotates at 45 degrees (theta = 0 regression)") {
    // [[1, x], [x, 1]] has eigenpairs (1+x, [1,1]/sqrt2), (1-x, [1,-1]/sqrt2);
    // signum(0) = 0 used to produce a zero rotation here, returning the
    // unrotated diagonal [1, 1] as "eigenvalues" after the sweep cap
    val x = -1.5268874461612185
    val (values, v) = Pca.jacobiEigen(Array(Array(1.0, x), Array(x, 1.0)))
    val got = values.toSeq.sorted
    val want = Seq(1.0 - math.abs(x), 1.0 + math.abs(x)).sorted
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12, s"$got vs $want") }
    // residual check: A v = lambda v per column
    for (c <- 0 to 1; r <- 0 to 1) {
      val m = Array(Array(1.0, x), Array(x, 1.0))
      val av = m(r)(0) * v(0)(c) + m(r)(1) * v(1)(c)
      assert(math.abs(av - values(c) * v(r)(c)) < 1e-12)
    }
  }

  test("fromMoments matches fit (one moment pass is the whole corpus cost)") {
    val cells = cloud
      .agg(graft.functions.VectorFunctions.coMoment(col("embedding"), 2).as("m"))
      .head().getSeq[Long](0).toArray
    val a = Pca.fromMoments(cells, 2, 2)
    val b = Pca.fit(cloud, 2, 2)
    assert(a.fingerprint == b.fingerprint)
  }
}
