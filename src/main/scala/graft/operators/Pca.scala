package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.index.{ArtifactStore, Fingerprint, SidecarJson}

/** PCA / whitening over an embedding column — the standard retrieval
  * post-processing pass (anisotropy removal: raw text-embedding spaces
  * concentrate mass in a few directions, which flattens cosine
  * contrast; whitening rescales each principal direction to unit
  * variance — Mu & Viswanath 2018 "All-but-the-Top", Su et al. 2021
  * "Whitening Sentence Representations").
  *
  * Scale shape — the fit touches the corpus ONCE:
  *   1. moments: one [[graft.functions.expressions.CoMomentAgg]] pass
  *      (fixed ~17 KB mergeable buffer; the ONLY corpus-sized work).
  *   2. eigendecomposition: driver-side cyclic Jacobi on the d×d
  *      covariance — d² doubles, independent of corpus size (64×64
  *      solves in microseconds; the same driver-bounded class as
  *      k-means' centroid collect).
  *   3. transform: a NARROW map — components inlined as literal
  *      arrays, each output coordinate one fused zip_with/aggregate
  *      fold. No shuffle, pipelines inside the scan stage.
  *
  * Determinism: the covariance derives from co_moment's exact integer
  * sums; cyclic Jacobi with a fixed sweep order is a deterministic
  * function of those doubles, so fit → save → load → transform
  * reproduces bit-identically on any host (PcaSpec pins fingerprint
  * stability). Eigen itself is not SQL-expressible, so this surface is
  * spec-gated rather than DuckDB-oracled — the INPUT covariance is
  * what q136 oracles.
  */
object Pca {

  /** Fitted model: per-dimension mean, top-k orthonormal components
    * (rows), and their eigenvalues (variance along each component,
    * descending). */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def dim: Int = mean.length
    def k: Int = components.length
    def fingerprint: String =
      Fingerprint.ofDoubles(mean ++ components.flatten ++ eigenvalues)
  }

  /** Fit from one co_moment pass: k ≤ dim components by descending
    * eigenvalue (ties broken by first-found — Jacobi order, fixed). */
  def fit(embeddings: DataFrame, dim: Int, k: Int,
      vecCol: String = "embedding"): Model = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim, got k=$k dim=$dim")
    val cells = embeddings
      .agg(graft.functions.VectorFunctions.coMoment(col(vecCol), dim).as("m"))
      .head().getSeq[Long](0).toArray
    fromMoments(cells, dim, k)
  }

  /** Build the model from raw co_moment cells `[n, S, P]` — exposed so
    * a persisted/oracled moment row can be refit without a new scan. */
  def fromMoments(cells: Array[Long], dim: Int, k: Int): Model = {
    val n = cells(0).toDouble
    require(n >= 2, s"PCA needs >= 2 rows, got ${cells(0)}")
    val mean = Array.tabulate(dim)(i => cells(1 + i) / (1e6 * n))
    val cov = Array.ofDim[Double](dim, dim)
    var off = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val second = cells(off) / (1e6 * n)
        val c = second - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        off += 1; j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.zipWithIndex.sortBy { case (v, idx) => (-v, idx) }.map(_._2)
    Model(mean,
      order.take(k).map(c => Array.tabulate(dim)(r => vectors(r)(c))),
      order.take(k).map(values))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector COLUMNS). Fixed (p, q) sweep order and
    * a fixed convergence threshold make it deterministic. O(d³) per
    * sweep on the driver — for embedding dims (≤ a few thousand) this
    * is microseconds-to-seconds and never touches an executor.
    *
    * Convergence is SCALE-RELATIVE: iterate until the off-diagonal
    * squared norm falls below 1e-26 × the input's squared Frobenius
    * norm. A fixed absolute cut (formerly 1e-12 on the SQUARED norm)
    * let individual off-diagonals survive at ~1e-6, which is exactly
    * the |Av − λv| residual PcaProps measured at its 1e-6 boundary;
    * quadratic Jacobi convergence makes the tighter cut ~one extra
    * sweep, and the relative form keeps both tiny-scaled and
    * large-scaled covariance matrices converging to the same relative
    * accuracy (fuzzed residual ≤ ~1e-13·‖A‖_F over 5·10⁵ matrices). */
  private[operators] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var frob2 = 0.0
    var fi = 0
    while (fi < d) {
      var fj = 0
      while (fj < d) { frob2 += m(fi)(fj) * m(fi)(fj); fj += 1 }
      fi += 1
    }
    val tol = 1e-26 * math.max(frob2, java.lang.Double.MIN_NORMAL)
    var sweep = 0
    var offNorm = Double.MaxValue
    while (offNorm > tol && sweep < 100) {
      sweep += 1
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // theta == 0 (EQUAL diagonal entries) needs tan = 1 (the
            // 45° rotation): signum(0) = 0 would produce t = 0 — no
            // rotation, off-diagonals never shrink, and the sweep cap
            // returns the unrotated diagonal as "eigenvalues" (caught
            // by PcaProps' boundary-biased matrices, e.g.
            // [[1, x], [x, 1]])
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      offNorm = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { offNorm += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Project (and optionally whiten) the embedding column: adds
    * `outCol` = ARRAY<DOUBLE>[k], coordinate c = (x − mean)·v_c
    * (÷ sqrt(λ_c + eps) when whitening). A narrow map — no shuffle.
    * All k projections run in ONE fused native kernel pass (the HOF
    * formulation re-centered the vector per component and never enters
    * whole-stage codegen — see ClusteringExpressions); whitening is
    * folded into the kernel as a per-component divide AFTER the dot,
    * preserving the exact dot-then-divide arithmetic of
    * [[transformHof]]. */
  def transform(df: DataFrame, model: Model, whiten: Boolean = true,
      eps: Double = 1e-9, vecCol: String = "embedding",
      outCol: String = "proj"): DataFrame = {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    val scales =
      if (whiten) model.eigenvalues.map(ev => math.sqrt(ev + eps))
      else Array.empty[Double]
    df.withColumn(outCol, CB.column(graft.functions.expressions.ProjectVec(
      CB.expression(col(vecCol)), model.mean, model.components, scales)))
  }

  /** Interpreted HOF twin of [[transform]] (kernel-parity spec
    * reference — identical element order and dot-then-divide shape). */
  private[operators] def transformHof(df: DataFrame, model: Model,
      whiten: Boolean = true, eps: Double = 1e-9,
      vecCol: String = "embedding", outCol: String = "proj"): DataFrame = {
    val meanLit = array(model.mean.map(lit): _*)
    val centered = zip_with(col(vecCol).cast("array<double>"), meanLit, (x, mu) => x - mu)
    val coords: Seq[Column] = model.components.toSeq.zip(model.eigenvalues.toSeq)
      .map { case (comp, ev) =>
        val dot = aggregate(
          zip_with(centered, array(comp.map(lit): _*), (x, w) => x * w),
          lit(0.0), (acc, t) => acc + t)
        if (whiten) dot / math.sqrt(ev + eps) else dot
      }
    df.withColumn(outCol, array(coords: _*))
  }

  // ------------------------------------------------------- persistence

  private def contentFile(fp: String) = s"pca-$fp.json"

  /** Persist via the BpeArtifact idiom: immutable content-addressed
    * file first, atomic pointer swap second; load re-hashes. */
  def save(model: Model, path: String): Unit = {
    val store = ArtifactStore.current
    store.createDirs(path)
    val fp = model.fingerprint
    def arr(xs: Array[Double]) = xs.map(_.toString).mkString("[", ",", "]")
    val json =
      s"""{"fingerprint":"$fp","dim":${model.dim},"k":${model.k},""" +
        s""""mean":${arr(model.mean)},""" +
        s""""eigenvalues":${arr(model.eigenvalues)},""" +
        s""""components":${model.components.map(arr).mkString("[", ",", "]")}}"""
    store.writeAtomic(s"$path/${contentFile(fp)}",
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    store.writeAtomic(s"$path/pca.json",
      s"""{"fingerprint":"$fp"}""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def load(path: String): Model = {
    val fp = SidecarJson.read(s"$path/pca.json").str("fingerprint")
    val file = s"$path/${contentFile(fp)}"
    val j = SidecarJson.read(file)
    val dim = j.int("dim"); val k = j.int("k")
    val mean = j.doubleList("mean").toArray
    val evs = j.doubleList("eigenvalues").toArray
    // components is an array of arrays — parse via Jackson rows
    val comps = SidecarJson.readMatrix(file, "components")
    if (mean.length != dim || evs.length != k || comps.length != k ||
        comps.exists(_.length != dim))
      throw new IllegalArgumentException(
        s"$file: inconsistent shapes (dim=$dim k=$k)")
    val model = Model(mean, comps, evs)
    if (model.fingerprint != fp)
      throw new IllegalArgumentException(
        s"$file: content fingerprint ${model.fingerprint} != pointer $fp " +
          "(corrupted or tampered model)")
    model
  }
}
