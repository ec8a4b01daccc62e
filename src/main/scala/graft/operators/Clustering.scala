package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the corpus
  * clustering primitive behind topic bucketing, cluster-balanced
  * sampling, and semantic-coverage audits of a training corpus (and
  * the same assign/update loop IVF coarse quantizers are fit with,
  * cf. graft.index.Ivf which fits its centroids on a bounded sample).
  *
  * Scale shape — per iteration exactly ONE shuffle:
  *   1. assign: centroids are collected to the driver (k×dim doubles,
  *      bounded and independent of corpus size) and inlined as literal
  *      arrays, so assignment is a NARROW map over the corpus — the
  *      broadcast-centroids step of every cluster k-means. No
  *      crossJoin, no per-row k-way join.
  *   2. update: one groupBy(cluster) whose aggregate list is `dim`
  *      fixed-point component sums + count + inertia — all map-side
  *      partial-aggregated, so the shuffle carries k×(dim+2) longs per
  *      input partition instead of n×dim floats (the labelCentroids
  *      shape, Similarity.scala).
  *
  * Determinism contract (what makes an ITERATIVE float algorithm
  * hash-oracle-able at all):
  *   - distances are summed in 10⁻⁸ fixed point: each squared
  *     component difference is rounded to a long BEFORE summing, so
  *     the per-row distance is an exact integer — independent of
  *     partitioning, add order, and engine.
  *   - argmin ties break to the lowest cluster id (mirrors a
  *     ROW_NUMBER ... ORDER BY d, cl replay).
  *   - centroid components are 10⁻⁶ fixed-point sums divided once and
  *     rounded to 6 decimals, so iteration i+1 starts from bit-equal
  *     centroids in every engine.
  * DuckDB replays the whole unrolled loop (see AnalyticsQueries) and
  * the hashes match — NOT an approximate comparison.
  *
  * Quantization bounds: |x| ≤ 10³ keeps round(d²·10⁸) < 2⁶³ per term
  * and the per-cluster component sums exact to ~9×10¹² rows — far past
  * 100 TB corpus sizes.
  */
object Clustering {

  /** One k-means iteration report row-set: (cluster, n_vecs,
    * inertia_fp, pos, centroid). */
  private val DistFp = 1e8
  private val CentFp = 1e6

  /** Fixed-point squared L2 distance to a literal centroid: Σᵢ
    * floor((xᵢ-cᵢ)²·10⁸ + ½) as a long — add-order independent.
    * Served by the fused native kernel (HOFs never enter whole-stage
    * codegen — see ClusteringExpressions); [[distFpHof]] is the
    * bit-parity twin the kernel spec pins against. */
  private def distFp(vec: Column, cent: Array[Double]): Column =
    distFpKernel(vec, cent)

  /** The fused kernel column (exposed for the parity spec). */
  private[operators] def distFpKernel(vec: Column, cent: Array[Double]): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    CB.column(graft.functions.expressions.FixedPointSquaredL2Const(
      CB.expression(vec), cent))
  }

  /** Interpreted HOF twin of [[distFp]] (kernel-parity spec reference;
    * round() == floor(+½) here because every term is nonnegative). */
  private[operators] def distFpHof(vec: Column, cent: Array[Double]): Column = {
    val c = array(cent.map(lit): _*)
    aggregate(
      zip_with(vec.cast("array<double>"), c, (x, cc) => {
        val d = x - cc
        round(d * d * lit(DistFp)).cast("long")
      }),
      lit(0L), (s, v) => s + v)
  }

  /** First index j whose distance is ≤ every later one — given the
    * when-chain tries j in ascending order, this selects the global
    * argmin with ties to the LOWEST cluster id (the ROW_NUMBER
    * ORDER BY d, cl contract the oracle replays). */
  private def argmin(ds: Seq[Column]): Column =
    ds.zipWithIndex.init.foldRight(lit(ds.length - 1): Column) {
      case ((d, j), rest) =>
        when(ds.drop(j + 1).map(d <= _).reduce(_ && _), lit(j)).otherwise(rest)
    }

  /** PUBLIC assignment expression: the cluster id (int) of `vec` under
    * literal `cents` — a pure narrow column (no join, no state), so
    * the SAME expression assigns a STREAMING frame (the serving-time
    * "which topic bucket is this arriving doc" map) and any batch
    * frame, with the identical fixed-point/tie-break contract the
    * q135 oracle replays. */
  def assignExpr(vec: Column, cents: Array[Array[Double]]): Column =
    argmin(cents.toSeq.map(c => distFp(vec, c))).cast("int")

  /** PUBLIC selected-distance expression: the fixed-point squared-L2
    * distance (long) from `vec` to its NEAREST centroid — the inertia
    * contribution of the [[assignExpr]] assignment, and the outlier
    * score of the q153 audit (a vector far from every bucket center is
    * off-distribution for the frozen model). Same narrow/no-state
    * contract as [[assignExpr]]; ties collapse (equal distances give
    * the same least value the argmin's winner carries). */
  def minDistExpr(vec: Column, cents: Array[Array[Double]]): Column =
    cents.toSeq.map(c => distFp(vec, c)) match {
      case Seq(only) => only
      case ds        => least(ds: _*)
    }

  /** Narrow-map assignment under literal centroids: adds `cl` (int)
    * and `d_fp` (the selected distance, for inertia). */
  private def assign(embeddings: DataFrame, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val ds = cents.toSeq.map(c => distFp(col(vecCol), c))
    embeddings
      .withColumn("cl", argmin(ds).cast("int"))
      .withColumn("d_fp", ds.reduce((a, b) => least(a, b)))
  }

  /** One-shuffle update: per-cluster count, exact fixed-point inertia,
    * and dim rounded centroid components (posexploded to rows). */
  private def update(assigned: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val sums = (1 to dim).map(i =>
      sum(round(element_at(col(vecCol), i).cast("double") * CentFp).cast("long"))
        .as(s"s$i"))
    val aggs = Seq(count(lit(1)).as("n_vecs"), sum(col("d_fp")).as("inertia_fp")) ++ sums
    assigned.groupBy(col("cl"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("cl").as("cluster"), col("n_vecs"), col("inertia_fp"),
        posexplode(array((1 to dim).map(i => col(s"s$i")): _*)).as(Seq("p", "fpsum")))
      .select(col("cluster"), col("n_vecs"), col("inertia_fp"),
        (col("p") + 1).cast("int").as("pos"),
        round(col("fpsum").cast("double") / (col("n_vecs").cast("double") * CentFp), 6)
          .as("centroid"))
  }

  /** `iters` full Lloyd rounds from deterministic seeds (the vectors
    * with the k smallest ids — reproducible at every sf, no RNG).
    * Returns the LAST round's report: one row per (cluster, dimension)
    * with the cluster's size, exact fixed-point inertia, and rounded
    * centroid component.
    *
    * Driver actions: one dim read + `iters` k×dim centroid collects —
    * all bounded by k·dim, never by corpus size (each collect IS the
    * "broadcast the new centroids" step of distributed k-means).
    * Each round recomputes assignment from the source frame — at
    * 100 TB that is `iters` scans, the standard trade against
    * materializing an n-row assignment per round; cache the source
    * upstream if iterating many rounds.
    *
    * Empty clusters keep their previous centroid (cannot occur under
    * the seeded fixture inits; documented for external callers). */
  def kmeansReport(embeddings: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val dim = embeddings.select(size(col(vecCol)).as("d")).head().getInt(0)
    var cents: Array[Array[Double]] = embeddings
      .filter(col(idCol) < k)
      .select(col(idCol).cast("int"), col(vecCol).cast("array<double>"))
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    require(cents.length == k, s"need the $k seed vectors with ids 0..${k - 1}")
    var report: DataFrame = null
    for (it <- 1 to iters) {
      report = update(assign(embeddings, vecCol, cents), vecCol, dim)
      if (it < iters) { // last round's report is returned, not re-collected
        val byCl = report.select(col("cluster"), col("pos"), col("centroid"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cl, rows) =>
            cl -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
          }
        cents = cents.indices.map(cl => byCl.getOrElse(cl, cents(cl))).toArray
      }
    }
    report
  }

  /** Collect a report frame's centroids as the fitted model (the
    * bounded k×dim action — "broadcast the model"). */
  def modelFromReport(report: DataFrame, k: Int): KmeansModel = {
    val byCl = report.select(col("cluster"), col("pos"), col("centroid"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cl, rows) => cl -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    require((0 until k).forall(byCl.contains), s"report missing clusters (k=$k)")
    KmeansModel((0 until k).map(byCl).toArray)
  }
}

/** Fitted k-means centroids — persistable via [[KmeansArtifact]] so a
  * serving/streaming pipeline assigns under the SAME frozen model the
  * batch fit produced (a model that lives only in a driver Seq refits
  * differently on every cold start — the BpeArtifact argument). */
final case class KmeansModel(centroids: Array[Array[Double]]) {
  def k: Int = centroids.length
  def dim: Int = if (centroids.isEmpty) 0 else centroids(0).length
  def fingerprint: String =
    graft.index.Fingerprint.ofDoubles(
      Array(k.toDouble, dim.toDouble) ++ centroids.flatten)
}

/** Content-fingerprinted sidecar persistence for [[KmeansModel]] —
  * the BpeArtifact/Pca idiom (immutable content file, atomic pointer,
  * re-hash on load). */
object KmeansArtifact {
  import graft.index.{ArtifactStore, SidecarJson}

  private def contentFile(fp: String) = s"kmeans-$fp.json"

  def save(model: KmeansModel, path: String): Unit = {
    val store = ArtifactStore.current
    store.createDirs(path)
    val fp = model.fingerprint
    def arr(xs: Array[Double]) = xs.map(_.toString).mkString("[", ",", "]")
    val json =
      s"""{"fingerprint":"$fp","k":${model.k},"dim":${model.dim},""" +
        s""""centroids":${model.centroids.map(arr).mkString("[", ",", "]")}}"""
    store.writeAtomic(s"$path/${contentFile(fp)}",
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    store.writeAtomic(s"$path/kmeans.json",
      s"""{"fingerprint":"$fp"}""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def load(path: String): KmeansModel = {
    val fp = SidecarJson.read(s"$path/kmeans.json").str("fingerprint")
    val file = s"$path/${contentFile(fp)}"
    val j = SidecarJson.read(file)
    val k = j.int("k"); val dim = j.int("dim")
    val cents = SidecarJson.readMatrix(file, "centroids")
    if (cents.length != k || cents.exists(_.length != dim))
      throw new IllegalArgumentException(s"$file: inconsistent shapes (k=$k dim=$dim)")
    val model = KmeansModel(cents)
    if (model.fingerprint != fp)
      throw new IllegalArgumentException(
        s"$file: content fingerprint ${model.fingerprint} != pointer $fp " +
          "(corrupted or tampered model)")
    model
  }
}
