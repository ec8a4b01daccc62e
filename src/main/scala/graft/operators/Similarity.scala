package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.index.Metric

/** Similarity-search operators over embedding columns.
  *
  * Three tiers, in increasing scale:
  *  - brute-force exact top-k (the oracle; see VectorQueries.knnTopK)
  *  - LSH-bucketed (GraphBuilder.lshKnnEdges)
  *  - IVF (inverted-file) here: KMeans-partition the vectors, probe
  *    only the `nprobe` nearest partitions per query.
  *
  * IVF at 100 TB: the vectors table is physically clustered by
  * `cluster` (partitionBy on write), so a query scans nprobe/k of the
  * data via partition pruning; the probe itself is an equi-join on the
  * cluster id — shuffle-free when the table is bucketed by cluster.
  * Centroids (k × dim floats) broadcast everywhere.
  */
object Similarity {

  /** KMeans-assign vectors (id, vec ARRAY<FLOAT>) to k clusters.
    * Returns (centroids(cluster, cvec), assigned(id, vec, cluster)).
    * Seeded — deterministic for a fixed input.
    *
    * Fit runs Lloyd's iterations on a bounded driver-side SAMPLE
    * (k-means++ init), then assignment is one distributed pass:
    * crossJoin against the broadcast k×dim centroid table + argmin.
    * This is the shape that holds at 100 TB — you fit centroids on a
    * sample (full-corpus Lloyd is never worth its shuffles) and only
    * the embarrassingly-parallel assignment touches every row. It
    * also replaces ~20 MLlib jobs with 2.
    *
    * `metric` = Cosine fits and assigns on L2-NORMALIZED vectors
    * (for unit vectors ||a-b||² = 2 - 2·cos — same partition geometry
    * as spherical k-means), mirroring the reference's metric
    * parameter (src/LMDiskANN.jl:242, cosine tested end-to-end in
    * test/runtests.jl:37-67). `assigned` keeps the ORIGINAL vectors;
    * only the cluster geometry is spherical. */
  def ivfFit(vectors: DataFrame, k: Int, seed: Long = 42L,
      fitSampleRows: Int = 20000, iters: Int = 10,
      metric: Metric = Metric.Euclidean): (DataFrame, DataFrame) = {
    val model = ivfFitModel(vectors, k, seed, fitSampleRows, iters, metric)
    (centroidsDf(vectors.sparkSession, model), assignClusters(vectors, model))
  }

  /** The fit itself, returning the persistable [[graft.index.IvfModel]]
    * — [[ivfFit]] composes this with [[assignClusters]]; the index
    * lifecycle ([[graft.index.VectorIndex.fitIVF]]) persists the model
    * as a sidecar and derives per-segment assignments from it. */
  def ivfFitModel(vectors: DataFrame, k: Int, seed: Long = 42L,
      fitSampleRows: Int = 20000, iters: Int = 10,
      metric: Metric = Metric.Euclidean): graft.index.IvfModel = {
    // deterministic UNIFORM sample: top-N by multiplicative id-hash
    // (the q53 Sampling.bucket family at fine granularity), not
    // first-N in id order — ids correlate with content in practice
    // (crawl order, source grouping), so an id-prefix fit sees a
    // biased slice of the corpus. Hash order keeps the determinism
    // and compiles to TakeOrderedAndProject (bounded heap per
    // partition + single merge), never a full sort shuffle.
    // …then fit in id order: k-means++ init is order-sensitive, so the
    // fit must be a canonical function of the sample SET (and identical
    // to the pre-hash-order fit whenever the sample covers the input).
    // The id is cast to LONG up front: Sampling.bucket does modular
    // arithmetic and the driver-side sort reads getLong, so an Int- or
    // String-id source would otherwise throw mid-collect.
    val rawSample = vectors.select(col("id").cast("long").as("id"), col("vec"))
      .orderBy(Sampling.bucket(col("id"), gran = 1000000000), col("id"))
      .limit(fitSampleRows).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val sample = metric match {
      case Metric.Euclidean => rawSample
      case Metric.Cosine => rawSample.map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) v else v.map(_ / n)
      }
      case m => Metric.nativeOnly(m, "IVF fit")
    }
    require(sample.nonEmpty, "ivfFit needs at least one vector")
    val dim = sample.head.length
    val rng = new scala.util.Random(seed)
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ init
    val centers = scala.collection.mutable.ArrayBuffer(sample(rng.nextInt(sample.length)))
    while (centers.length < math.min(k, sample.length)) {
      val d2 = sample.map(v => centers.iterator.map(c => sq(v, c)).min)
      val total = d2.sum
      var pick = rng.nextDouble() * total
      var idx = 0
      while (idx < d2.length - 1 && pick > d2(idx)) { pick -= d2(idx); idx += 1 }
      centers += sample(idx)
    }
    // Lloyd iterations over the sample
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Long](centers.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < centers.length) {
          val d = sq(v, centers(c)); if (d < bestD) { bestD = d; best = c }; c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      var c = 0
      while (c < centers.length) {
        if (counts(c) > 0) centers(c) = sums(c).map(_ / counts(c))
        c += 1
      }
      it += 1
    }
    val centroidArrays = centers.toSeq.map(_.map(_.toFloat))
    graft.index.IvfModel(centroidArrays.length, dim,
      metric.name, centroidArrays.flatten.toArray)
  }

  /** The model's centroid table (cluster, cvec) — the broadcast probe
    * side of [[ivfTopK]]. */
  def centroidsDf(spark: org.apache.spark.sql.SparkSession,
      model: graft.index.IvfModel): DataFrame = {
    import spark.implicits._
    model.centroidPairs.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("cluster", "cvec")
  }

  /** Nearest-centroid assignment as a PURE per-row expression — least()
    * over one (dist, cluster) struct per centroid literal, deterministic
    * tie-break by cluster id. Map-only: no crossJoin row explosion, no
    * groupBy shuffle; at 100 TB only this narrow pass touches every row.
    * Cosine models assign on the L2-NORMALIZED vector (the centroids
    * live on the unit sphere); the output keeps the ORIGINAL vector.
    * NULL vectors (index tombstones) get a NULL cluster, so per-segment
    * assignment artifacts inherit the tables' tombstone convention. */
  def assignClusters(vectors: DataFrame, model: graft.index.IvfModel,
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val candidates = model.centroidPairs.map { case (c, cv) =>
      struct(
        VectorFunctions.squaredEuclidean(col("__avec"), typedLit(cv.toSeq)).as("cdist"),
        lit(c).as("cluster"))
    }
    val best =
      if (candidates.length == 1) candidates.head
      else least(candidates.toSeq: _*)
    val prepared = model.metric match {
      case Metric.Euclidean =>
        vectors.select(col(idCol).as("id"), col(vecCol).as("vec"), col(vecCol).as("__avec"))
      case Metric.Cosine => vectors
        .select(col(idCol).as("id"), col(vecCol).as("vec"),
          VectorFunctions.l2Norm(col(vecCol)).as("__nrm"))
        .select(col("id"), col("vec"),
          VectorFunctions.normalizedByNorm(col("vec"), col("__nrm")).as("__avec"))
      case m => Metric.nativeOnly(m, "IVF assignment")
    }
    prepared.select(col("id"), col("vec"),
      when(col("vec").isNotNull, best.getField("cluster")).as("cluster"))
  }

  /** IVF probe: for each query, find the `nprobe` nearest centroids,
    * then exact top-k within those clusters only. Queries must be
    * (query_id, qvec). Pass the SAME metric the fit used: cosine
    * probes on the normalized query (the centroids live on the unit
    * sphere) and re-scores hits with true cosine distance. */
  /** Optional `filter` restricts the candidate set (filtered ANN): the
    * predicate is applied to `assigned` BEFORE the probe join, so it
    * prunes the scan (and, phrased on a partition/storage column,
    * pushes down to the source) instead of discarding scored rows.
    * `assigned` may carry extra metadata columns for it to reference.
    * `pairFilter` is applied AFTER the cluster join (it may reference
    * both `query_id` and the candidate `id`) and BEFORE the distance
    * heap — the hook [[knnJoin]] uses to exclude self-matches without
    * an extra shuffle or post-hoc re-rank. */
  def ivfTopK(
      assigned: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      topk: Int,
      nprobe: Int,
      metric: Metric = Metric.Euclidean,
      filter: Column = lit(true),
      pairFilter: Column = lit(true)): DataFrame = {
    val q = metric match {
      case Metric.Euclidean => queries.select(col("query_id"), col("qvec"), col("qvec").as("__qprobe"))
      case Metric.Cosine => queries
        .select(col("query_id"), col("qvec"), VectorFunctions.l2Norm(col("qvec")).as("__nrm"))
        .select(col("query_id"), col("qvec"), VectorFunctions.normalizedByNorm(col("qvec"), col("__nrm")).as("__qprobe"))
      case m => Metric.nativeOnly(m, "IVF probe")
    }
    val dcol = Metric.distColumn(metric, col("qvec"), col("vec"))
    // step 1: nprobe nearest clusters per query (tiny crossJoin:
    // |queries| x k centroids, both broadcastable)
    val probe = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qvec"), col("cluster"),
        VectorFunctions.squaredEuclidean(col("__qprobe"), col("cvec")).as("cdist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("cdist"), col("cluster").cast("long"), nprobe).as("tk"),
        first(col("qvec")).as("qvec"))
      .select(col("query_id"), col("qvec"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("qvec"), col("p.id").cast("int").as("cluster"))
    // step 2: equi-join on cluster (partition-pruned at scale), exact
    // distance within probed clusters, global top-k per query
    probe.join(assigned.filter(filter), Seq("cluster"))
      .filter(pairFilter)
      .select(col("query_id"), col("id").as("neighbor_id"), dcol.as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), topk).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"), col("p.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Per-label embedding centroids (class prototypes): the element-wise
    * mean vector of every label group — the building block of
    * prototype classifiers, per-domain embedding drift monitors, and
    * cluster-quality probes over a labeled corpus.
    *
    * Scale shape: one groupBy(label) whose aggregate list is `dim`
    * per-component sums — ALL of them partial-aggregate map-side, so
    * the shuffle carries k × (dim+1) longs per input partition instead
    * of n × dim floats (the explode-then-group formulation every SQL
    * engine reaches for first shuffles the full corpus × dim). The
    * k × dim result is then unpivoted driver-free with one posexplode
    * over an already-tiny frame.
    *
    * Determinism: each component is fixed-pointed per ROW (×10⁶,
    * round, BIGINT) before summing, so group sums are exact integers —
    * independent of partitioning, engine, and add order. Overflow
    * bound: |group| × max|x| × 10⁶ < 2⁶³ ⇒ fine to ~9×10¹² rows per
    * label at |x| ≤ 1000.
    *
    * `dim` is read from one row (a driver action bounded by a single
    * vector) — embedding dims are schema-stable in practice. */
  def labelCentroids(
      embeddings: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val dim = embeddings.select(size(col(vecCol)).as("d")).head().getInt(0)
    val sums = (1 to dim).map(i =>
      sum(round(element_at(col(vecCol), i).cast("double") * 1000000.0).cast("long"))
        .as(s"s$i"))
    val aggs = count(lit(1)).as("n_vecs") +: sums
    embeddings.groupBy(col(labelCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(labelCol), col("n_vecs"),
        posexplode(array((1 to dim).map(i => col(s"s$i")): _*)).as(Seq("p", "fpsum")))
      .select(col(labelCol), col("n_vecs"), (col("p") + 1).as("pos"),
        round(col("fpsum").cast("double") / (col("n_vecs").cast("double") * 1000000.0), 4)
          .as("centroid"))
  }

  /** Symmetric per-dimension int8 scalar quantization of an embedding
    * column — the storage tier below PQ (4× smaller than float32 with
    * no codebook to fit; the standard first compression step before
    * int8 rescoring in large retrieval corpora).
    *
    * Fit = one global aggregate producing `dim` per-dimension max-abs
    * scales (map-side partial max; one row crosses the network), then
    * quantization is a narrow per-row map: `code_i = floor(x_i * 127 /
    * s_i + 0.5)` ∈ [-127, 127], dequant `code_i * s_i / 127`. At
    * 100 TB: zero shuffle beyond the dim-double fit row; codes append
    * as a column, never rewriting vectors.
    *
    * Determinism: max is add-order independent; the quantize/dequant
    * arithmetic is correctly-rounded IEEE double ops on identical
    * inputs, and `floor(x + 0.5)` pins the rounding rule (engines
    * disagree on round-half semantics, not on floor). An all-zero
    * dimension (s_i = 0) quantizes to 0. `mse` is the per-vector mean
    * squared reconstruction error accumulated in array order, so the
    * fold matches DuckDB's `list_reduce` bit-for-bit. */
  def int8Quantize(embeddings: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val scales = int8Scales(embeddings, vecCol)
    val dim = scales.length
    val sArr = array(scales.map(lit): _*)
    val x = (i: Column) => element_at(col(vecCol), i).cast("double")
    val s = (i: Column) => element_at(sArr, i)
    val withCodes = embeddings.withColumn("codes", int8Codes(col(vecCol), scales))
    val err = aggregate(sequence(lit(1), lit(dim)), lit(0.0), (acc, i) => {
      val d = x(i) - element_at(col("codes"), i).cast("double") * s(i) / 127.0
      acc + d * d
    })
    withCodes.withColumn("mse", round(err / lit(dim.toDouble), 6))
  }

  /** Per-dimension max-abs scales for [[int8Quantize]]/[[int8TopK]]:
    * one global partial-max aggregate, dim doubles through the
    * driver. */
  def int8Scales(embeddings: DataFrame, vecCol: String = "embedding"): Seq[Double] = {
    val dim = embeddings.select(size(col(vecCol)).as("d")).head().getInt(0)
    val maxAbs = (1 to dim).map(i =>
      max(abs(element_at(col(vecCol), i).cast("double"))).as(s"m$i"))
    val row = embeddings.agg(maxAbs.head, maxAbs.tail: _*).head()
    (0 until dim).map(i => if (row.isNullAt(i)) 0.0 else row.getDouble(i))
  }

  /** Quantize a vector column to int8 codes under fitted `scales` —
    * native encode kernel ([[graft.functions.expressions.Int8Encode]];
    * the transform-over-sequence HOF ran interpreted per corpus
    * row). */
  def int8Codes(vec: Column, scales: Seq[Double]): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    CB.column(graft.functions.expressions.Int8Encode(
      CB.expression(vec), scales.toArray))
  }

  /** Int8-compressed top-k serving tier: candidate generation scans
    * the 4×-smaller code column (approximate squared L2 against the
    * dequantized codes), then an exact re-rank of the O(queries ·
    * topk · refineFactor) candidate set restores precision — the same
    * two-tier contract as the PQ path ([[graft.index.Quantization
    * .pqTopK]]) with a codebook-free code column. At serving scale
    * the win is the resident set: the scan stage reads 1 byte/dim
    * instead of 4, and the full-precision table is touched only for
    * the tiny candidate join (broadcast — never a second full scan).
    * Queries are collected driver-side by contract (a query batch is
    * small); candidates broadcast back for the refine join. */
  /** PCA-prefilter top-k: the DIMENSIONAL compression tier beside the
    * byte tiers (PQ codes, int8 scalars) — candidates are scanned in a
    * k'-dim UNWHITENED principal projection (k'=16 of 64 ⇒ 4× less
    * hot data per distance; whitening would distort L2, so the raw
    * projection is used — an orthonormal projection is a contraction,
    * so projected distances under-estimate and the refine pass fixes
    * rank inversions), then the topk·refineFactor survivors are
    * re-scored exactly. Same candidates/refine plan shape as
    * [[int8TopK]]: per-query bounded heaps over one projected scan,
    * broadcast-joined refine over O(queries·candidates) rows. The
    * model is a FIT-TIME artifact (Pca.fit is one co_moment pass;
    * persist via Pca.save) — serving never rescans the corpus to
    * derive it. */
  def pcaPrefilterTopK(
      corpus: DataFrame,
      queries: Array[(Long, Array[Float])],
      model: Pca.Model,
      topk: Int,
      refineFactor: Int = 4): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, StructField, StructType}
    val spark = corpus.sparkSession
    def project(v: Array[Float]): Seq[Double] = {
      val centered = Array.tabulate(model.dim)(i => v(i).toDouble - model.mean(i))
      model.components.toSeq.map { comp =>
        var s = 0.0; var i = 0
        while (i < model.dim) { s += centered(i) * comp(i); i += 1 }
        s
      }
    }
    val qdf = spark.createDataFrame(
      java.util.Arrays.asList(queries.map { case (qid, qv) =>
        Row(qid, qv.toSeq, project(qv)) }: _*),
      StructType(Seq(
        StructField("query_id", LongType, nullable = false),
        StructField("qvec", ArrayType(FloatType, containsNull = false), nullable = false),
        StructField("qproj", ArrayType(DoubleType, containsNull = false), nullable = false))))
    val projected = Pca.transform(corpus, model, whiten = false, vecCol = "vec")
      .select(col("id"), col("proj"))
    val candidates = projected
      .crossJoin(broadcast(qdf.select(col("query_id"), col("qproj"))))
      .select(col("query_id"), col("id").as("neighbor_id"),
        // fused kernel over the DOUBLE projections (the generalized
        // SquaredL2) — this scan is the tier's hot loop
        VectorFunctions.squaredEuclidean(col("qproj"), col("proj")).as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), topk * refineFactor).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.id").as("neighbor_id"))
    broadcast(candidates)
      .join(corpus.select(col("id").as("neighbor_id"), col("vec")), "neighbor_id")
      .join(broadcast(qdf.select(col("query_id"), col("qvec"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.squaredEuclidean(col("qvec"), col("vec")).as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), topk).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        col("p.dist").as("dist"), (col("pos") + 1).as("rnk"))
  }

  def int8TopK(
      corpus: DataFrame,
      queries: Array[(Long, Array[Float])],
      topk: Int,
      refineFactor: Int = 4,
      fittedScales: Option[Seq[Double]] = None): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
    val spark = corpus.sparkSession
    // scales are a FIT-TIME artifact (one max-abs pass over the
    // corpus): serving callers pass them in so repeated queries never
    // re-scan the corpus to re-derive a constant — at 100 TB the
    // per-call fallback fit is a full corpus pass per lookup
    val scales = fittedScales.getOrElse(int8Scales(corpus, "vec"))
    val dim = scales.length
    val qdf = spark.createDataFrame(
      java.util.Arrays.asList(queries.map { case (qid, qv) => Row(qid, qv.toSeq) }: _*),
      StructType(Seq(
        StructField("query_id", LongType, nullable = false),
        StructField("qvec", ArrayType(FloatType, containsNull = false), nullable = false))))
    // native codegen ADC kernel — the scan stage's per-pair loop; the
    // HOF formulation (aggregate over sequence) is never codegen'd by
    // Spark and dropped the whole candidate stage out of
    // WholeStageCodegen. Bit-identical arithmetic (widen-first,
    // left-to-right), scales ride as a reference object.
    val approx = {
      import org.apache.spark.sql.graft.{ColumnBridge => CB}
      CB.column(graft.functions.expressions.Int8AdcSquaredL2(
        CB.expression(col("qvec")), CB.expression(col("codes")),
        scales.map(_ / 127.0).toArray))
    }
    val candidates = corpus
      .select(col("id"), int8Codes(col("vec"), scales).as("codes"))
      .crossJoin(broadcast(qdf))
      .select(col("query_id"), col("id").as("neighbor_id"), approx.as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), topk * refineFactor).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.id").as("neighbor_id"))
    broadcast(candidates)
      .join(corpus.select(col("id").as("neighbor_id"), col("vec")), "neighbor_id")
      .join(broadcast(qdf), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.squaredEuclidean(col("qvec"), col("vec")).as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), topk).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        col("p.dist").as("dist"), (col("pos") + 1).as("rnk"))
  }

  /** Signed-random-projection (SRP / random-hyperplane) signature of
    * an embedding (Charikar STOC'02): bit b is the sign of v·r_b for
    * a fixed pseudo-random ±1 hyperplane r_b. P[bit differs] = θ/π,
    * so hamming distance on signatures estimates angular distance —
    * the cosine-geometry counterpart of the text [[Dedup.simhash]].
    * Hyperplane entries are deterministic integer arithmetic (no RNG
    * state): parity of a QUADRATIC modular mix of (b, j). The
    * nonlinearity is load-bearing — affine mixes degenerate (two odd
    * multipliers reduce parity to (b+j) mod 2 = two distinct
    * hyperplanes; a Weyl rotation gives near-duplicate sign patterns
    * at some offset pairs), and the x² term needs the additive offset
    * so small x never evades the modular wrap (b=0 planes were
    * all-ones: parity(x²+x) is always even below the modulus).
    * Measured over 32 planes at dim 64/100: per-plane balance within
    * ±20%, pairwise |corr| mean ≈ the independent-random expectation.
    * Every operation stays below 2^63 in BIGINT, so an external
    * engine replays the signature bit-for-bit — which is what lets
    * the downstream banded pair join be value-oracled instead of
    * recall-gated. The per-bit dot folds left-to-right in array
    * order. Pure per-row column expression: zero shuffle, pipelines
    * inside the scan.
    *
    * Served by the fused native kernel — the HOF formulation ran
    * nBits zip_with+aggregate legs per row, each interpreted and
    * array-allocating; the kernel accumulates all bit dots in one
    * element pass inside WholeStageCodegen. [[srpSignatureHof]] is
    * the bit-parity twin ClusteringKernelSpec pins against. */
  def srpSignature(vec: Column, nBits: Int = 32): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    CB.column(graft.functions.expressions.SrpSignature(CB.expression(vec), nBits))
  }

  /** Interpreted HOF twin of [[srpSignature]] (kernel-parity spec
    * reference — same plane formula via 1-based `sequence`, same
    * per-bit left-to-right fold). */
  private[operators] def srpSignatureHof(vec: Column, nBits: Int = 32): Column = {
    require(nBits >= 1 && nBits <= 64, s"nBits must be in [1, 64], got $nBits")
    def planeSign(b: Int, j: Column): Column = {
      val x = lit((b + 7).toLong * 1000003L) + j * 10007L
      val q = (x * x) % 1000000007L
      when(((q * 48271L + x * 16807L) % 2147483647L) % 2L === 0L, 1.0d)
        .otherwise(-1.0d)
    }
    val bits = (0 until nBits).map { b =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(1L), size(vec).cast("long")),
          (x, j) => x.cast("double") * planeSign(b, j)),
        lit(0.0d), (acc, t) => acc + t)
      when(dot > 0d, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Semantic decontamination: for every training vector, its maximum
    * cosine similarity against a benchmark/eval embedding set, plus the
    * `contaminated` flag at threshold `tau`. The embedding-space twin
    * of the shingle-based `DocQueries.decontaminate` — catches
    * paraphrased or re-tokenized benchmark leakage that exact n-gram
    * overlap misses (the reason modern pipelines run BOTH checks).
    *
    * Scale shape: the benchmark set is broadcast (eval suites are
    * thousands of rows — never corpus-sized); candidates = one
    * broadcast nested-loop pass over the training scan. The per-row
    * max collapses map-side (partial `max` over the |bench|
    * multiplicity inside each partition), so the single shuffle
    * carries one row per training vector, not |train|×|bench|.
    * Training vectors never move: at 100 TB this is scan-bound, the
    * only shape a contamination sweep can afford. `max_cos` is
    * ROUND(·,4) AFTER the max (max selection is order-independent on
    * the raw doubles), and zero-norm rows score 0 via the shared
    * TRY-division contract. */
  def semanticDecontaminate(
      train: DataFrame,
      bench: DataFrame,
      tau: Double = 0.8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    def withNorm(df: DataFrame, id: String, vec: String, nrm: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        sqrt(VectorFunctions.dot(col(vecCol), col(vecCol))).as(nrm))
    val t = withNorm(train, "id", "vec", "nrm")
    val b = withNorm(bench, "bench_id", "bvec", "bnrm")
    t.crossJoin(broadcast(b))
      .select(col("id"),
        VectorFunctions.cosineSimFromNorms(
          VectorFunctions.dot(col("vec"), col("bvec")),
          col("nrm"), col("bnrm")).as("cos"))
      .groupBy(col("id"))
      .agg(max(col("cos")).as("raw_max"))
      // flag on the ROUNDED value: a final-ulp divergence between
      // engines at the threshold boundary must not flip the decision
      .select(col("id").as(idCol),
        (round(col("raw_max"), 4) + lit(0.0)).as("max_cos"))
      .withColumn("contaminated", col("max_cos") >= tau)
  }

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein,
    * SIGIR '98): greedily re-order a candidate set so each pick
    * balances relevance against redundancy with what is already
    * chosen — `score = λ·rel − (1−λ)·max_{s∈S} sim(c, s)` — the
    * standard diversification step between ANN retrieval and a RAG
    * context window (k near-identical passages waste the window; MMR
    * spends it on coverage).
    *
    * Shape: the greedy loop is inherently sequential in k — but only
    * WITHIN one query's candidate list, which is bounded by
    * construction (a rerank consumes retrieval's top-N, never the
    * corpus). So the selection runs where the group lives: ONE
    * query_id-keyed exchange groups each candidate list, then the k
    * greedy rounds execute locally over the ≤N in-memory rows
    * (O(k·N·d) per query). Queries scale out embarrassingly —
    * 10⁶ queries are 10⁶ independent groups across the fleet — and
    * the driver schedules one stage instead of ~4 jobs × k rounds
    * (the previous relational unrolling: correct, but at fleet scale
    * the k global barriers, not the arithmetic, were the cost; its
    * history is in git). Per-group state is the candidate list
    * itself — the same bound the relational form carried.
    *
    * Determinism contract (what lets DuckDB replay it exactly): every
    * decision runs in EXACT INTEGER fixed-point. Relevance and each
    * pairwise sim quantize once via `floor(x·10⁴ + 0.5)` (the q87/q90
    * rule — deterministic on the binary double where ROUND can split a
    * decimal .5 tie differently per engine), λ is the rational
    * `lamNum/lamDen`, and the score is the exact BIGINT
    * `lamNum·rel_fp − (lamDen−lamNum)·maxsim_fp` (units of
    * 10⁻⁴/lamDen). Argmax on (score_fp DESC, cand_id ASC) — pure
    * integer ordering, nothing left for an ulp to flip.
    *
    * Input `cands`: (query_id, cand_id, rel DOUBLE raw, vec
    * ARRAY<FLOAT>), at most N rows per query. Output:
    * (query_id, cand_id, rnk, score_fp BIGINT), rnk = 1..k in pick
    * order. */
  def mmrRerank(cands: DataFrame, k: Int, lamNum: Int = 7, lamDen: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(lamNum >= 0 && lamNum <= lamDen, "lambda must be a rational in [0, 1]")
    val sess = cands.sparkSession
    import sess.implicits._
    val lamN = lamNum.toLong
    val lamC = (lamDen - lamNum).toLong
    // The local arithmetic replicates the column kernels OP FOR OP so
    // the DuckDB unrolled-CTE oracle (and the relational form's pinned
    // results) replay bit-identically: float elements widen to double
    // BEFORE the multiply and accumulate left-to-right (DotProduct
    // kernel), zero-norm similarity is 0 (the try_divide contract),
    // and every decision quantizes via floor(x·10⁴ + 0.5) exact
    // integers first.
    def dotD(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def fpL(x: Double): Long = math.floor(x * 10000.0 + 0.5).toLong
    cands
      .select(col("query_id").cast("long"), col("cand_id").cast("long"),
        col("rel").cast("double"), col("vec"))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // candidate order pinned by id so shuffle arrival order can
        // never influence a tie (argmax keeps the FIRST max = min id)
        val rows = it.toArray.sortBy(_._2)
        val n = rows.length
        val relFp = new Array[Long](n)
        val nrm = new Array[Double](n)
        var i = 0
        while (i < n) {
          relFp(i) = fpL(rows(i)._3)
          nrm(i) = math.sqrt(dotD(rows(i)._4, rows(i)._4))
          i += 1
        }
        val maxSim = new Array[Long](n)
        val picked = new Array[Boolean](n)
        val out = Vector.newBuilder[(Long, Long, Int, Long)]
        var rnk = 1
        var exhausted = false
        while (rnk <= k && !exhausted) {
          var best = -1
          var bestScore = 0L
          var j = 0
          while (j < n) {
            if (!picked(j)) {
              // first pick has no selected set: redundancy term is 0
              val score =
                if (rnk == 1) lamN * relFp(j)
                else lamN * relFp(j) - lamC * maxSim(j)
              if (best == -1 || score > bestScore) { best = j; bestScore = score }
            }
            j += 1
          }
          if (best == -1) exhausted = true
          else {
            picked(best) = true
            out += ((qid, rows(best)._2, rnk, bestScore))
            var m = 0
            while (m < n) {
              if (!picked(m)) {
                val den = nrm(m) * nrm(best)
                val sim = if (den == 0.0) 0.0 else dotD(rows(m)._4, rows(best)._4) / den
                val simFp = fpL(sim)
                // max over ALL picked so far — incremental max equals
                // the relational round's max(sim_fp) aggregate; fresh
                // candidates start at 0… except sims can be NEGATIVE,
                // so round 2's value must be the pick-1 sim itself
                if (rnk == 1 || simFp > maxSim(m)) maxSim(m) = simFp
              }
              m += 1
            }
            rnk += 1
          }
        }
        out.result().iterator
      }
      .toDF("query_id", "cand_id", "rnk", "score_fp")
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Hard-negative mining for contrastive/metric training: for each
    * broadcast anchor, the k nearest OTHER-label vectors (the
    * hardest negatives) with the margin over the anchor's nearest
    * SAME-label vector — `margin = d(a, n) - min_p d(a, p)`.
    * Negative margin rows are the triplet-loss violators (a negative
    * sits inside the positive ball); small positive margins are the
    * semi-hard band a trainer actually samples from (Schroff et al.
    * 2015, FaceNet).
    *
    * Scale shape: the anchor set is eval-sized and BROADCAST; the
    * corpus is scanned twice, both legs map-only into partial
    * aggregates (a min per (anchor) for positives, a bounded k-heap
    * per (anchor) for negatives) — the shuffle carries O(anchors)
    * and O(anchors × k) rows respectively, never the corpus. Two
    * pushdown-pruned scans beat materializing the scored cross frame
    * (the bloomPrunedAntiJoin trade). Distances are rounded to 4
    * BEFORE ranking and the margin subtracts two rounded doubles —
    * deterministic in both engines.
    *
    * @param anchors (anchor_id, avec, anchor_label)
    * @return (anchor_id, neg_id, dist, d_pos, margin, rnk) — rnk by
    *         (dist, neg_id) within anchor
    */
  def hardNegatives(
      embeddings: DataFrame,
      anchors: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    import graft.functions.VectorFunctions.{euclidean, topKPairs}
    val scored = embeddings
      .crossJoin(broadcast(anchors))
      .filter(col(idCol) =!= col("anchor_id"))
      .select(col("anchor_id"), col("anchor_label"), col(idCol), col(labelCol),
        (round(euclidean(col("avec"), col(vecCol)), 4) + lit(0.0)).as("dist"))
    val dPos = scored.filter(col(labelCol) === col("anchor_label"))
      .groupBy(col("anchor_id")).agg(min(col("dist")).as("d_pos"))
    scored.filter(col(labelCol) =!= col("anchor_label"))
      .groupBy(col("anchor_id"))
      .agg(topKPairs(col("dist"), col(idCol), k).as("tk"))
      .select(col("anchor_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .join(broadcast(dPos), Seq("anchor_id"))
      .select(col("anchor_id"), col("p.id").as("neg_id"), col("p.dist").as("dist"),
        col("d_pos"),
        (round(col("p.dist") - col("d_pos"), 4) + lit(0.0)).as("margin"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Distributed kNN JOIN — for EVERY row of `queries`, its k nearest
    * rows of `corpus` — with NEITHER side broadcast. This is the shape
    * [[hardNegatives]] / [[semanticDecontaminate]] cannot reach (both
    * broadcast an eval-sized probe side): semantic self-dedup, per-doc
    * nearest-neighbor graphs, and hard-negative mining over the FULL
    * corpus all need corpus × corpus.
    *
    * Scale shape (the Spark-side IVF join): both sides take a narrow
    * nearest-centroid map against the broadcast centroid literal set —
    * the corpus to its 1 home cell, each query replicated to its
    * `nprobe` closest cells — then ONE cluster equi-join co-locates
    * candidates (shuffle carries rows × nprobe, never |Q|·|C| pairs)
    * and a bounded per-query k-heap ([[VectorFunctions.topKPairs]])
    * ends the plan. Self-matches are cut by `ivfTopK`'s pairFilter
    * BEFORE the heap, so no post-hoc re-rank. Recall is bounded by the
    * cell partition exactly as in IVF search; q155 self-reports it
    * against the exact twin.
    *
    * @param queries  (idCol, vecCol) — may BE the corpus (self-join)
    * @param excludeSelf drop candidate id == query id (self-join mode)
    */
  def knnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 8,
      excludeSelf: Boolean = false,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      fitted: Option[graft.index.IvfModel] = None): DataFrame = {
    // `fitted` lets production pass the PERSISTED cell model (the
    // VectorIndex.loadOrFitIVF / IvfModel.save lifecycle) so repeated
    // joins over a stable corpus skip the sample-fit — same rule as
    // every other fitted artifact (int8 scales, PQ codebooks).
    val model = fitted.getOrElse(ivfFitModel(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec")), cells))
    val assigned = assignClusters(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec")), model)
    val centroids = centroidsDf(corpus.sparkSession, model)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val pf = if (excludeSelf) col("query_id") =!= col("id") else lit(true)
    ivfTopK(assigned, centroids, q, topk = k, nprobe = nprobe, pairFilter = pf)
  }

  /** Reciprocal nearest-neighbor pairs: the (x, y) where each sits in
    * the OTHER's top-k — the high-precision semantic-duplicate
    * criterion on top of a kNN join (one-directional proximity flags a
    * hub's whole neighborhood; mutuality cuts exactly those hub
    * false-positives, the classic RNN rule from agglomerative
    * clustering and image-matching practice). Input is any
    * (query_id, neighbor_id, dist) frame — [[knnJoin]] (IVF tier) at
    * scale, [[knnJoinExact]] as the oracle twin.
    *
    * Scale shape: ONE self equi-join on the reversed key over the
    * |corpus|·k kNN frame (never the corpus), then the lo < hi
    * canonical cut so each pair emits once. */
  def mutualKnnPairs(knn: DataFrame): DataFrame = {
    val fwd = knn.select(col("query_id").as("lo"), col("neighbor_id").as("hi"),
      col("dist"))
    val rev = knn.select(col("query_id").as("hi"), col("neighbor_id").as("lo"))
    fwd.join(rev, Seq("lo", "hi"))
      .filter(col("lo") < col("hi"))
      .select(col("lo"), col("hi"), col("dist"))
      .orderBy(col("lo"), col("hi"))
  }

  /** Exact twin of [[knnJoin]] (labeled all-pairs — the oracle /
    * recall baseline, NOT the scale path): block nested-loop over
    * queries × corpus with the same bounded per-query heap and the
    * same rounded-to-4 euclidean contract, so q155's recall compares
    * like against like. */
  def knnJoinExact(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      excludeSelf: Boolean = false,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import VectorFunctions.{euclidean, topKPairs}
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val pairs = q.crossJoin(c)
    val kept = if (excludeSelf) pairs.filter(col("nid") =!= col("query_id")) else pairs
    kept
      .select(col("query_id"), col("nid"),
        (round(euclidean(col("qvec"), col("nvec")), 4) + lit(0.0)).as("dist"))
      .groupBy(col("query_id"))
      .agg(topKPairs(col("dist"), col("nid"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        col("p.dist").as("dist"), (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
