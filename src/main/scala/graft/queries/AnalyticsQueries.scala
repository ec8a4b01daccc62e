package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Profile, Similarity}
import Tables._

/** Driver-checked corpus-analytics queries: the embedding-space
  * statistics a training-data pipeline runs beside dedup/sampling —
  * clustering for topic bucketing and coverage audits, second-moment
  * structure for whitening.
  *
  * The family's point is that ITERATIVE float algorithms are
  * hash-oracled here, not rows-only: every accumulation is fixed-point
  * (exact integers, add-order free) and every carried float is rounded
  * once per iteration, so DuckDB can replay the unrolled loop
  * bit-for-bit. See [[graft.operators.Clustering]] for the contract.
  */
object AnalyticsQueries {

  private val K = 4
  private val Iters = 2
  private val Dim = 64 // fixture embedding dim (all sf dirs share the generator)

  /** q135: distributed Lloyd's k-means (k=4, 2 rounds, seeded from
    * vec_ids 0..3). One narrow-map assign + one partial-agg shuffle
    * per round; report = (cluster, n_vecs, inertia_fp, pos, centroid). */
  def kmeans(spark: SparkSession, dir: String): DataFrame =
    Clustering.kmeansReport(spread(t(spark, dir, "embeddings")), K, Iters)
      .orderBy(col("cluster"), col("pos"))

  /** q136: full embedding covariance matrix (upper triangle, d(d+1)/2
    * rows) from ONE corpus pass — the PCA / whitening / anisotropy
    * input. The co_moment aggregate carries a fixed ~17 KB buffer per
    * partition (map-side combined), so the plan never explodes the
    * n·d²/2 (i, j, xᵢxⱼ) tuples a SQL formulation would shuffle; the
    * pair unpack afterwards joins the ONE result row against a
    * broadcast-literal (i, j, off) frame. cov(i,j) derives from exact
    * integer sums, so the matrix hash-matches DuckDB bit-for-bit. */
  def embedCovariance(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val ss = spark
    import ss.implicits._
    val d = Dim
    val m = spread(t(spark, dir, "embeddings"))
      .agg(VectorFunctions.coMoment(col("embedding"), d).as("m"))
    val pairs = (for (i <- 1 to d; j <- i to d) yield (i, j)).zipWithIndex
      .map { case ((i, j), off) => (i, j, off) }.toDF("i", "j", "off")
    def over(c: Column): Column = // x -> x / (10⁶ n), the de-quantization
      c.cast("double") / (lit(1e6) * element_at(col("m"), 1).cast("double"))
    m.crossJoin(broadcast(pairs))
      .select(col("i"), col("j"),
        (round(over(element_at(col("m"), col("off") + lit(d + 2)))
          - over(element_at(col("m"), col("i") + 1))
            * over(element_at(col("m"), col("j") + 1)), 6) + lit(0.0)).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  /** Scratch dir for the q141 oracle's model dump (the q114 idiom:
    * under target/, absolute, once per sf-dir per JVM). */
  private def pcaScratch(sfTag: String): String =
    new java.io.File(s"target/oracle-scratch/$sfTag/q141").getAbsolutePath

  /** q141: PCA whitening report — fit (ONE co_moment pass + driver
    * Jacobi on the d×d covariance), whiten-transform (narrow map), and
    * report per retained component its eigenvalue and the post-whiten
    * variance (≈ 1.0 by construction — the self-check a pipeline runs
    * after fitting). Eigendecomposition itself is not SQL-expressible,
    * but the REPORT is a pure function of the fitted model — so the
    * query dumps (mean, components, scales) and DuckDB independently
    * re-projects every embedding and re-derives the variances from the
    * dump (the q114 pattern; the fit's math is gated by
    * PcaSpec/PcaProps, and its input covariance is q136's hash oracle).
    * Per-row projections quantize to 1e-6 fixed point BEFORE the
    * moment sums (decimal-exact, add-order free), which is what makes
    * the variance hash-reproducible across engines. */
  def pcaWhiten(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pca
    val e = spread(t(spark, dir, "embeddings"))
    // fit-once artifact (the Pca.save/load + Scratch idiom): the fit
    // is one co_moment pass — cheap, but a model is a MODEL, and every
    // other fitted artifact in the repo loads instead of refitting;
    // the content key means a rewritten fixture refits
    val modelStore = Scratch.dir(spark, dir, "pca-model", "embeddings")
    Scratch.writeOnce(modelStore) {
      if (!graft.index.ArtifactStore.current.exists(s"$modelStore/pca.json"))
        Pca.save(Pca.fit(e, Dim, k = 8), modelStore)
    }
    val model = Pca.load(modelStore)
    val sfTag = new java.io.File(dir).getName
    // blocking write-once (Scratch discipline); the path stays sf-tag
    // keyed because the q141 oracle SQL embeds it statically, and a
    // fresh JVM always rewrites the dump, so it cannot go stale
    Scratch.writeOnce(s"q141#$sfTag") {
      val ssd = spark
      import ssd.implicits._
      model.components.toSeq.zipWithIndex.map { case (w, i) =>
        (i,
          BigDecimal(model.eigenvalues(i)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          math.sqrt(model.eigenvalues(i) + 1e-9),
          w.toSeq, model.mean.toSeq)
      }.toDF("comp", "eigenvalue", "scale", "w", "mean")
        .coalesce(1).write.mode("overwrite").parquet(s"${pcaScratch(sfTag)}/model")
    }
    val stats = Pca.transform(e, model)
      .select(posexplode(col("proj")).as(Seq("comp", "p")))
      .withColumn("pfp", floor(col("p") * 1e6 + lit(0.5)).cast("decimal(19,0)"))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n"), sum(col("pfp")).as("s1"),
        sum(col("pfp") * col("pfp")).as("s2"))
      .select(col("comp").cast("int").as("comp"),
        (round((col("s2").cast("double") / lit(1e12)) / col("n") -
          (col("s1").cast("double") / lit(1e6) / col("n")) *
          (col("s1").cast("double") / lit(1e6) / col("n")), 4) + lit(0.0))
          .as("whitened_var"))
    val ss = spark
    import ss.implicits._
    val evs = model.eigenvalues.zipWithIndex
      .map { case (v, i) => (i, BigDecimal(v).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) }.toSeq.toDF("comp", "eigenvalue")
    stats.join(evs, "comp").select(col("comp"), col("eigenvalue"), col("whitened_var"))
      .orderBy(col("comp"))
  }

  /** q142: cluster mix per language — the frozen k-means model's
    * assignment (the ROUND-1-updated centroids, i.e. exactly the
    * oracle's `a2` assignment) joined onto document metadata: which
    * languages land in which semantic bucket (the mix a curriculum /
    * mixture-weight decision reads). Assignment is the narrow
    * [[graft.operators.Clustering.assignExpr]] map; the metadata join
    * is a plain keyed equi-join (AQE broadcasts the smaller side);
    * one partial-agg groupBy ends the plan. */
  /** One frozen mix model per sf-dir per JVM — the model is a
    * fit-time artifact (fixtures are immutable; production persists it
    * via KmeansArtifact), so bench repeats measure the assignment +
    * join, not a refit. Plain doubles — no session binding to go
    * stale. */
  /** End-of-sweep cache teardown (the DocQueries.dropCaches twin):
    * the fitted k-means / IVF-cell models are plain driver arrays, so
    * dropping is just clearing the registries. */
  def dropCaches(): Unit = {
    mixModelCache.clear()
    knnCellCache.clear()
  }

  private val mixModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.operators.KmeansModel]()

  def clusterMix(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Clustering
    val e = spread(t(spark, dir, "embeddings"))
    val model = mixModelCache.computeIfAbsent(dir, _ =>
      Clustering.modelFromReport(Clustering.kmeansReport(e, K, iters = 1), K))
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("lang"))
    e.select(col("vec_id"),
        Clustering.assignExpr(col("embedding"), model.centroids).as("cluster"))
      .join(docs, col("doc_id") === col("vec_id"))
      .groupBy(col("lang"), col("cluster"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("cluster"))
  }

  /** q152: table profile of `documents` — the per-column audit
    * (nulls, completeness, exact distinct, min/max, mean / mean
    * length) a pipeline runs on every corpus drop. ONE scan: every
    * measure lands in a single agg (the count-distincts share one
    * Expand); the long reshape explodes the 1-row result driver-side.
    * See [[graft.operators.Profile]] for the 100 TB sketch variant. */
  def profileDocs(spark: SparkSession, dir: String): DataFrame =
    Profile.profileTable(spread(t(spark, dir, "documents")),
      Seq("doc_id", "text", "lang", "source", "n_chars"))

  private val OutlierK = 20

  /** q153: embedding outlier audit under the FROZEN cluster model
    * (q142's cached fit) — the top-20 vectors by fixed-point distance
    * to their nearest centroid, each beside its cluster's mean
    * distance (how far outside its own bucket the outlier sits). The
    * off-distribution screen a curation pass runs before training:
    * assignment + distance are one narrow map, the per-cluster means
    * are a k-row partial agg broadcast back, and the top-20 is a
    * TakeOrdered (rnk windows only the 20 survivors — q137's idiom).
    * All-integer fixed point end to end: hash-oracled, not gated. */
  def embedOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = spread(t(spark, dir, "embeddings"))
    val model = mixModelCache.computeIfAbsent(dir, _ =>
      Clustering.modelFromReport(Clustering.kmeansReport(e, K, iters = 1), K))
    val assigned = e.select(col("vec_id"),
      Clustering.assignExpr(col("embedding"), model.centroids).as("cluster"),
      Clustering.minDistExpr(col("embedding"), model.centroids).as("dist_fp"))
    val stats = assigned.groupBy(col("cluster"))
      .agg(expr("sum(dist_fp) div count(1)").as("cluster_mean_fp"))
    assigned.join(broadcast(stats), Seq("cluster"))
      .orderBy(col("dist_fp").desc, col("vec_id")).limit(OutlierK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("dist_fp").desc, col("vec_id"))))
      .select(col("vec_id"), col("cluster"), col("dist_fp"),
        col("cluster_mean_fp"), col("rnk"))
      .orderBy(col("rnk"))
  }

  private val KnnK = 3

  /** q154: exact kNN self-join over the embeddings — every vector's 3
    * nearest OTHER vectors (the all-pairs oracle twin; q155 is the
    * IVF-joined scale path). */
  def knnJoinExactQ(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.knnJoinExact(spread(e), e, KnnK, excludeSelf = true)
  }

  /** q155: the DISTRIBUTED kNN join (IVF cell co-partitioned — see
    * [[graft.operators.Similarity.knnJoin]]) self-scored against the
    * exact twin: one row, (n_queries, avg_recall_at_3,
    * worst_hits_frac). The recall compare is itself distributed (a
    * left-semi join + per-query partial agg), never a driver collect
    * — at 100 TB the truth side would be a held-out sample, same
    * plan. */
  /** One frozen cell model per sf-dir per JVM (the mixModelCache
    * idiom) — production persists it via IvfModel.save; repeats here
    * measure the join, not a refit. */
  private val knnCellCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.index.IvfModel]()

  def knnJoinRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val model = knnCellCache.computeIfAbsent(dir, _ =>
      Similarity.ivfFitModel(
        e.select(col("vec_id").as("id"), col("embedding").as("vec")), k = 16))
    val got = Similarity.knnJoin(spread(e), spread(e), KnnK,
        cells = 16, nprobe = 8, excludeSelf = true, fitted = Some(model))
      .select(col("query_id"), col("neighbor_id"))
    val truth = Similarity.knnJoinExact(spread(e), e, KnnK, excludeSelf = true)
      .select(col("query_id"), col("neighbor_id"))
    val perQ = truth.join(got, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    truth.select(col("query_id")).distinct()
      .join(perQ, Seq("query_id"), "left")
      .select(coalesce(col("hits"), lit(0L)).as("hits"))
      .agg(count(lit(1)).as("n_queries"),
        (round(sum(col("hits")).cast("double") /
          (count(lit(1)) * KnnK), 4) + lit(0.0)).as("avg_recall_at_3"),
        (round(min(col("hits")).cast("double") / KnnK, 4) + lit(0.0))
          .as("worst_hits_frac"))
  }

  private val ProfCols = Seq("doc_id" -> "num", "text" -> "str",
    "lang" -> "str", "source" -> "str", "n_chars" -> "num")

  /** q162: profile DRIFT between two corpus drops (stood in by the
    * even/odd doc_id halves — deterministic and sf-stable): the q152
    * profiler run on each slice and joined per column, with the delta
    * of the headline central measure (numeric mean, or mean length
    * for strings). The drop-over-drop monitoring check a pipeline
    * alerts on before training on a new crawl. Two pushdown-filtered
    * scans (one per slice — a slice filter inside one scan would
    * Expand both profiles over every row anyway), then a 5-row
    * join. */
  def profileDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val cols = ProfCols.map(_._1)
    def side(f: Column, tag: String) =
      Profile.profileTable(spread(d.filter(f)), cols)
        .select(col("column"), col("n_rows").as(s"n_rows_$tag"),
          col("n_distinct").as(s"n_distinct_$tag"),
          coalesce(col("mean_v"), col("avg_len")).as(s"center_$tag"))
    side(col("doc_id") % 2 === 0, "a")
      .join(side(col("doc_id") % 2 === 1, "b"), Seq("column"))
      .withColumn("center_delta",
        round(col("center_b") - col("center_a"), 6) + lit(0.0))
      .orderBy(col("column"))
  }

  /** q161: reciprocal nearest-neighbor pairs over the q154 kNN join —
    * the high-precision semantic-dup shortlist (mutuality cuts hub
    * false-positives). Production feeds the IVF knnJoin (q155's tier)
    * through the same one-self-equi-join shape. */
  def mutualKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.mutualKnnPairs(
      Similarity.knnJoinExact(spread(e), e, KnnK, excludeSelf = true))
  }

  /** q165: sample-coverage audit — how well a curated sample COVERS
    * the embedding space: for every non-sample vector, the fixed-point
    * distance to its nearest sample member; report the mean and the
    * max (the k-center coverage radius — a big max means a region of
    * the corpus the sample never represents, the blind spot a "train
    * on a 4% sample" decision needs to know about). Sample = the q53
    * deterministic id-hash family (mod 25 here) — bounded by design,
    * so it broadcasts as literal centroids and the plan is one narrow
    * map + one 1-row partial agg over the corpus. All-integer. */
  def sampleCoverage(spark: SparkSession, dir: String): DataFrame = {
    val sample: Array[Array[Double]] = t(spark, dir, "embeddings")
      .filter(col("vec_id") % 25 === 0).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val md = Clustering.minDistExpr(col("embedding"), sample)
    spread(t(spark, dir, "embeddings"))
      .filter(col("vec_id") % 25 =!= 0)
      .agg(count(lit(1)).as("n_corpus"), sum(md).as("s"), max(md).as("mx"))
      .select(lit(sample.length.toLong).as("n_sample"), col("n_corpus"),
        expr("s div n_corpus").as("mean_min_dist_fp"),
        col("mx").as("max_min_dist_fp"))
  }

  /** q172: embedding-space drift between two corpus drops (even/odd
    * vec_id halves — the q162 convention) — per-dimension mean shift
    * from exact fixed-point component sums (the q136 quantization), so
    * the report is add-order free and engine-replayable. The
    * "did my embedding distribution move between drops" monitor a
    * retrieval deployment reads before trusting yesterday's IVF/PQ
    * fit on today's corpus. One posexplode + partial agg per slice
    * (map-side combined; shuffle carries 64 rows per slice). */
  def embedDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = spread(t(spark, dir, "embeddings"))
    def side(f: Column, tag: String) = e.filter(f)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as(s"n_$tag"),
        sum(floor(col("x").cast("double") * 1e6 + lit(0.5)).cast("long"))
          .as(s"s_$tag"))
      .select(col("pos"),
        (round(col(s"s_$tag").cast("double") / 1e6 / col(s"n_$tag"), 6) + lit(0.0))
          .as(s"mean_$tag"))
    side(col("vec_id") % 2 === 0, "a")
      .join(side(col("vec_id") % 2 === 1, "b"), Seq("pos"))
      .select((col("pos") + 1).cast("int").as("pos"), col("mean_a"), col("mean_b"),
        (round(col("mean_b") - col("mean_a"), 6) + lit(0.0)).as("mean_delta"))
      .orderBy(col("pos"))
  }

  // ----------------------------------------------------------- oracles

  /** Fixed-point squared-L2 — mirrors Clustering.distFp term-for-term
    * (cast to double, subtract, square, ×10⁸, round, long, sum). */
  private def distSql(x: String, c: String): String =
    s"list_sum(list_transform(range(1, len($x)+1), i -> " +
      s"CAST(ROUND((CAST($x[i] AS DOUBLE) - $c[i]) * (CAST($x[i] AS DOUBLE) - $c[i]) * 100000000.0) AS BIGINT)))"

  /** Per-(cluster, dim) fixed-point component sums over an assignment
    * CTE `a(vec_id, cl)` — the Clustering.update shape. */
  private def sumsSql(a: String): String =
    s"""SELECT $a.cl, t.i, count(*) AS n,
       |   CAST(SUM(CAST(ROUND(CAST(e.x[t.i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS fp
       | FROM $a JOIN e USING (vec_id) CROSS JOIN range(1, ${Dim + 1}) AS t(i)
       | GROUP BY 1, 2""".stripMargin

  /** Shared unrolled-Lloyd CTE chain ending in `a2(vec_id, cl, d)` —
    * the final assignment both q135 (report) and q142 (lang mix)
    * derive from. */
  private def kmeansCtes: String =
    s"""e AS (SELECT vec_id, embedding AS x FROM embeddings),
       |c0 AS (SELECT CAST(vec_id AS INT) AS cl,
       |              list_transform(x, v -> CAST(v AS DOUBLE)) AS c
       |       FROM e WHERE vec_id < $K),
       |d1 AS (SELECT e.vec_id, c0.cl, ${distSql("e.x", "c0.c")} AS d
       |       FROM e CROSS JOIN c0),
       |a1 AS (SELECT vec_id, cl FROM
       |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM d1)
       |       WHERE rn = 1),
       |s1 AS (${sumsSql("a1")}),
       |c1 AS (SELECT cl, list(ROUND(fp / (n * 1000000.0), 6) ORDER BY i) AS c FROM s1 GROUP BY cl),
       |d2 AS (SELECT e.vec_id, c1.cl, ${distSql("e.x", "c1.c")} AS d
       |       FROM e CROSS JOIN c1),
       |a2 AS (SELECT vec_id, cl, d FROM
       |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM d2)
       |       WHERE rn = 1)""".stripMargin

  /** One profile row per column, mirroring Profile.profileTable's
    * measure set: exact BIGINT counts, CAST-to-VARCHAR min/max, and
    * last-step rounded divisions over exact DECIMAL/BIGINT sums. */
  private def profileRowSql(c: String, kind: String): String =
    profileRowSql(c, kind, "1=1")

  private def profileRowSql(c: String, kind: String, where: String): String = {
    val meanV =
      if (kind == "num")
        s"ROUND(CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE) / count($c), 6) + 0.0"
      else "CAST(NULL AS DOUBLE)"
    val avgLen =
      if (kind == "str")
        s"ROUND(CAST(SUM(CAST(length($c) AS BIGINT)) AS DOUBLE) / count($c), 6) + 0.0"
      else "CAST(NULL AS DOUBLE)"
    s"""SELECT '$c' AS "column", count(*) AS n_rows,
       |  count(*) - count($c) AS n_null,
       |  count(DISTINCT $c) AS n_distinct,
       |  ROUND(CAST(count($c) AS DOUBLE) / count(*), 6) + 0.0 AS completeness,
       |  CAST(min($c) AS VARCHAR) AS min_v, CAST(max($c) AS VARCHAR) AS max_v,
       |  $meanV AS mean_v, $avgLen AS avg_len
       |FROM documents WHERE $where""".stripMargin
  }

  /** Rounded euclidean over the 64-dim float arrays — mirrors
    * VectorFunctions.euclidean (cast each float to double, subtract,
    * square, in-order sum, sqrt) then the round-to-4 ranking idiom. */
  private def eucSql(a: String, b: String): String =
    s"ROUND(SQRT(list_sum(list_transform(range(1, ${Dim + 1}), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))), 4) + 0.0"

  val oracles: Map[String, String] = Map(
    "q152_profile" ->
      ProfCols.map { case (c, k) => profileRowSql(c, k) }
        .mkString("WITH p AS (\n", "\nUNION ALL\n", "\n)\nSELECT * FROM p ORDER BY \"column\""),
    // q162: the q152 profile replayed per even/odd slice, joined per
    // column; the delta subtracts two already-rounded doubles.
    "q162_profile_drift" -> {
      def slice(where: String) =
        ProfCols.map { case (c, k) => profileRowSql(c, k, where) }
          .mkString("(\n", "\nUNION ALL\n", "\n)")
      s"""WITH pa AS ${slice("doc_id % 2 = 0")},
         |pb AS ${slice("doc_id % 2 = 1")}
         |SELECT pa."column", pa.n_rows AS n_rows_a, pa.n_distinct AS n_distinct_a,
         |       COALESCE(pa.mean_v, pa.avg_len) AS center_a,
         |       pb.n_rows AS n_rows_b, pb.n_distinct AS n_distinct_b,
         |       COALESCE(pb.mean_v, pb.avg_len) AS center_b,
         |       ROUND(COALESCE(pb.mean_v, pb.avg_len)
         |           - COALESCE(pa.mean_v, pa.avg_len), 6) + 0.0 AS center_delta
         |FROM pa JOIN pb ON pa."column" = pb."column"
         |ORDER BY pa."column"""".stripMargin
    },
    // q153: the frozen model is the kmeansCtes' a2 assignment (iters=1
    // model == round-1 centroids) — top-20 by selected distance DESC
    // beside the per-cluster integer mean distance.
    "q153_embed_outliers" ->
      s"""WITH $kmeansCtes,
         |m AS (SELECT cl, CAST(SUM(d) AS BIGINT) // count(*) AS cluster_mean_fp
         |      FROM a2 GROUP BY cl),
         |r AS (SELECT a2.vec_id, a2.cl, CAST(a2.d AS BIGINT) AS dist_fp, m.cluster_mean_fp,
         |        ROW_NUMBER() OVER (ORDER BY a2.d DESC, a2.vec_id) AS rnk
         |      FROM a2 JOIN m USING (cl))
         |SELECT vec_id, cl AS cluster, dist_fp, cluster_mean_fp, CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= $OutlierK ORDER BY rnk""".stripMargin,
    // q172: per-dim fixed-point mean per even/odd slice, joined on the
    // dimension; the delta subtracts already-rounded doubles.
    "q172_embed_drift" -> {
      def slice(where: String, tag: String) =
        s"""SELECT t.i AS pos,
           |  ROUND(CAST(SUM(CAST(FLOOR(CAST(embedding[t.i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
           |        / 1000000.0 / count(*), 6) + 0.0 AS mean_$tag
           |FROM embeddings CROSS JOIN range(1, ${Dim + 1}) AS t(i)
           |WHERE $where GROUP BY 1""".stripMargin
      s"""WITH a AS (${slice("vec_id % 2 = 0", "a")}),
         |b AS (${slice("vec_id % 2 = 1", "b")})
         |SELECT CAST(a.pos AS INT) AS pos, a.mean_a, b.mean_b,
         |       ROUND(b.mean_b - a.mean_a, 6) + 0.0 AS mean_delta
         |FROM a JOIN b ON a.pos = b.pos ORDER BY pos""".stripMargin
    },
    // q165: min fixed-point distance per non-sample vector against the
    // bounded cross-joined sample; integer mean (floor div) and max.
    "q165_sample_coverage" ->
      s"""WITH s AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS c
         |           FROM embeddings WHERE vec_id % 25 = 0),
         |e AS (SELECT vec_id, embedding AS x FROM embeddings WHERE vec_id % 25 <> 0),
         |d AS (SELECT e.vec_id, min(${distSql("e.x", "s.c")}) AS md
         |      FROM e CROSS JOIN s GROUP BY 1)
         |SELECT (SELECT count(*) FROM s) AS n_sample, count(*) AS n_corpus,
         |       CAST(SUM(md) AS BIGINT) // count(*) AS mean_min_dist_fp,
         |       CAST(max(md) AS BIGINT) AS max_min_dist_fp
         |FROM d""".stripMargin,
    // q161: the q154 kNN CTE self-joined on the reversed key; lo < hi
    // canonicalizes each mutual pair to one row.
    "q161_mutual_knn" ->
      s"""WITH e AS (SELECT vec_id, embedding AS x FROM embeddings),
         |d AS (SELECT a.vec_id AS query_id, b.vec_id AS nid,
         |        ${eucSql("a.x", "b.x")} AS dist
         |      FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER
         |        (PARTITION BY query_id ORDER BY dist, nid) AS rnk FROM d),
         |k AS (SELECT query_id, nid, dist FROM r WHERE rnk <= $KnnK)
         |SELECT a.query_id AS lo, a.nid AS hi, a.dist
         |FROM k a JOIN k b ON b.query_id = a.nid AND b.nid = a.query_id
         |WHERE a.query_id < a.nid
         |ORDER BY lo, hi""".stripMargin,
    "q154_knn_join_exact" ->
      s"""WITH e AS (SELECT vec_id, embedding AS x FROM embeddings),
         |d AS (SELECT a.vec_id AS query_id, b.vec_id AS nid,
         |        ${eucSql("a.x", "b.x")} AS dist
         |      FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER
         |        (PARTITION BY query_id ORDER BY dist, nid) AS rnk FROM d)
         |SELECT query_id, nid AS neighbor_id, dist, CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= $KnnK ORDER BY query_id, rnk""".stripMargin,
    // q141: re-project every embedding from the dumped fitted model
    // (mean, components, whiten scales), quantize per-row projections
    // to 1e-6 fixed point, re-derive the whitened variances from
    // exact integer moment sums. The correctness run is always
    // sf0.01, so the oracle reads that tag's dump (written by the
    // query itself earlier in the same Verify run).
    "q141_pca_whiten" -> {
      val b = pcaScratch("sf0.01")
      s"""WITH m AS (SELECT comp, eigenvalue, scale, w, mean
         |           FROM read_parquet('$b/model/*.parquet')),
         |p AS (SELECT m.comp, CAST(floor(
         |        list_sum(list_transform(range(1, ${Dim + 1}), i ->
         |          (CAST(e.embedding[i] AS DOUBLE) - m.mean[i]) * m.w[i]))
         |        / m.scale * 1e6 + 0.5) AS HUGEINT) AS pfp
         |      FROM embeddings e CROSS JOIN m),
         |agg AS (SELECT comp, count(*) AS n, sum(pfp) AS s1, sum(pfp * pfp) AS s2
         |        FROM p GROUP BY comp)
         |SELECT a.comp, m.eigenvalue,
         |       ROUND((CAST(a.s2 AS DOUBLE) / 1e12) / a.n -
         |             (CAST(a.s1 AS DOUBLE) / 1e6 / a.n) *
         |             (CAST(a.s1 AS DOUBLE) / 1e6 / a.n), 4) + 0.0 AS whitened_var
         |FROM agg a JOIN m ON m.comp = a.comp ORDER BY a.comp""".stripMargin
    },
    "q135_kmeans" ->
      s"""WITH $kmeansCtes,
         |i2 AS (SELECT cl, count(*) AS n, CAST(SUM(d) AS BIGINT) AS inertia_fp FROM a2 GROUP BY cl),
         |s2 AS (${sumsSql("a2")})
         |SELECT s2.cl AS cluster, i2.n AS n_vecs, i2.inertia_fp,
         |       CAST(s2.i AS INT) AS pos, ROUND(s2.fp / (i2.n * 1000000.0), 6) AS centroid
         |FROM s2 JOIN i2 USING (cl)
         |ORDER BY cluster, pos""".stripMargin,
    // q142: the frozen model's assignment joined onto document
    // metadata — which languages land in which semantic bucket.
    "q142_cluster_mix" ->
      s"""WITH $kmeansCtes
         |SELECT d.lang, a2.cl AS cluster, count(*) AS n_docs
         |FROM a2 JOIN documents d ON d.doc_id = a2.vec_id
         |GROUP BY 1, 2 ORDER BY lang, cluster""".stripMargin,
    // The oracle HAS to explode n·d²/2 tuples (SQL has no mergeable
    // buffer aggregate) — that contrast is the point of co_moment; at
    // oracle scale (500–2000 vectors) the explode is harmless. FLOOR
    // (+0.5) quantization mirrors the kernel's pinned rounding rule.
    "q136_embed_cov" ->
      s"""WITH ex AS (SELECT list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x FROM embeddings),
         |st AS (SELECT count(*) AS n FROM ex),
         |s AS (SELECT t.i AS i,
         |        CAST(SUM(CAST(FLOOR(x[t.i] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS si
         |      FROM ex CROSS JOIN range(1, ${Dim + 1}) AS t(i) GROUP BY 1),
         |p AS (SELECT t1.i AS i, t2.j AS j,
         |        CAST(SUM(CAST(FLOOR(x[t1.i] * x[t2.j] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS pij
         |      FROM ex CROSS JOIN range(1, ${Dim + 1}) AS t1(i) CROSS JOIN range(1, ${Dim + 1}) AS t2(j)
         |      WHERE t2.j >= t1.i GROUP BY 1, 2)
         |SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
         |       ROUND(p.pij / (1000000.0 * st.n)
         |           - (si.si / (1000000.0 * st.n)) * (sj.si / (1000000.0 * st.n)), 6) + 0.0 AS cov
         |FROM p JOIN s si ON si.i = p.i JOIN s sj ON sj.i = p.j CROSS JOIN st
         |ORDER BY i, j""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_kmeans" -> (kmeans _),
    "q136_embed_cov" -> (embedCovariance _),
    "q141_pca_whiten" -> (pcaWhiten _),
    "q142_cluster_mix" -> (clusterMix _),
    "q152_profile" -> (profileDocs _),
    "q153_embed_outliers" -> (embedOutliers _),
    "q154_knn_join_exact" -> (knnJoinExactQ _),
    "q155_knn_join_recall" -> (knnJoinRecall _),
    "q161_mutual_knn" -> (mutualKnn _),
    "q162_profile_drift" -> (profileDrift _),
    "q165_sample_coverage" -> (sampleCoverage _),
    "q172_embed_drift" -> (embedDrift _)
  )
}
