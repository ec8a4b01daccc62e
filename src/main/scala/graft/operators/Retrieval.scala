package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse (keyword) retrieval and rank fusion — the text half of a
  * hybrid RAG retrieval stack (the dense half is the vector-index
  * surface in `graft.index` / `graft.queries.VectorQueries`).
  *
  * BM25 here is Okapi BM25 with the Lucene idf variant
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` (Robertson & Zaragoza 2009,
  * "The Probabilistic Relevance Framework"), which is non-negative for
  * every df — so a term present in most documents dampens toward zero
  * instead of flipping the ranking sign.
  *
  * Determinism contract (the repo-wide fixed-point idiom): each
  * per-(query, doc, term) contribution is quantized to a BIGINT at
  * 1e6 BEFORE the per-document sum, so the sum is an integer sum —
  * order-independent under any partitioning/shuffle schedule and
  * bit-reproducible in DuckDB. Every double step before the quantize
  * is a fixed left-to-right expression both engines evaluate with
  * identical IEEE semantics.
  *
  * Scale shape (the part that must survive 100 TB):
  *   - Doc length is `size(tokens)` attached per ROW before the
  *     explode and carried through the `tf` grouping (it is
  *     functionally dependent on the doc id, so it rides the group
  *     key for free) — there is NO dl aggregate and NO tf⋈dl join on
  *     doc_id. The only corpus-sized shuffle is the one per-(doc,
  *     term) partial-agg count (the classic term-stats shuffle, same
  *     as q58 TF-IDF).
  *   - Corpus stats (N, Σdl) come from a separate MAP-ONLY scan of
  *     the raw docs (scalar aggregate, no data-sized shuffle): two
  *     pushdown-pruned columnar scans beat materializing or
  *     re-shuffling the exploded token stream — the
  *     bloomPrunedAntiJoin trade, measured the same way.
  *   - The query set is eval-sized and BROADCAST (exploded to
  *     distinct (query_id, term) rows); `tf` is semi-joined against
  *     it first, so everything downstream touches only rows whose
  *     term appears in some query. That postings SLICE — bounded by
  *     documents-containing-a-query-term, not the corpus — is
  *     localCheckpoint'ed because it feeds both the df count and the
  *     scoring leg, and ReuseExchange does not dedupe aggregate legs
  *     whose consumers prune differently (the q115/q117 rule; without
  *     it the corpus scan+shuffle runs once per consumer). Callers
  *     that materialize the result release the blocks via
  *     [[graft.plans.Blocks.release]] (Bench releases every query).
  *   - df for query terms is Zipf-small (≤ |query vocab| rows) and
  *     broadcast back.
  *   - Final top-k uses the bounded-heap [[graft.functions.expressions.TopKPairsAgg]]
  *     (map-side partial heaps, shuffle carries O(queries × k)), not
  *     a window sort over all candidates.
  */
object Retrieval {

  val FpScale = 1000000.0

  /** BM25 per-(query, document) scores in 1e6 fixed point.
    *
    * @param docs    (idCol, textCol) corpus
    * @param queries (query_id, qtext) — eval-sized; broadcast
    * @return (query_id, idCol, score_fp BIGINT); only documents
    *         sharing ≥1 term with the query appear (score > 0 rows —
    *         BM25's sparse support, which is what makes the inverted
    *         shape scale: the dense (query × corpus) matrix never
    *         materializes)
    */
  def bm25ScoresFp(
      docs: DataFrame,
      queries: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
    val tf = base
      .select(col(idCol), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("sum_dl"))

    // Query tf is ignored (set semantics) — standard for short queries.
    val qt = queries
      .select(col("query_id"), explode(TextAnalysis.tokens(col("qtext"))).as("term"))
      .distinct()
    val tfq = tf.join(broadcast(qt.select(col("term")).distinct()), Seq("term"), "left_semi")
      .localCheckpoint(true)
    val dfx = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))

    tfq
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfx), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col(idCol), contribFp(k1, b).as("contrib_fp"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("contrib_fp")).as("score_fp"))
  }

  /** [[bm25ScoresFp]] over a PRECOMPUTED postings frame (idCol, dl,
    * term, tf) plus its scalar corpus stats — the in-memory twin of
    * [[searchIndex]] (same shared contribution expression, stats as
    * plan literals), for pipelines that tokenize once and serve many
    * retrieval analyses off one postings table. Bit-identical to the
    * scan path over the same corpus by construction.
    *
    * EAGER at plan-construction time: the query-term postings slice is
    * localCheckpoint'ed here (two consumers — the df aggregate and the
    * scoring join — must read one materialization), so calling this
    * runs a Spark job even if the returned plan is never executed, and
    * the checkpoint's block ownership transfers to the CALLER —
    * consume the result and release via [[graft.plans.Blocks.release]]
    * (explain/audit paths included), or the blocks stay pinned. */
  def bm25ScoresFpFromPostings(
      postings: DataFrame,
      nDocs: Long,
      sumDl: Long,
      queries: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id"): DataFrame = {
    val qt = queries
      .select(col("query_id"), explode(TextAnalysis.tokens(col("qtext"))).as("term"))
      .distinct()
    val tfq = postings
      .join(broadcast(qt.select(col("term")).distinct()), Seq("term"), "left_semi")
      .localCheckpoint(true)
    val dfx = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tfq
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfx), Seq("term"))
      .select(col("query_id"), col(idCol), col("tf"), col("dl"), col("df"),
        lit(nDocs).as("n_docs"), lit(sumDl).as("sum_dl"))
      .select(col("query_id"), col(idCol), contribFp(k1, b).as("contrib_fp"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("contrib_fp")).as("score_fp"))
  }

  /** BM25 top-k over a precomputed postings frame — the
    * [[bm25TopK]] twin of [[bm25ScoresFpFromPostings]]. */
  def bm25TopKFromPostings(
      postings: DataFrame,
      nDocs: Long,
      sumDl: Long,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id"): DataFrame =
    topKFromScores(
      bm25ScoresFpFromPostings(postings, nDocs, sumDl, queries, k1, b, idCol),
      idCol, k)

  /** The per-(query, doc, term) BM25 contribution in 1e6 fixed point,
    * over columns (tf, dl, df, n_docs, sum_dl) — ONE definition shared
    * by the scan path and the served-index path, so the two are
    * bit-identical by construction. */
  private def contribFp(k1: Double, b: Double): Column = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val num = col("tf") * lit(k1 + 1.0)
    val den = col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / avgdl))
    round(idf * num / den * lit(FpScale), 0).cast("long")
  }

  /** BM25 top-k per query: (query_id, idCol, score DOUBLE, rnk INT),
    * score descending, doc-id tie-break — via the bounded-heap top-k
    * aggregate on dist = -score_fp. */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    topKFromScores(bm25ScoresFp(docs, queries, k1, b, idCol, textCol), idCol, k)

  private def topKFromScores(scores: DataFrame, idCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.topKPairs
    scores
      .groupBy(col("query_id"))
      .agg(topKPairs((-col("score_fp")).cast("double"), col(idCol), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as(idCol),
        ((-col("p.dist")).cast("long") / lit(FpScale)).as("score"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  // ------------------------------------------------- persisted index

  /** Versioned stats directories: v=0 is the buildIndex layout
    * (plain `df/`, no tombstones); every delete publishes v+1 dirs
    * FIRST and swaps the sidecar pointer LAST, so a reader holding
    * the old sidecar keeps a fully consistent (df, tombstones, stats)
    * triple — the VectorIndex `meta-v=N` commit discipline applied to
    * the sparse tier. Old-version dirs stay until a rebuild. */
  private def dfDir(path: String, v: Long): String =
    if (v == 0L) s"$path/df" else s"$path/df-v=$v"
  private def tombDir(path: String, v: Long): String = s"$path/tombstones-v=$v"

  /** Build the persistent BM25 serving layout under `path` — the
    * "fit once, serve forever" artifact (the IVF/PQ/int8/BPE sidecar
    * idiom, [[graft.operators.BpeArtifact]]): recomputing corpus
    * statistics per query burns a corpus scan per query AND silently
    * re-fits when the corpus has grown — exactly what the other
    * fitted-model artifacts exist to prevent.
    *
    * Layout:
    *   - `postings/` parquet (doc_id, dl, term, tf) range-partitioned
    *     AND sorted by term, so a query-vocab `IN` filter prunes at
    *     BOTH file and row-group granularity (min/max stats) — the
    *     inverted-index access path, expressed as columnar layout
    *   - `df/` parquet (term, df) — derived from the WRITTEN postings
    *     (one compact-scan, never a second corpus pass)
    *   - `bm25.json` — scalar stats (n_docs, sum_dl, vocab_size) +
    *     FNV-1a fingerprint over them, written LAST (publish order:
    *     content first, pointer-equivalent last), verified on load
    */
  def buildIndex(
      docs: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    import graft.index.{ArtifactStore, Fingerprint}
    val spark = docs.sparkSession
    val base = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
    val tf = base
      .select(col(idCol), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
    tf.repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$path/postings")
    val post = spark.read.parquet(s"$path/postings")
    post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$path/df")
    val vocabSize = spark.read.parquet(s"$path/df").count()
    val st = base.agg(count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("sum_dl")).head()
    val (nDocs, sumDl) = (st.getLong(0), st.getLong(1))
    val fp = Fingerprint.ofString(s"$nDocs|$sumDl|$vocabSize")
    ArtifactStore.current.writeAtomic(s"$path/bm25.json",
      (s"""{"fingerprint":"$fp","n_docs":$nDocs,"sum_dl":$sumDl,""" +
        s""""vocab_size":$vocabSize}""").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Merge BM25 shard indexes into one [[buildIndex]]-shaped layout —
    * the day-build / per-shard consolidation path (the
    * `VectorIndex.merge` twin for the sparse tier). Because shards
    * hold DISJOINT document sets, every statistic merges exactly:
    * df(term) = Σ shard dfs, n_docs/sum_dl = scalar sums — no corpus
    * re-scan, no re-tokenize; the only data-sized work is re-sorting
    * the unioned postings by term so the merged layout keeps its
    * file/row-group pruning. Disjointness is VERIFIED (distinct doc
    * count over the merged postings must equal Σ n_docs — every doc
    * has ≥ 1 postings row since the tokenizer never returns an empty
    * array), not assumed: a doc in two shards would silently
    * double-count df and corrupt every idf. */
  def mergeIndexes(
      spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String],
      out: String,
      idCol: String = "doc_id"): Unit = {
    import graft.index.{ArtifactStore, Fingerprint, SidecarJson}
    require(paths.nonEmpty, "mergeIndexes needs >= 1 input shard")
    val sides = paths.map { p =>
      val s = SidecarJson.read(s"$p/bm25.json")
      val fp = Fingerprint.ofString(
        s"${s.long("n_docs")}|${s.long("sum_dl")}|${s.long("vocab_size")}")
      if (fp != s.str("fingerprint"))
        throw new IllegalArgumentException(
          s"$p/bm25.json: stats fingerprint mismatch (corrupted shard refuses to merge)")
      // a tombstoned shard's postings still hold the forgotten rows;
      // merging them would resurrect deleted docs in the merged stats
      if (s.longOpt("n_tombstones", 0L) > 0L)
        throw new IllegalArgumentException(
          s"$p has ${s.longOpt("n_tombstones", 0L)} tombstoned docs; " +
            "rebuild/compact the shard before merging")
      s
    }
    val nDocs = sides.map(_.long("n_docs")).sum
    val sumDl = sides.map(_.long("sum_dl")).sum
    val posts = paths.map(p => spark.read.parquet(s"$p/postings")).reduce(_.unionByName(_))
    val distinctDocs = posts.select(col(idCol)).distinct().count()
    if (distinctDocs != nDocs)
      throw new IllegalArgumentException(
        s"shards share documents: ${nDocs - distinctDocs} doc ids appear in more than " +
          "one input (df/idf would double-count); merge inputs must be disjoint")
    posts.repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$out/postings")
    paths.map(p => spark.read.parquet(s"$p/df")).reduce(_.unionByName(_))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$out/df")
    val vocabSize = spark.read.parquet(s"$out/df").count()
    val fp = Fingerprint.ofString(s"$nDocs|$sumDl|$vocabSize")
    ArtifactStore.current.writeAtomic(s"$out/bm25.json",
      (s"""{"fingerprint":"$fp","n_docs":$nDocs,"sum_dl":$sumDl,""" +
        s""""vocab_size":$vocabSize}""").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Right-to-be-forgotten delete against a [[buildIndex]] layout —
    * O(one postings scan + vocabulary-sized rewrites), never a corpus
    * re-tokenize. The contract is EXACT: after the delete, every
    * [[searchIndex]] answer is bit-identical to an index rebuilt from
    * the corpus WITHOUT the deleted documents (RetrievalSpec pins it),
    * because every statistic idf/length-norm reads is adjusted, not
    * just the result rows filtered:
    *
    *   - `df/` is rewritten minus each deleted doc's term memberships
    *     (df rows reaching 0 drop — the term leaves the vocabulary)
    *   - sidecar n_docs/sum_dl subtract the deleted docs' counts/
    *     lengths, vocab_size recounts, fingerprint re-signs
    *   - postings rows stay on disk (rewriting the corpus-sized
    *     layout per delete batch would be O(index)); `tombstones/`
    *     records the ids and [[searchIndex]] anti-joins them out —
    *     the VectorIndex tombstone-delta idiom. A later rebuild
    *     compacts them away.
    *
    * Idempotent: already-tombstoned ids are skipped before the stats
    * pass (re-subtracting them would corrupt idf for good). Unknown
    * ids are no-ops. Returns the number of documents actually
    * forgotten.
    *
    * Reader isolation: each delete publishes NEW `df-v=N` /
    * `tombstones-v=N` directories first and swaps the sidecar pointer
    * last (the VectorIndex `meta-v=N` commit discipline), so a reader
    * that loaded the old sidecar keeps a fully consistent (df,
    * tombstones, stats) triple — deletes never mutate a directory a
    * reader can hold. Old-version dirs stay until a rebuild (the
    * vacuum analog). RetrievalSpec asserts the pre-delete df content
    * survives a delete byte-for-byte. */
  def deleteFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ids: Seq[Long],
      idCol: String = "doc_id"): Long = {
    import graft.index.{ArtifactStore, Fingerprint, SidecarJson}
    val side = SidecarJson.read(s"$path/bm25.json")
    val (nDocs, sumDl) = (side.long("n_docs"), side.long("sum_dl"))
    val oldV = side.longOpt("df_v", 0L)
    val prior: Set[Long] =
      if (side.longOpt("n_tombstones", 0L) > 0L)
        spark.read.parquet(tombDir(path, oldV))
          .collect().map(_.getLong(0)).toSet
      else Set.empty
    val newIds = ids.distinct.filterNot(prior)
    if (newIds.isEmpty) return 0L
    val ss = spark
    import ss.implicits._
    val victims = broadcast(newIds.toDF(idCol))
    val hit = spark.read.parquet(s"$path/postings")
      .join(victims, Seq(idCol)).localCheckpoint(true)
    val st = hit.select(col(idCol), col("dl")).distinct()
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s")).head()
    val (nDeleted, dlDeleted) = (st.getLong(0), st.getLong(1))
    val ddf = hit.select(col("term"), col(idCol)).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("ddf"))
    val newV = oldV + 1L
    val newDf = spark.read.parquet(dfDir(path, oldV))
      .join(ddf, Seq("term"), "left")
      .select(col("term"), (col("df") - coalesce(col("ddf"), lit(0L))).as("df"))
      .filter(col("df") > 0L)
    newDf.repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(dfDir(path, newV))
    graft.plans.Blocks.release(hit) // ddf (from hit) consumed by the write above
    val vocabSize = spark.read.parquet(dfDir(path, newV)).count()
    val allTombs = (prior ++ newIds).toSeq.sorted
    allTombs.toDF(idCol).coalesce(1)
      .write.mode("overwrite").parquet(tombDir(path, newV))
    // content (df-v, tombstones-v) is durable; the sidecar swap below
    // is the commit point — a reader on the old sidecar never sees it
    val (n2, s2) = (nDocs - nDeleted, sumDl - dlDeleted)
    val fp = Fingerprint.ofString(s"$n2|$s2|$vocabSize")
    ArtifactStore.current.writeAtomic(s"$path/bm25.json",
      (s"""{"fingerprint":"$fp","n_docs":$n2,"sum_dl":$s2,""" +
        s""""vocab_size":$vocabSize,"n_tombstones":${allTombs.length},"df_v":$newV}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    nDeleted
  }

  /** Serve BM25 top-k from a [[buildIndex]] layout — bit-identical to
    * [[bm25TopK]] over the same corpus (one shared contribution
    * expression), without touching the corpus: the query vocabulary
    * (an eval-sized driver list — that boundedness is what buys the
    * pushdown) filters the postings/df scans as an `IN` predicate the
    * parquet reader prunes with; scalar stats come from the verified
    * sidecar as plan literals. */
  def searchIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id"): DataFrame = {
    import graft.index.{Fingerprint, SidecarJson}
    val side = SidecarJson.read(s"$path/bm25.json")
    val (nDocs, sumDl, vocabSize) =
      (side.long("n_docs"), side.long("sum_dl"), side.long("vocab_size"))
    val fp = Fingerprint.ofString(s"$nDocs|$sumDl|$vocabSize")
    if (fp != side.str("fingerprint"))
      throw new IllegalArgumentException(
        s"$path/bm25.json: stats fingerprint $fp != ${side.str("fingerprint")} " +
          "(corrupted or tampered sidecar)")
    val qt = queries
      .select(col("query_id"), explode(TextAnalysis.tokens(col("qtext"))).as("term"))
      .distinct()
    val vocab = qt.select(col("term")).distinct().collect().map(_.getString(0)).toSeq
    val dfV = side.longOpt("df_v", 0L)
    val post0 = spark.read.parquet(s"$path/postings").filter(col("term").isin(vocab: _*))
    // deleteFromIndex leaves postings rows in place and records the
    // forgotten ids under the sidecar's df_v; the anti-join
    // (broadcast, over the eval-bounded postings slice) completes the
    // exact rebuilt-without semantics.
    val post =
      if (side.longOpt("n_tombstones", 0L) > 0L)
        post0.join(broadcast(spark.read.parquet(tombDir(path, dfV))),
          Seq(idCol), "left_anti")
      else post0
    val dfx = spark.read.parquet(dfDir(path, dfV)).filter(col("term").isin(vocab: _*))
    val scores = post
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfx), Seq("term"))
      .select(col("query_id"), col(idCol), col("tf"), col("dl"), col("df"),
        lit(nDocs).as("n_docs"), lit(sumDl).as("sum_dl"))
      .select(col("query_id"), col(idCol), contribFp(k1, b).as("contrib_fp"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("contrib_fp")).as("score_fp"))
    topKFromScores(scores, idCol, k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    * ranked legs: score(d) = Σ_legs 1/(kRrf + rank_leg(d)), summed
    * left-to-right in `legs` order (fixed fold order — two-to-few
    * doubles added in a written sequence, so the result is engine-
    * reproducible without quantization). A document missing from a
    * leg contributes 0 from it.
    *
    * Each leg: (query_id, idCol, rnk). Output: (query_id, idCol,
    * rrf DOUBLE rounded to 6, rnk INT) — top `k` per query, ranked on
    * the ROUNDED score (both engines order the same column; repo
    * determinism rule), doc-id tie-break.
    *
    * Scale shape: legs are already top-n-per-query (O(queries × n)
    * rows — eval-sized), so the outer joins and the per-query window
    * here run on bounded frames no matter the corpus size; all the
    * heavy lifting happened inside the legs' bounded-heap top-k. */
  def rrfFuse(
      legs: Seq[DataFrame],
      k: Int,
      kRrf: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs >= 1 ranked leg")
    import org.apache.spark.sql.expressions.Window
    val keyed = legs.zipWithIndex.map { case (l, i) =>
      l.select(col("query_id"), col(idCol), col("rnk").as(s"rnk_$i"))
    }
    val joined = keyed.reduce((a, b) => a.join(b, Seq("query_id", idCol), "full_outer"))
    val rrf = legs.indices
      .map(i => coalesce(lit(1.0) / (lit(kRrf) + col(s"rnk_$i")), lit(0.0)))
      .reduce(_ + _)
    joined
      .select(col("query_id"), col(idCol), (round(rrf, 6) + lit(0.0)).as("rrf"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col(idCol))))
      .filter(col("rnk") <= k)
  }

  /** Ranked-retrieval quality evaluation: recall@k and fixed-point MRR
    * of one or more ranked legs against a gold relevance set — the
    * eval table a retrieval deployment reads before choosing its
    * serving leg (and the relational twin of the ANN RECALL gates).
    * Per leg: n_queries, hits@k for each cutoff, and `mrr_fp_sum` =
    * Σ_queries (10^6 DIV gold_rank) — each reciprocal rank floored at
    * 6 fixed-point digits so the metric is an exact BIGINT any engine
    * reproduces (divide by n_queries·10^6 for the usual MRR reading).
    * Misses contribute 0 (the standard convention).
    *
    * Inputs: each leg is a ranked (query_id, doc_id, rnk) frame (the
    * contract every retrieval operator here emits); `gold` is
    * (query_id, gold_doc). All joins are eval-sized (queries × k
    * rows) — at any corpus scale the expensive part was producing the
    * legs, not scoring them. */
  def evalRankings(
      legs: Seq[(String, DataFrame)],
      gold: DataFrame,
      ks: Seq[Int] = Seq(1, 3, 10)): DataFrame = {
    require(legs.nonEmpty, "need >= 1 ranked leg")
    require(ks.nonEmpty && ks == ks.sorted, "ks must be non-empty ascending")
    legs.map { case (name, ranked) =>
      val perQ = gold.select(col("query_id"), col("gold_doc"))
        .join(ranked.select(col("query_id"), col("doc_id"),
          col("rnk").cast("long").as("rnk")), Seq("query_id"), "left")
        .groupBy(col("query_id"))
        .agg(min(when(col("doc_id") === col("gold_doc"), col("rnk"))).as("gold_rnk"))
      val aggs =
        (count(lit(1)).as("n_queries") +:
          ks.map(k =>
            sum(when(col("gold_rnk") <= k, 1L).otherwise(0L)).as(s"hits_at_$k"))) :+
          sum(when(col("gold_rnk").isNotNull, expr("1000000 DIV gold_rnk"))
            .otherwise(0L)).as("mrr_fp_sum")
      perQ.agg(aggs.head, aggs.tail: _*)
        .select(lit(name).as("leg") +:
          (Seq("n_queries") ++ ks.map(k => s"hits_at_$k") :+ "mrr_fp_sum").map(col): _*)
    }.reduce(_ unionByName _)
  }
}
