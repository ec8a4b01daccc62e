package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, Similarity, TextAnalysis}
import Tables._

/** Driver-checked queries for the training-data pipeline operators
  * (dedup, text analysis, similarity) over the `documents` and
  * `embeddings` fixtures. Every query has a DuckDB oracle: the
  * operators are defined as deterministic arithmetic (rolling
  * char-hash term ids instead of engine-private hash functions), so
  * Spark and DuckDB produce bit-identical results.
  *
  * `corpus` = documents ∪ exact copies (doc_id+100000, doc_id<25) ∪
  * mutated copies (doc_id+200000, text + a probe tail) — gives the
  * dedup queries real duplicate groups to find. */
object DocQueries {

  import Dedup.{MinhashPrime => P, NumHashes, Bands, RowsPerBand}

  private def docs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(col("doc_id"), col("text"))

  private def corpus(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val dup = d.filter(col("doc_id") < 25)
    d.unionByName(dup.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .unionByName(dup.select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" graft dup probe tail")).as("text")))
  }

  private val corpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 25
      |  UNION ALL SELECT doc_id + 200000 AS doc_id, text || ' graft dup probe tail' AS text
      |    FROM documents WHERE doc_id < 25)""".stripMargin

  /** Shared tokenization / shingling SQL (mirrors TextAnalysis.tokens /
    * .shingles semantics exactly). */
  private val toksSql = """regexp_split_to_array(trim(lower(text)), '\s+')"""
  private def shinglesCte(src: String) =
    s"""toks AS (SELECT doc_id, $toksSql AS t FROM $src),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(t)-1, 1)),
       |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
       |       FROM toks WHERE len(t) >= 3)""".stripMargin
  /** DuckDB twin of TextAnalysis.termHash (rolling char-code hash). */
  private def termHashSql(x: String): String =
    s"CASE WHEN length($x) = 0 THEN 0 ELSE " +
      s"list_reduce(list_transform(string_split($x, ''), c -> CAST(unicode(c) AS BIGINT)), " +
      s"(h, y) -> (h * 31 + y) % 1000000007) END"

  /** DuckDB twin of TextAnalysis.termHash2 (independent second hash). */
  private def termHash2Sql(x: String): String =
    s"CASE WHEN length($x) = 0 THEN 0 ELSE " +
      s"list_reduce(list_transform(string_split($x, ''), c -> CAST(unicode(c) AS BIGINT)), " +
      s"(h, y) -> (h * 37 + y) % 999999937) END"

  /** DuckDB twin of Dedup.chunkIdArr's ~60-bit packed dual-fold chunk
    * id over hash arrays `h`/`h2` at 1-based window start `i`. */
  private def chunkIdSqlK(k: Int): String =
    s"list_reduce(h[i+1:i+$k], (a, b) -> (a * 31 + b) % 1000000007) * 1000000000 + " +
      s"list_reduce(h2[i+1:i+$k], (a, b) -> (a * 37 + b) % 999999937)"
  private def chunkIdSql: String = chunkIdSqlK(8)
  private def shingleIdsCte =
    s"""dsi AS (SELECT doc_id, ${termHashSql("shingle")} AS sid FROM sh)""".stripMargin
  private def sigExprSql: String =
    (0 until NumHashes).map(j =>
      s"min((sid * ${Dedup.hashA(j)} + ${Dedup.hashB(j)}) % $P)").mkString("[", ", ", "]")

  /** Shared CTE chain: minhash signatures -> LSH bands -> candidate
    * pairs (used by the q43 pair query and the q52 grouping query). */
  private def lshCandCtes: String =
    s"""sigs AS (SELECT doc_id, $sigExprSql AS sig FROM dsi GROUP BY doc_id),
       |bands AS (SELECT doc_id, sig, bb.b AS band, list_slice(sig, bb.b * $RowsPerBand + 1, bb.b * $RowsPerBand + $RowsPerBand) AS bandsig
       |          FROM sigs CROSS JOIN (SELECT unnest([${(0 until Bands).mkString(",")}]) AS b) bb),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.sig AS sa, y.sig AS sb
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.bandsig = y.bandsig AND x.doc_id < y.doc_id)""".stripMargin
  private def estJaccardSql: String =
    s"CAST(len(list_filter(range(1, ${NumHashes + 1}), i -> sa[i] = sb[i])) AS DOUBLE) / $NumHashes"

  // ------------------------------------------------------------- queries

  /** Exact dedup (hash-groupBy) over the duplicated corpus. The member
    * list ships CSV-joined: the driver's oracle normalizer cannot hash
    * ARRAY cells, so the array form would silently skip the check
    * (Dedup.exactDuplicates still returns the typed array). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDuplicates(corpus(spark, dir))
      .select(col("text_hash"), col("canonical_id"), col("n_copies"),
        array_join(col("member_ids").cast("array<string>"), ",").as("member_csv"))
      .orderBy(col("canonical_id"))

  /** End-of-sweep cache teardown (Bench calls this between the query
    * sweep and the serving-QPS loops): every per-JVM artifact this
    * registry caches — cached shingle frames, the pinned label /
    * verified-pair checkpoints, collected truth sets — is dropped so
    * live sweep state doesn't sit in the heap while serving latency
    * is measured. Queries issued afterwards simply rebuild. */
  def dropCaches(): Unit = {
    import scala.jdk.CollectionConverters._
    shingleCache.values.asScala.foreach { df =>
      try df.unpersist(false) catch { case _: Throwable => () }
    }
    shingleCache.clear()
    Seq(verifiedPairsCache, labelsCache).foreach { c =>
      c.values.asScala.foreach { df =>
        try graft.plans.Blocks.releasePinned(df)
        catch { case _: Throwable => () }
      }
      c.clear()
    }
    exactNearDupCache.clear()
  }

  /** Tokenization is a persistent pipeline artifact: the (doc_id,
    * shingle) set of a fixed corpus is computed ONCE per sf-dir per
    * JVM and shared by every analysis over it (Jaccard q41, MinHash
    * q42, LSH q43, grouping q52) — exactly how a production pipeline
    * runs many analyses off one materialized tokenization. Guarded
    * against stopped sessions like the ANN index cache. */
  private val shingleCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def cachedShingles(key: String, mk: => DataFrame): DataFrame = {
    val hit = shingleCache.get(key)
    if (hit != null && !hit.sparkSession.sparkContext.isStopped) hit
    else {
      val df = mk.cache()
      df.count()
      shingleCache.put(key, df)
      df
    }
  }

  private def corpusShingles(spark: SparkSession, dir: String): DataFrame =
    cachedShingles(s"$dir#corpus", Dedup.docShingles(spread(corpus(spark, dir)), 3))

  /** Per-doc MinHash signatures of the full corpus — same persistent
    * artifact class (a signature is doc-local, so a doc-sampled
    * signature set is literally a FILTER of this frame: q198's LSH
    * leg reads it through [[graft.operators.Dedup.docSample]] instead
    * of re-running the 16-min aggregation per card evaluation). */
  private def corpusSignatures(spark: SparkSession, dir: String): DataFrame =
    cachedShingles(s"$dir#corpus-minhash",
      Dedup.minhashSignatures(shingleIds(corpusShingles(spark, dir))))

  /** LSH candidate pairs of the corpus at the canonical 0.5 threshold
    * — the THIRD shared artifact both dedup decision paths consume
    * (q52's connected components and q147/q148's DP verification ran
    * the 16-min-agg signature build AND the banding self-join once
    * EACH until r17; a production pipeline bands its signature store
    * once and fans the candidate set out to every decision job).
    * Cached like the shingle sets; candidate pairs are LSH-bounded
    * (never corpus²), so the cached frame is small at any sf. */
  private def corpusLshPairs(spark: SparkSession, dir: String): DataFrame =
    cachedShingles(s"$dir#corpus-lsh-pairs",
      Dedup.lshCandidatePairs(corpusSignatures(spark, dir), threshold = 0.5))

  /** The corpus' (doc_id, tid, cnt) token-count frame — the simhash
    * family's input — is the same persistent-tokenization artifact
    * class as the shingle sets: computed once per sf-dir per JVM and
    * shared (q198's two sketch tiers read it filtered by the doc
    * sample; the filter is a cheap predicate over the in-memory
    * cache). */
  private def corpusTokenCounts(spark: SparkSession, dir: String): DataFrame =
    cachedShingles(s"$dir#corpus-tokcounts",
      spread(corpus(spark, dir))
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
        .select(col("doc_id"), TextAnalysis.termHash(col("token")).as("tid"), col("cnt")))

  private def documentShingles(spark: SparkSession, dir: String): DataFrame =
    cachedShingles(s"$dir#documents", Dedup.docShingles(spread(docs(spark, dir)), 3))

  /** Materialize the shared tokenization artifacts up front and report
    * their cost (same contract as AnnQueries.prewarm): otherwise the
    * build lands on whichever of q41/q42/q43/q52 runs first in map
    * order and per-query bench numbers stop being comparable. */
  def prewarm(spark: SparkSession, dir: String): Map[String, Double] = {
    val t0 = System.nanoTime(); corpusShingles(spark, dir)
    val tCorpus = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime(); documentShingles(spark, dir)
    val tDocs = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    locally {
      val (slice, _, frac) = q56Embeddings(spark, dir)
      exactNearDupPairs(slice, truthCacheKey(dir, 20, frac), 20)
    }
    val tTruth = (System.nanoTime() - t2) / 1e9
    // signatures + banded candidate pairs build BEFORE their consumers
    // (group labels, verified pairs) so each metric times its OWN
    // work: since r17 the three paths share one signature aggregation
    // and one banding join instead of re-running both per path —
    // expect minhash_sigs up (it now runs first and pays the real agg)
    // and dedup_groups/verified_pairs down by more
    val t7 = System.nanoTime(); corpusSignatures(spark, dir)
    val tSigs = (System.nanoTime() - t7) / 1e9
    val t7b = System.nanoTime(); corpusLshPairs(spark, dir)
    val tLshPairs = (System.nanoTime() - t7b) / 1e9
    val t3 = System.nanoTime(); corpusGroupLabels(spark, dir)
    val tLabels = (System.nanoTime() - t3) / 1e9
    val t4 = System.nanoTime(); verifiedPairs(spark, dir)
    val tVerified = (System.nanoTime() - t4) / 1e9
    val t5 = System.nanoTime()
    singleSigStore(spark, dir); mergedSigStore(spark, dir)
    val tStores = (System.nanoTime() - t5) / 1e9
    val t6 = System.nanoTime(); corpusTokenCounts(spark, dir)
    val tTokCounts = (System.nanoTime() - t6) / 1e9
    // the q198/q199 card legs (truth + four candidate tiers) are
    // one-time param-keyed artifacts: build them here so the first
    // in-sweep card evaluation is already the warm fused-eval shape
    val t8 = System.nanoTime()
    locally {
      val card = dedupTierEval(spark, dir)
      card.count()
      graft.plans.Blocks.release(card)
    }
    val tTierLegs = (System.nanoTime() - t8) / 1e9
    val t9 = System.nanoTime(); chunkEmbeddings(spark, dir)
    val tChunkEmb = (System.nanoTime() - t9) / 1e9
    Map("shingle_corpus_build_sec" -> tCorpus,
      "chunk_emb_build_sec" -> tChunkEmb,
      "tier_eval_legs_sec" -> tTierLegs,
      "tokcounts_build_sec" -> tTokCounts,
      "minhash_sigs_build_sec" -> tSigs,
      "lsh_pairs_build_sec" -> tLshPairs,
      "shingle_documents_build_sec" -> tDocs,
      "neardup_truth_sec" -> tTruth,
      "dedup_groups_build_sec" -> tLabels,
      "verified_pairs_build_sec" -> tVerified,
      "sig_store_build_sec" -> tStores)
  }

  /** Exact n-gram (word-trigram) Jaccard: 20 most-similar pairs.
    * EXPLICIT maxShingleFreq = 0 (uncapped exact tier): the oracle
    * replays unfiltered Jaccard, and on this fixture no shingle
    * approaches the default cap so the result equals the capped
    * tier's — the bare API now defaults to the capped scale path
    * ([[Dedup.DefaultMaxShingleFreq]]; q57 oracles the cap itself). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairsFromShingles(corpusShingles(spark, dir),
        maxShingleFreq = 0)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)

  /** (doc_id, sid) pairs: shingle ids are the deterministic rolling
    * char-hash (TextAnalysis.termHash) — a pure per-row expression, so
    * the whole pipeline is one scan + per-doc aggregation with no
    * vocabulary pass (the ranked-vocabulary variant needed a global
    * distinct + sort + broadcast join). */
  private def shingleIds(shingles: DataFrame): DataFrame =
    shingles.select(col("doc_id"), TextAnalysis.termHash(col("shingle")).as("sid"))

  /** MinHash signatures (16 hashes over ranked trigram IDs), CSV-joined
    * for the driver gate (see [[dedupExact]] on array columns). */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashSignatures(shingleIds(documentShingles(spark, dir)))
      .select(col("doc_id"), array_join(col("sig").cast("array<string>"), ",").as("sig_csv"))
      .orderBy(col("doc_id"))

  /** MinHash-LSH candidate pairs (4 bands × 4 rows) over the corpus,
    * kept when signature-estimated Jaccard >= 0.5. Signatures are
    * materialized before the banding self-join (see [[dedupGroups]]). */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    // signatures from the shared cached artifact ([[corpusSignatures]]
    // — the same 16-min-agg frame this query checkpointed per run
    // until r17); the banding self-join IS this query's operator and
    // stays in the timed region
    Dedup.lshCandidatePairs(corpusSignatures(spark, dir), threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  /** q147: fuzzy-dedup candidate VERIFICATION — q43's LSH candidates
    * re-scored by exact normalized Levenshtein similarity at
    * tau = 0.9 ([[Dedup.editDistanceVerify]]). The planted exact
    * copies verify at sim 1.0; the appended-tail near copies pass or
    * fail purely on their char ratio (1 − 21/len) — the char-level
    * second opinion that token-set Jaccard cannot give, and the reason
    * production MinHash dedup verifies before deleting. */
  /** Verified candidate pairs (LSH candidates re-scored by exact
    * normalized Levenshtein at tau = 0.9) — the generate-then-verify
    * artifact q147 EMITS and q148 DECIDES over, materialized once per
    * dir per JVM (the corpusGroupLabels contract: a production fuzzy
    * dedup runs the DP verification once and serves many downstream
    * decisions off it; the DP pass is the most expensive per-pair step
    * in the whole dedup family, and q147/q148 were silently paying it
    * twice). Build cost is reported by [[prewarm]] as
    * `verified_pairs_build_sec`; consumers re-checkpoint their derived
    * frames (the Blocks.release contract). */
  private val verifiedPairsCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** CONTENT-keyed (Scratch.tableFingerprint of `documents`, the same
    * keying discipline as the persisted stores): the cached DP
    * verification moves with fixture content, not path, so the same
    * corpus read from two paths shares one build and a changed corpus
    * under a reused path cannot serve stale pairs (the fingerprint
    * memo is stat-keyed, so even a same-JVM in-place rewrite
    * re-derives). */
  private def verifiedPairs(spark: SparkSession, dir: String): DataFrame = {
    val key = Scratch.tableFingerprint(spark, dir, "documents")
    val hit = verifiedPairsCache.get(key)
    if (hit != null && !hit.sparkSession.sparkContext.isStopped) hit
    else {
      // candidates from the shared banded artifact ([[corpusLshPairs]])
      // — the DP verification is this builder's own cost, the
      // signature/banding work is built once and fanned out
      val out = Dedup.editDistanceVerify(corpus(spark, dir),
          corpusLshPairs(spark, dir), tau = 0.9)
        .localCheckpoint(true)
      // pin: shared artifact — a consumer's release must not kill it
      graft.plans.Blocks.pin(out)
      verifiedPairsCache.put(key, out)
      out
    }
  }

  /** Returns a FRESH checkpoint of the cached verified pairs per call
    * — deliberately: Bench releases each returned frame's blocks after
    * timing (Blocks.release), and a released localCheckpoint cannot
    * recompute (truncated lineage), so handing out the cached frame
    * itself would let one release poison every later consumer. The
    * per-call copy is O(pairs) tiny; the expensive DP verification is
    * what the cache holds. */
  def editDistVerify(spark: SparkSession, dir: String): DataFrame =
    verifiedPairs(spark, dir)
      .orderBy(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)

  /** q148: end-to-end VERIFIED fuzzy dedup decision — q147's verified
    * pairs grouped into connected components, min-id member kept. The
    * materially different decision vs q52/q134's candidate-only
    * grouping: a candidate that fails the char-level bar (q147's
    * verified = 0) never contributes an edge, so borderline
    * token-overlap docs stay OUT of dedup groups and keep training.
    * Same scale shape end to end: banded candidate join, broadcast
    * verification, pointer-doubled components. */
  def verifiedDedup(spark: SparkSession, dir: String): DataFrame = {
    val verified = verifiedPairs(spark, dir).filter(col("verified") === 1)
    Dedup.connectedComponents(verified)
      .select(col("node").as("doc_id"), col("component").as("group_id"),
        (col("node") === col("component")).cast("int").as("keep"))
      .orderBy(col("doc_id")).localCheckpoint(true)
  }

  /** q138: incremental near-dup — the daily-ingest shape. The corpus
    * originals (doc_id < 100000) are signed ONCE into a persisted
    * [[graft.operators.SignatureStore]] (dir-keyed scratch under
    * target/, the q111/q132 idiom: fixtures are immutable, bench
    * repeats must not rebuild); the dup-probe batch (the +100000 exact
    * and +200000 near copies) is then probed against the LOADED store
    * — corpus text is never rescanned on the probe path. Content-
    * addressed shingle ids are what make the two signature sets
    * band-joinable across sessions. */
  /** The q138 corpus signature store — CONTENT-keyed (Scratch): an
    * in-place rewrite of the fixture invalidates the persisted
    * signatures; bench repeats and later JVMs skip the build. writeOnce
    * blocks concurrent same-JVM callers until the winner's build
    * completes (no half-written reads). Prewarmed (sig_store_build_sec)
    * so a cold target/ charges the builds line, not the probe query. */
  private def singleSigStore(spark: SparkSession, dir: String): String = {
    val store = Scratch.dir(spark, dir, "minhash-store", "documents")
    Scratch.writeOnce(store) {
      if (!graft.operators.SignatureStore.exists(store))
        graft.operators.SignatureStore.build(
          spread(corpus(spark, dir)).filter(col("doc_id") < 100000L), store)
    }
    store
  }

  /** The q180 merged store: originals signed as two parity-split half
    * stores, consolidated via [[graft.operators.SignatureStore.merge]]
    * — never a re-shingling pass. Same Scratch discipline. */
  private def mergedSigStore(spark: SparkSession, dir: String): String = {
    val base = Scratch.dir(spark, dir, "minhash-store-halves", "documents")
    val (a, b, m) = (s"$base/a", s"$base/b", s"$base/m")
    Scratch.writeOnce(m) {
      val originals = spread(corpus(spark, dir)).filter(col("doc_id") < 100000L)
      if (!graft.operators.SignatureStore.exists(a))
        graft.operators.SignatureStore.build(originals.filter(col("doc_id") % 2 === 0), a)
      if (!graft.operators.SignatureStore.exists(b))
        graft.operators.SignatureStore.build(originals.filter(col("doc_id") % 2 === 1), b)
      if (!graft.operators.SignatureStore.exists(m))
        graft.operators.SignatureStore.merge(spark, a, b, m)
    }
    m
  }

  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val store = singleSigStore(spark, dir)
    val batchSigs = Dedup.minhashSignatures(Dedup.contentShingleIds(
      corpusShingles(spark, dir).filter(col("doc_id") >= 100000L)))
    graft.operators.SignatureStore.probe(
        batchSigs, graft.operators.SignatureStore.load(spark, store), 0.5)
      .orderBy(col("batch_id"), col("store_id"))
  }

  /** q180: shard-consolidation serving equivalence — the corpus
    * originals are signed as TWO stores split by id parity (the
    * day-build/shard shape), merged via [[graft.operators
    * .SignatureStore.merge]] WITHOUT re-shingling any text, and the
    * dup-probe batch probed against the MERGE. Shares q138's oracle
    * verbatim (the q127/q132 exact-twin pattern): a hash match proves
    * merge(build(A), build(B)) SERVES bit-identically to build(A ∪ B)
    * through the driver gate, not just the spec — the property that
    * makes signature stores consolidatable at 100 TB (a re-shingling
    * merge would be a corpus rescan). Stores are content-keyed
    * Scratch artifacts like q138's. */
  def sigstoreMergeProbe(spark: SparkSession, dir: String): DataFrame = {
    val m = mergedSigStore(spark, dir)
    val batchSigs = Dedup.minhashSignatures(Dedup.contentShingleIds(
      corpusShingles(spark, dir).filter(col("doc_id") >= 100000L)))
    graft.operators.SignatureStore.probe(
        batchSigs, graft.operators.SignatureStore.load(spark, m), 0.5)
      .orderBy(col("batch_id"), col("store_id"))
  }

  /** 32-bit SimHash per document over char-hashed token IDs (one hash
    * per distinct (doc, token) — computed after the count groupBy). */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val tok = spread(d).select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
    val counts = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
    val dtc = counts.select(col("doc_id"), TextAnalysis.termHash(col("token")).as("tid"), col("cnt"))
    Dedup.simhash(dtc).orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs (q97) over the dup-planted corpus: banded
    * hamming join on the 32-bit q44 fingerprint — exact (pigeonhole
    * block cover), so value-oracled unlike the recall-gated LSH tiers.
    * Parameterized at (hamming ≤ 1, two 16-bit blocks): this synthetic
    * corpus is template-heavy, so 8-bit blocks co-bucket hundreds of
    * docs and the classic (3, 4×8-bit) setting produces ~300k pairs at
    * sf0.1 — exactly the "widen the blocks when clusters densify"
    * tuning the operator documents. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    // (doc_id, tid, cnt) comes from the shared tokenization artifact
    // ([[corpusTokenCounts]] — bit-identical to the inline derivation
    // this ran per-sweep until r17; q198's sketch tiers already read
    // it): the timed work is the simhash fold + banded hamming join
    Dedup.simhashNearDupPairs(Dedup.simhash(corpusTokenCounts(spark, dir)),
        maxHamming = 1, nBands = 2)
      .orderBy(col("id_a"), col("id_b"))

  /** BPE merge-table learning (q98): the top-3 learned rules from the
    * documents word-frequency table, in rank order. */
  def bpeLearn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    TextAnalysis.learnBpeMerges(spread(docs(spark, dir)), nMerges = 3)
      .zipWithIndex
      .map { case ((l, r, c), i) => (i + 1, l, r, c) }
      .toDF("rnk", "left_sym", "right_sym", "pair_count")
      .orderBy(col("rnk"))
  }

  /** Embedding-cosine near-dup: 20 most-similar vector pairs. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupPairs(t(spark, dir, "embeddings"), topN = 20)

  /** Corpus cap on q56's EXACT-truth side (r16 verdict item 1: this
    * was the tree's one remaining unbounded all-pairs plan). Up to
    * this many vectors the truth crossJoin runs on the whole corpus
    * (the fixtures — 500/2000 rows — never sample, so the oracled
    * behavior is unchanged at both fixture decades); above it BOTH
    * the truth and the LSH candidate leg run on the SAME seeded
    * [[Dedup.docSample]] slice — both pair endpoints sampled, so
    * pair-level recall on the sample is an unbiased estimate of
    * corpus pair recall (the q198 estimator), and no unsampled
    * crossJoin is reachable from q56 at ANY corpus size. Aligned
    * with [[Dedup.EmbeddingExactThreshold]]: the documented outer
    * edge of the interactive exact tier. */
  private val EmbeddingTruthSampleCap: Long = Dedup.EmbeddingExactThreshold

  /** The embedding slice q56's truth and candidate legs SHARE:
    * (slice, corpus rows, sample frac per 10k). Full corpus at or
    * under [[EmbeddingTruthSampleCap]] (probe is LocalLimit-bounded —
    * small corpora never pay a full count), a seeded hash sample of
    * ~cap rows above it. */
  private[graft] def q56Embeddings(spark: SparkSession, dir: String,
      cap: Long = EmbeddingTruthSampleCap): (DataFrame, Long, Long) = {
    val emb = t(spark, dir, "embeddings")
    val probed = emb.limit((cap + 1L).toInt).count()
    if (probed <= cap) (emb, probed, 10000L)
    else {
      val n = emb.count()
      val frac = math.max(1L, cap * 10000L / n)
      (Dedup.docSample(emb, frac, seed = "q56-truth", idCol = "vec_id"), n, frac)
    }
  }

  /** Exact near-dup top-20 pair set per sf-dir — the ground truth the
    * LSH tier (q56) scores against, computed over the shared
    * [[q56Embeddings]] slice (sample-bounded: the crossJoin input is
    * ≤ ~[[EmbeddingTruthSampleCap]] rows by construction). Cached
    * like the shingle sets / graph index: truth is a one-time
    * evaluation artifact, so bench repeats of q56 measure the
    * bucketed path, not a re-derivation of the exact tier (which q45
    * itself measures, oracled). The value is a collected 20-pair
    * set, valid across sessions. */
  private val exactNearDupCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[(Long, Long)]]()

  private def exactNearDupPairs(slice: DataFrame, cacheKey: String, topN: Int): Set[(Long, Long)] =
    exactNearDupCache.computeIfAbsent(cacheKey, _ =>
      // TRUTH must be the exact tier regardless of slice size — with
      // the default threshold a big slice would route the "truth" to
      // the LSH tier and q56 would score LSH against itself. The
      // slice is sample-bounded, so forcing exact is safe; the belt-
      // and-braces refusal lives in embeddingNearDupPairs itself.
      Dedup.embeddingNearDupPairs(slice, topN = topN,
          exactThreshold = Long.MaxValue)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

  /** Cache key for [[exactNearDupPairs]]: fixture identity (dir +
    * parquet mtime — an in-session rewrite invalidates, the r9 stale-
    * memo edge) + topN + sample frac (a cap change can't serve a
    * mismatched slice's truth). */
  private def truthCacheKey(dir: String, topN: Int, fracPer10k: Long): String = {
    val mtime =
      try {
        val f = new java.io.File(s"$dir/embeddings.parquet")
        val parts = Option(f.listFiles()).getOrElse(Array(f))
        (parts.map(_.lastModified()) :+ f.lastModified()).max
      } catch { case _: Throwable => 0L }
    s"$dir#$topN#$mtime#$fracPer10k"
  }

  /** The SCALE tier of q45: LSH-bucketed near-dup candidates
    * (GraphBuilder.lshKnnEdges — bucketed equi-join, never all-pairs)
    * self-scored against the exact tier's top-20 — both legs over the
    * SAME (sample-bounded above [[EmbeddingTruthSampleCap]]) slice.
    * Reports pair recall plus the sample shape (n_corpus/n_sample/
    * sample_frac_per_10k) so the round artifacts expose both the
    * bucketed path's quality and the estimator's footing; the exact
    * tier stays the oracle-checked twin (q45). */
  def embeddingNearDupLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.index.{GraphBuilder, Metric}
    val (slice, nCorpus, fracPer10k) = q56Embeddings(spark, dir)
    val emb = slice.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val topN = 20
    val nSample = if (fracPer10k >= 10000L) nCorpus else slice.count()
    val exact = exactNearDupPairs(slice, truthCacheKey(dir, topN, fracPer10k), topN)
    val lshPairs = GraphBuilder.lshKnnEdges(emb, k = 10, metric = Metric.Cosine)
      .select(least(col("src"), col("dst")).as("id_a"),
        greatest(col("src"), col("dst")).as("id_b"),
        col("dist"))
      .groupBy(col("id_a"), col("id_b")).agg(min(col("dist")).as("dist"))
      .orderBy(col("dist"), col("id_a"), col("id_b"))
      .limit(topN)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = exact.intersect(lshPairs).size
    // vacuously perfect when the exact tier finds nothing — a 0/0 NaN
    // would silently void the recall gate
    val recall =
      if (exact.isEmpty) 1.0
      else math.round(hit.toDouble / exact.size * 10000.0) / 10000.0
    Seq((nCorpus, nSample, fracPer10k,
        exact.size.toLong, lshPairs.size.toLong, hit.toLong, recall))
      .toDF("n_corpus", "n_sample", "sample_frac_per_10k",
        "n_exact", "n_lsh", "n_hit", "pair_recall")
  }

  /** q41 with the hot-shingle cap ENGAGED (maxShingleFreq = 6): the
    * skew guard that bounds a boilerplate shingle's f² pair
    * contribution at web scale, oracle-checked so the cap provably
    * preserves semantics on the surviving shingle sets. Since r17 the
    * cap is a `size(ids) <= maxFreq` filter inside the kernel's one
    * posting-list aggregation ([[Dedup.ngramJaccardPairsFromShingles]])
    * — the separate anti-join materialization this query used to
    * checkpoint is gone. */
  def ngramJaccardCapped(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairsFromShingles(corpusShingles(spark, dir),
        maxShingleFreq = 6)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)

  /** TF-IDF top-3 terms per document — the vocabulary-statistics
    * primitive (quality scoring, keyword extraction, retrieval
    * weighting). Two bounded shuffles: per-(doc, term) counts with
    * map-side partial aggregation, then the document-frequency join on
    * term (the classic term-stats shuffle — partial-agg'd, and at 100
    * TB the df table is Zipf-small and broadcastable). Ranking uses
    * the ROUNDED score (both engines order the same column) with a
    * term tie-break; the per-doc window is bounded by document length,
    * not corpus size. */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (doc, term) counts and the corpus size come from the shared
    // postings artifact (RetrievalQueries.corpusPostings — the same
    // tokenize + aggregation this derived inline per run; dl is
    // constant per doc so the (doc_id, dl, term) groups ARE the
    // (doc_id, term) groups, and n_docs is the same count(documents))
    val (postings, n, _) = RetrievalQueries.corpusPostings(spark, dir)
    val tf = postings.select(col("doc_id"), col("term"), col("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (round(col("tf") * log((lit(n) + lit(1.0)) / (col("df") + lit(1.0))), 4) + lit(0.0))
          .as("tfidf"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** Benchmark decontamination — the LLM-pipeline op that removes
    * training documents overlapping an evaluation set. Docs 0-4 stand
    * in for the benchmark; a training doc is contaminated when it
    * shares any word-trigram with them. Shape: the benchmark's shingle
    * set is eval-set-sized (tiny) and BROADCAST; the corpus side is
    * one scan of the shared shingle artifact + partial-agg count — at
    * 100 TB the big side never shuffles for the membership test. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh = documentShingles(spark, dir)
    val bench = sh.filter(col("doc_id") < 5).select(col("shingle")).distinct()
    sh.filter(col("doc_id") >= 5)
      .join(broadcast(bench), "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Decontamination forensics (q113): the inverse view of q59 — for
    * each BENCHMARK item, how many training docs leak it and how many
    * shingle hits they contribute. q59 answers "which training docs do
    * I drop"; this answers the eval owner's question, "which benchmark
    * items are compromised and how badly" — the report that decides
    * whether an eval number is still trustworthy. Same broadcast
    * benchmark-shingle join as q59 (one training-shingle scan, partial
    * agg); the distinct-doc count is bounded per benchmark item by the
    * corpus, aggregated two-phase. */
  def decontaminationReport(spark: SparkSession, dir: String): DataFrame = {
    val sh = documentShingles(spark, dir)
    val bench = sh.filter(col("doc_id") < 5)
      .select(col("doc_id").as("bench_id"), col("shingle")).distinct()
    sh.filter(col("doc_id") >= 5)
      .join(broadcast(bench), Seq("shingle"))
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("doc_id")).as("n_leaking_docs"),
        count(lit(1)).as("n_shared_pairs"))
      .orderBy(col("bench_id"))
  }

  /** Span-level decontamination (q102): cut every 8-token window of a
    * training doc (doc_id >= 5) that appears verbatim in the benchmark
    * slice (doc_id < 5) — q59's surgical twin. */
  def spanDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = spread(docs(spark, dir))
    Dedup.removeContaminatedSpans(
      d.filter(col("doc_id") >= 5), d.filter(col("doc_id") < 5), k = 8)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        md5(col("cleaned_text")).as("cleaned_md5"))
      .orderBy(col("doc_id"))
  }

  /** Per-document statistics + quality score. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withTextStats(docs(spark, dir))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("n_distinct_tokens"),
        col("distinct_ratio"), col("avg_token_len"), col("stopword_ratio"), col("quality_score"))
      .orderBy(col("doc_id"))

  /** Heuristic language ID (marker tokens, priority tie-break). */
  def langId(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withLangId(docs(spark, dir))
      .select(col("doc_id") +:
        TextAnalysis.langMarkers.map { case (l, _) => col(s"score_$l").cast("long").as(s"score_$l") } :+
        col("lang_pred"): _*)
      .orderBy(col("doc_id"))

  /** BPE-ish regex token count. */
  def tokenRegexCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), TextAnalysis.regexTokenCount(col("text")).cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Rolling-hash document fingerprint over per-token values. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val vals = transform(col("toks"), t => (length(t).cast("long") * 256L + ascii(t)))
    docs(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextAnalysis.rollingFingerprint(vals).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup group labels of the fixed corpus — like the shingle
    * sets, a pipeline ARTIFACT computed once per sf-dir and shared by
    * every query that consumes the grouping decision (q52 emits it,
    * q65 splits by it): a production dedup pipeline materializes
    * group ids once and runs many downstream jobs off them. Cost is
    * reported by prewarm as dedup_groups_build_sec. */
  private val labelsCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def corpusGroupLabels(spark: SparkSession, dir: String): DataFrame = {
    val hit = labelsCache.get(dir)
    if (hit != null && !hit.sparkSession.sparkContext.isStopped) hit
    else {
      // candidate pairs come from the shared banded artifact
      // ([[corpusLshPairs]] — cached signatures + one banding join,
      // built once per dir per JVM instead of once per decision path)
      val labels = Dedup.connectedComponents(corpusLshPairs(spark, dir))
      val out = labels
        .select(col("node").as("doc_id"), col("component").as("group_id"))
        .localCheckpoint(true)
      // release the iteration checkpoints once the artifact is
      // materialized — a long-lived session must not accumulate blocks
      graft.plans.Blocks.release(labels)
      // pin: consumers embed this frame in released result plans
      graft.plans.Blocks.pin(out)
      labelsCache.put(dir, out)
      out
    }
  }

  /** Near-dup GROUPS: LSH candidate pairs promoted to connected
    * components (min-id label propagation) — the step that turns
    * pairwise similarity into the keep-one-per-group decision a dedup
    * pipeline actually needs.
    *
    * The returned frame is DETACHED (own checkpoint): callers release
    * results via Blocks.release, which unpersists every LogicalRDD in
    * the plan — returning a view over the cached artifact would let a
    * caller release the artifact's own blocks, and a truncated-lineage
    * checkpoint cannot recompute. */
  def dedupGroups(spark: SparkSession, dir: String): DataFrame =
    corpusGroupLabels(spark, dir).orderBy(col("doc_id")).localCheckpoint(true)

  /** Canonical selection (q134): inside every near-dup cluster, KEEP
    * the best-quality member and drop the rest — the decision a dedup
    * pass actually ships (grouping alone answers "what is duplicated",
    * not "which copy trains"). keeper = max (quality_score, −doc_id)
    * struct per group (highest quality, oldest id on ties — quality
    * is a sum of exact quarter-point terms, so ties are exact), via
    * ONE partial-agg struct-max per group — no per-group window sort.
    * Reuses the cached q52 group labels and the q46 quality
    * arithmetic; scoring joins labels on doc_id (clustered docs only,
    * a small fraction of any real corpus). */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val labels = corpusGroupLabels(spark, dir)
    val scored = TextAnalysis.withTextStats(spread(corpus(spark, dir)))
      .select(col("doc_id"), col("quality_score"))
    val members = labels.join(scored, "doc_id")
    val keepers = members.groupBy(col("group_id"))
      .agg(max(struct(col("quality_score"), (-col("doc_id")).as("neg"))).as("k"))
      .select(col("group_id"), (-col("k.neg")).as("keep_id"))
    members.join(broadcast(keepers), Seq("group_id"))
      .select(col("doc_id"), col("group_id"), col("quality_score"),
        (col("doc_id") === col("keep_id")).as("keep"))
      .orderBy(col("doc_id"))
      // detached like q52/q65: this plan embeds the shared label
      // artifact, and before the pin/detach pair a Bench release of
      // this result killed the artifact's blocks for every later
      // labels consumer (the round-13 CHECKPOINT_RDD_BLOCK_ID error)
      .localCheckpoint(true)
  }

  /** Corpus-wide heavy hitters: the 20 most frequent tokens with exact
    * counts — partial (map-side) aggregation means the shuffle carries
    * one row per (partition, token), and the final top-20 is a
    * TakeOrdered, so the plan is a single scan + one bounded shuffle
    * at any corpus size. Deterministic (cnt DESC, token) tie-break. */
  def tokenHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    spread(docs(spark, dir))
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(20)

  /** Frequent-trigram mining (q124): every word trigram present in
    * ≥ 6 documents, exact document frequency — the contamination /
    * template-phrase report. Two bounded-state passes
    * ([[graft.operators.TextAnalysis.frequentNgrams]]): a Misra–Gries
    * candidate sweep whose partial state is ≤ k entries per partition
    * (the n-gram value set never shuffles — the q51 token plan does
    * not survive keys that grow WITH the corpus), then an exact
    * candidate-broadcast count. k=65536 keeps the coverage guarantee
    * minCount > N/k through sf0.1 (N≈260k) with ~100× headroom. */
  def frequentNgramCard(spark: SparkSession, dir: String): DataFrame =
    // per-doc-distinct trigram rows come from the shared tokenization
    // artifact ([[documentShingles]] — bit-identical rows to the
    // inline explode this ran twice per sweep: once under the MG
    // sweep, once under the exact recount)
    TextAnalysis.frequentNgramsFromShingles(documentShingles(spark, dir),
      k = 65536, minCount = 6L)

  /** Token-budget-fair document sample (q125): 100 docs drawn WITHOUT
    * replacement with probability ∝ token count
    * ([[graft.operators.Sampling.weightedSample]], Efraimidis–Spirtes
    * keys from the md5-prefix hash) — so long documents are selected
    * at the rate their tokens contribute to a training budget. The
    * hash-derived keys make the sample itself hash-oracled. */
  def weightedSampleCard(spark: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(spread(docs(spark, dir)), m = 100,
      weight = org.apache.spark.sql.functions.size(TextAnalysis.tokens(col("text"))))

  /** Bloom-pruned blocklist decontamination (q126): drop every corpus
    * document whose EXACT text (md5 key) appears on a takedown
    * blocklist — here planted as every doc_id ≡ 0 (mod 7), the q108
    * planting idiom — via [[graft.operators.Dedup.bloomPrunedAntiJoin]]:
    * bloom-negative rows bypass the join on a map-only leg, only the
    * bloom-positive sliver reaches the exact anti join, and the result
    * is bit-for-bit the plain anti join's (false positives rescued, no
    * false negatives possible) — which is exactly what the DuckDB
    * oracle replays with NOT IN. The planted +100000 duplicate copies
    * of blocklisted texts (corpus CTE) are dropped through the md5 key
    * even though their doc_ids are off-list: content, not id, is the
    * membership. fpp = 0.05 keeps the fixture filter small enough that
    * false positives actually occur and the rescue path carries
    * traffic. */
  def bloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val c = spread(corpus(spark, dir)).select(col("doc_id"), md5(col("text")).as("text_hash"))
    val block = corpus(spark, dir).filter(col("doc_id") % 7 === 0)
      .select(md5(col("text")).as("text_hash"))
    Dedup.bloomPrunedAntiJoin(c, block, "text_hash", fpp = 0.05)
      .select(col("doc_id")).orderBy(col("doc_id"))
  }

  /** Corpus drift monitor (q129): top-20 drifted tokens between the
    * English and Chinese slices of the corpus by per-term
    * Jensen–Shannon contribution, plus the exact total divergence
    * ([[graft.operators.TextAnalysis.tokenDistributionDrift]] —
    * integer sum of the 1e12 fixed-point contributions, so the total
    * is order-independent). Top-20 via a global orderBy+limit, which
    * Spark plans as TakeOrderedAndProject (per-partition bounded
    * heaps, never a full sort) over the vocab-sized frame. */
  def tokenDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val c = TextAnalysis.tokenDistributionDrift(
      spread(d.filter(col("lang") === "en").select(col("text"))),
      spread(d.filter(col("lang") === "zh").select(col("text"))))
    val tot = c.agg(sum(col("js_fp")).as("tot_fp"))
    c.crossJoin(broadcast(tot))
      .orderBy(col("js_fp").desc, col("term"))
      .limit(20)
      .select(col("term"), col("c_a"), col("c_b"),
        (col("js_fp") / lit(1000000000000.0)).as("js_contrib"),
        (col("tot_fp") / lit(1000000000000.0)).as("js_total"))
  }

  /** Per-source drift league table (q131): KL(source ‖ corpus) for
    * every ingestion source — the supplier-mix audit
    * ([[graft.operators.TextAnalysis.sourceKlDrift]]: one tokenize
    * pass, checkpointed Zipf-bounded (source, term) counts feeding
    * baseline + totals + scoring, term-keyed join, 1e12 fixed-point
    * integer sums). */
  def sourceDrift(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceKlDrift(
        spread(t(spark, dir, "documents").select(col("source"), col("text"))))
      .orderBy(col("kl").desc, col("source"))

  /** Deterministic train/val/test split (80/10/10): the split of a
    * document is a pure function of its id (multiplicative hash mod
    * 100), so it is stable across runs, engines, and cluster sizes —
    * the property a training pipeline needs so no example ever
    * migrates between splits. Zero shuffle except the 3-row agg. */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = Sampling.bucket(col("doc_id"), gran = 100)
    val split = when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    docs(spark, dir)
      .select(col("doc_id"), split.as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("split"))
  }

  /** Leakage-safe train/val/test split: the q53 split keyed by the
    * near-dup GROUP id instead of the doc id, so an entire duplicate
    * cluster lands in one split — the guard against test-set leakage
    * through near-duplicates that a per-doc split cannot give. Docs in
    * no LSH pair are their own singleton group. The no-straddling
    * invariant holds BY CONSTRUCTION (split is a pure function of
    * group_id); the oracle re-derives groups via the recursive CTE and
    * applies the same hash. */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val labels = corpusGroupLabels(spark, dir)
    val grouped = corpus(spark, dir).select(col("doc_id"))
      .join(labels.withColumnRenamed("group_id", "component"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("group_id"))
    val bucket = Sampling.bucket(col("group_id"), gran = 100)
    val split = when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    // detached like dedupGroups: Blocks.release on this result must
    // not free the shared label artifact's blocks
    grouped
      .select(col("doc_id"), col("group_id"), split.as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("group_id")).as("n_groups"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(col("split"))
      .localCheckpoint(true)
  }

  /** Multimodal metadata: text treated as an opaque byte payload —
    * size, first code unit, additive checksum (the deterministic part
    * of the decode-stub pipeline in graft.operators.Multimodal). */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        ascii(col("text")).cast("long").as("first_code"),
        (aggregate(transform(split(col("text"), ""), c => ascii(c).cast("long")),
          lit(0L), (s, v) => s + v) % 65521L).as("checksum"))
      .orderBy(col("doc_id"))

  /** The REAL multimodal decode plumbing (mapPartitions with
    * per-partition decoder init) driven end-to-end and oracle-checked:
    * the stub decoder's 8 byte-statistics features are reproduced in
    * SQL, so the whole pack -> decode -> feature path gets a hash
    * check, not just a row count. Feature floats are widened
    * float32 -> double identically on both sides. NOTE: the SQL twin
    * works per CHARACTER (unicode codepoints) while the Scala side is
    * per UTF-8 BYTE — equivalent only because the fixture text is
    * pure ASCII (q50's byte/codepoint checksum match pins that). */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.packText(docs(spark, dir), "doc_id", "text")
    Multimodal.extractFeatures(media)
      .select(Seq(col("media_id").as("doc_id"), col("n_bytes"), col("checksum")) ++
        (0 until Multimodal.StubDecoder.FeatureDim).map(i =>
          element_at(col("feature"), i + 1).cast("double").as(s"f$i")): _*)
      .orderBy(col("doc_id"))
  }

  /** Frame sampling through the real mapPartitions path, value-checked:
    * 4 evenly-spaced 16-byte windows per payload, with offsets and an
    * md5 of each frame's bytes reproduced in SQL. */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.packText(
      docs(spark, dir).filter(col("doc_id") < 100), "doc_id", "text")
    Multimodal.frameSample(media, n = 4, frameBytes = 16)
      .select(col("media_id").as("doc_id"), col("frame_idx"), col("offset"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** REAL image decode end-to-end (q76): a deterministic synthetic PNG
    * per doc_id < 200 (pixels a pure function of id, x, y), encoded and
    * then DECODED through javax.imageio — the oracle re-derives the
    * decoded features (dims, channel means, luminance histogram) from
    * the pixel formula alone, so a hash match proves the real codec
    * round-trips pixels exactly (PNG is lossless). Encoded byte counts
    * are deliberately NOT compared: PNG byte streams are
    * encoder-specific; decoded pixels are not. */
  def imageDecode(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.packSyntheticImages(
      docs(spark, dir).filter(col("doc_id") < 200).select(col("doc_id")), "doc_id")
    Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
      .select(Seq(col("media_id").as("doc_id")) ++
        (0 until Multimodal.ImageIoDecoder.FeatureDim).map(i =>
          element_at(col("feature"), i + 1).cast("double").as(s"f$i")): _*)
      .orderBy(col("doc_id"))
  }

  /** Perceptual image near-dup (q133): dHash every synthetic image
    * through the REAL codec path (PNG encode → ImageIO decode →
    * [[graft.operators.Multimodal.imageDHash]]), then banded-hamming
    * pair join ([[Dedup.simhashNearDupPairs]], 64-bit / 4 blocks —
    * pigeonhole-EXACT for hamming ≤ 3, so the oracle's brute-force
    * replay produces the identical pair set by theorem, never by
    * luck). Planted: ids < 25 republished at +100000 with one pixel
    * blown to white — a byte-level mismatch (PNG bytes differ, md5
    * dedup is blind to it) that perturbs at most a couple of neighbor
    * comparisons, exactly the watermark/logo-tweak case a multimodal
    * dedup tier exists to catch. The oracle re-derives every hash
    * from the pixel formula alone; the Spark side used the real
    * decoder, so a hash match ALSO re-proves the codec round-trip. */
  def imageNearDup(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val base = docs(spark, dir).filter(col("doc_id") < 200).select(col("doc_id"))
    val media = Multimodal.packSyntheticImages(spread(base), "doc_id")
      .unionByName(Multimodal.packSyntheticImagesMutated(
        base.filter(col("doc_id") < 25), "doc_id"))
    Dedup.simhashNearDupPairs(Multimodal.imageDHash(media),
        maxHamming = 3, nBands = 4, idCol = "media_id", hashCol = "dhash", bits = 64)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Perceptual audio near-dup (q146): every synthetic WAV runs the
    * REAL RIFF parse → 65-window mean-delta hash
    * ([[graft.operators.Multimodal.audioMeanHash]] — integer
    * cross-multiplied neighbor comparisons, so the hash is invariant
    * to uniform gain, DC offset, and lossless re-encode), then the
    * same 64-bit banded-hamming pair join as the image tier (q133),
    * pigeonhole-EXACT at hamming ≤ 3. Planted: ids < 25 republished at
    * +100000 with every sample floor-halved (-6 dB) — byte dedup and
    * md5 are blind to a volume change; the mean-order hash is not.
    * The oracle re-derives every hash from the sample formula alone,
    * so a match re-proves the RIFF parse too. */
  def audioNearDup(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val base = docs(spark, dir).filter(col("doc_id") < 200).select(col("doc_id"))
    val media = Multimodal.packSyntheticWavs(spread(base), "doc_id")
      .unionByName(Multimodal.packSyntheticWavsMutated(
        base.filter(col("doc_id") < 25), "doc_id"))
    Dedup.simhashNearDupPairs(Multimodal.audioMeanHash(media),
        maxHamming = 3, nBands = 4, idCol = "media_id", hashCol = "ahash", bits = 64)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** REAL audio decode end-to-end (q77): a deterministic synthetic
    * 16-bit PCM WAV per doc_id < 200 (samples a pure function of
    * (id, t)), encoded with a junk LIST chunk and then DECODED through
    * the RIFF chunk walk — the oracle re-derives the decoded features
    * (format fields, amplitude stats, zero crossings, energy,
    * histogram) from the sample formula alone, so a hash match proves
    * the real encode → parse → decode path (PCM is lossless). */
  def audioDecode(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.packSyntheticWavs(
      docs(spark, dir).filter(col("doc_id") < 200).select(col("doc_id")), "doc_id")
    Multimodal.extractFeatures(media, Multimodal.WavPcmDecoder)
      .select(Seq(col("media_id").as("doc_id")) ++
        (0 until Multimodal.WavPcmDecoder.FeatureDim).map(i =>
          element_at(col("feature"), i + 1).cast("double").as(s"f$i")): _*)
      .orderBy(col("doc_id"))
  }

  /** REAL BPE token counting (q78): every word runs the frozen
    * [[TextAnalysis.BpeMerges]] merge table in rank order — the
    * classic BPE encode as a pure column fold — and the per-document
    * word/BPE-token counts come out of one explode + one partial
    * aggregate. The oracle replays the identical fold over the
    * identical table in DuckDB, so a hash match pins the tokenizer
    * MECHANISM (greedy leftmost merges, rank order), not just totals. */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val words = spread(docs(spark, dir))
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    words.select(col("doc_id"), TextAnalysis.bpeTokenCount(col("w")).as("c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("c")).cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer fertility by language (q173): BPE tokens per word,
    * grouped by the labeled language — THE cross-lingual tokenizer
    * equity metric (a language whose fertility runs far above the
    * corpus mean pays more sequence length per word: under-served by
    * the merge table, the signal that drives vocab rebalancing).
    * Same frozen-merge fold as q78 (the mechanism is already
    * hash-pinned there); the lang rollup adds one broadcast metadata
    * join before the partial agg. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val words = spread(t(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text")))
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    words.select(col("lang"), TextAnalysis.bpeTokenCount(col("w")).as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"), sum(col("c")).cast("long").as("n_bpe_tokens"))
      .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
        (round(col("n_bpe_tokens").cast("double") / col("n_words"), 6) + lit(0.0))
          .as("fertility"))
      .orderBy(col("lang"))
  }

  /** REAL video decode end-to-end (q79): a deterministic synthetic
    * multi-frame animated GIF per doc_id < 150 (frame count, dims, and
    * every pixel's palette index pure functions of (id, frame, x, y);
    * the palette maps index → RGB by formula), encoded and then DECODED
    * through the javax.imageio GIF container walk — the oracle
    * re-derives the decoded features (frame count, dims, channel means,
    * first/last-frame luminance, histogram) from arithmetic alone, so a
    * hash match proves the real encode → LZW decode → frame walk path
    * (palette-indexed GIF is lossless). */
  def videoDecode(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.packSyntheticGifs(
      docs(spark, dir).filter(col("doc_id") < 150).select(col("doc_id")), "doc_id")
    Multimodal.extractFeatures(media, Multimodal.GifVideoDecoder)
      .select(Seq(col("media_id").as("doc_id")) ++
        (0 until Multimodal.GifVideoDecoder.FeatureDim).map(i =>
          element_at(col("feature"), i + 1).cast("double").as(s"f$i")): _*)
      .orderBy(col("doc_id"))
  }

  /** Deterministic PII suffix appended to each document so the
    * redaction query has known-position entities to find: always an
    * email, an IPv4 for doc_id % 3 != 1, a phone fragment for even
    * doc_id. Mirrored verbatim in the oracle SQL. */
  private def withPiiText(d: DataFrame): DataFrame =
    d.withColumn("text", concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
      when(col("doc_id") % 3 =!= 1,
        concat(lit(" from 10."), (col("doc_id") % 200).cast("string"),
          lit(".0."), (col("doc_id") % 250).cast("string"))).otherwise(lit("")),
      when(col("doc_id") % 2 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit(""))))

  /** PII census + redaction (q80): per-document entity counts on the
    * original text and an md5 of the redacted text. A single narrow
    * projection — three chained codegen regexp_replace + three
    * regexp_extract_all counts; no shuffle, scan-bound at any scale. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withPiiRedaction(withPiiText(docs(spark, dir)))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy(col("doc_id"))

  /** Boilerplate-line removal (q81): the duplicated corpus segmented
    * into deterministic 8-token "lines" (the fixture text has no
    * newlines; real corpora plug a newline split into the same
    * operator), lines in ≥ 3 distinct docs dropped from every doc.
    * One frequency agg on md5(line) + a broadcast tag join + one
    * per-doc reassembly — two narrow-keyed shuffles total. */
  /** Deterministic 8-token "line" segmentation shared by the
    * line-granularity dedup queries (q81/q107) and their oracles. */
  private def corpusLines(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val lineArr = transform(
      sequence(lit(0), (ceil(size(toks) / lit(8.0))).cast("int") - 1),
      i => array_join(slice(toks, i * 8 + 1, lit(8)), " "))
    spread(corpus(spark, dir))
      .select(col("doc_id"), posexplode(lineArr).as(Seq("line_no", "line")))
  }

  def lineBoilerplate(spark: SparkSession, dir: String): DataFrame =
    Dedup.removeBoilerplateLines(corpusLines(spark, dir), minDocFreq = 3, idCol = "doc_id")
      .select(col("id").as("doc_id"), col("n_lines"), col("n_removed"),
        md5(col("cleaned")).as("cleaned_md5"))
      .orderBy(col("doc_id"))

  /** Global keep-first line dedup (q107): over the dup-planted corpus,
    * every repeated 8-token line keeps only its globally first
    * occurrence — the planted full-copy docs (+100000) collapse to
    * nothing and the tail-variant docs (+200000) keep only their novel
    * tail line, while q81's threshold policy would have stripped those
    * lines from the ORIGINALS too. */
  def lineDedupKeepFirst(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupLinesKeepFirst(corpusLines(spark, dir), idCol = "doc_id")
      .select(col("id").as("doc_id"), col("n_lines"), col("n_removed"),
        md5(col("cleaned")).as("cleaned_md5"))
      .orderBy(col("doc_id"))

  /** Unicode NFC normalization at ingest (q110): the fixture text is
    * ASCII, so each doc gets a deterministic diacritic suffix —
    * COMPOSED on even ids (é = U+00E9), DECOMPOSED on odd ids
    * (e + U+0301) — and the native normalize expression must collapse
    * both to identical NFC bytes (md5-checked against DuckDB
    * nfc_normalize; the codepoint-length delta pins which rows were
    * actually rewritten). Pure narrow projection — scan-bound. */
  def unicodeNormalize(spark: SparkSession, dir: String): DataFrame = {
    val injected = concat(col("text"),
      when(col("doc_id") % 2 === 0, lit(" caf\u00e9 unicode"))
        .otherwise(lit(" cafe\u0301 unicode")))
    spread(docs(spark, dir))
      .select(col("doc_id"),
        length(injected).as("pre_len"),
        length(TextAnalysis.normalizeUnicode(injected)).as("post_len"),
        md5(TextAnalysis.normalizeUnicode(injected)).as("norm_md5"))
      .orderBy(col("doc_id"))
  }

  /** JSONL ingest with quarantine (q111): the corpus serialized to
    * JSON-lines with every doc_id ≡ 0 (mod 50) line deterministically
    * corrupted (leading garbage — unparseable from byte 0, so Spark's
    * partial-result JSON parsing can never salvage a field), then read
    * back through [[graft.sources.CorpusIngest]]. Good rows must
    * round-trip byte-exactly (per-lang doc/char totals re-derived by
    * the oracle straight from the table), corrupt lines must land in
    * quarantine — counted, never silently dropped. */
  def jsonlIngest(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.CorpusIngest
    val d = t(spark, dir, "documents")
    val lines = d.select(
      when(col("doc_id") % 50 === 0,
        concat(lit("trunc{\"doc_id\": "), col("doc_id").cast("string")))
        .otherwise(to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))))
        .as("value"))
    // deterministic CONTENT-keyed scratch path (Scratch idiom: the key
    // moves with the fixture's rows, so an in-place rewrite of the
    // dataset invalidates the dump; bench repeats and later JVMs reuse
    // it). The dump is a pure function of `documents`, so reuse across
    // JVMs is sound; writeOnce blocks concurrent callers while the
    // winner writes. Kept under the repo's target/ rather than /tmp,
    // so scratch corpus copies stay inside the workspace and are
    // reaped by clean.
    val tmp = Scratch.dir(spark, dir, "oracle-scratch", "documents") + "/jsonl"
    Scratch.writeOnce(tmp) {
      if (!graft.index.ArtifactStore.current.exists(s"$tmp/_SUCCESS"))
        lines.write.mode("overwrite").text(tmp)
    }
    val good = CorpusIngest.readJsonl(spark, tmp, d.schema)
    val quarantined = CorpusIngest.quarantineJsonl(spark, tmp, d.schema)
    good.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .unionByName(quarantined.agg(count(lit(1)).as("n_docs"))
        .select(lit("__quarantined__").as("lang"), col("n_docs"),
          lit(0L).as("sum_chars")))
      .orderBy(col("lang"))
  }

  /** q139: CSV ingest with quarantine — the q111 contract over the
    * OTHER line-splittable dump format (headerless CSV, explicit
    * schema, PERMISSIVE parse; every doc_id % 50 == 0 line is
    * corrupted with a non-numeric id cell). Same deterministic
    * corruption rule, so the oracle re-derives both partitions from
    * `documents` without reading the scratch dump. */
  def csvIngest(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.CorpusIngest
    val d = t(spark, dir, "documents")
    val lines = d.select(
      when(col("doc_id") % 50 === 0,
        concat(lit("x"), col("doc_id").cast("string"), lit(",truncated")))
        .otherwise(to_csv(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))))
        .as("value"))
    // content-keyed, write-once — the q111 Scratch idiom
    val tmp = Scratch.dir(spark, dir, "oracle-scratch", "documents") + "/csv"
    Scratch.writeOnce(tmp) {
      if (!graft.index.ArtifactStore.current.exists(s"$tmp/_SUCCESS"))
        lines.write.mode("overwrite").text(tmp)
    }
    val good = CorpusIngest.readCsv(spark, tmp, d.schema)
    val quarantined = CorpusIngest.quarantineCsv(spark, tmp, d.schema)
    good.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .unionByName(quarantined.agg(count(lit(1)).as("n_docs"))
        .select(lit("__quarantined__").as("lang"), col("n_docs"),
          lit(0L).as("sum_chars")))
      .orderBy(col("lang"))
  }

  /** Pipeline yield report (q117): the composed curation funnel —
    * ingest → quality gate (q46's score ≥ 0.5) → exact keep-first
    * dedup → benchmark decontamination (q59's rule) — reported as
    * survivor counts per stage over the dup-planted corpus. This is
    * the number a data-engineering review actually asks for ("how
    * much survives each gate, and which gate is eating the corpus"),
    * and it pins that the individually-oracled operators COMPOSE
    * (PipelineSpec proves composition in-process; this makes it
    * driver-checked against an independent engine). All thresholds
    * compare exactly-representable rounded values, so no gate can
    * flip cross-engine. */
  def pipelineYield(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    // each stage frame feeds BOTH its own count branch and the next
    // stage (q: count + dedup winners + semi-join = 3 consumers; d:
    // count + two shingle passes + the final filter) — without a
    // barrier every branch re-runs the full upstream chain (text
    // stats + dedup + shingling; measured ~5s steady at sf0.1, ~2.4s
    // checkpointed). The frames are (id, text) projections of the
    // corpus — the q115 materialization rule; Bench releases the
    // blocks like every checkpointed result.
    val q = TextAnalysis.withTextStats(c)
      .filter(col("quality_score") >= 0.5)
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    val winners = q.groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
    val d = q.join(winners.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val bench = Dedup.docShingles(c.filter(col("doc_id") < 5), 3)
      .select(col("shingle")).distinct()
    val contaminated = Dedup.docShingles(d.filter(col("doc_id") >= 5), 3)
      .join(broadcast(bench), Seq("shingle"))
      .select(col("doc_id")).distinct()
    val e = d.filter(col("doc_id") >= 5).join(contaminated, Seq("doc_id"), "left_anti")
    val row = (label: String, df: DataFrame) =>
      df.agg(count(lit(1)).as("n_docs")).select(lit(label).as("stage"), col("n_docs"))
    row("00_ingest", c)
      .unionByName(row("10_quality", q))
      .unionByName(row("20_dedup", d))
      .unionByName(row("30_decontam", e))
      .orderBy(col("stage"))
  }

  /** RAG chunking (q119): overlapping 8-token windows at stride 4 —
    * the embedding-prep splitter whose (doc_id, chunk_no) provenance
    * feeds the q109 parent-doc retrieval shape. */
  def chunkOverlap(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkTokens(spread(docs(spark, dir)), size = 8, stride = 4)
      .select(col("id").as("doc_id"), col("chunk_no"),
        md5(col("chunk")).as("chunk_md5"), col("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_no"))

  /** PMI collocations (q116): top-20 adjacent word pairs by pointwise
    * mutual information over the documents corpus, min pair count 5. */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiCollocations(spread(docs(spark, dir)))

  /** Vocabulary coverage / OOV audit (q157): per-source coverage of
    * the frozen top-16 corpus vocabulary — the tokenizer-fit check
    * before committing a vocab to a corpus mix. See
    * [[TextAnalysis.vocabCoverage]] for the one-tokenize-pass /
    * counts-frame-reuse plan shape. */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(
      spread(t(spark, dir, "documents").select(col("source"), col("text"))),
      vocabSize = 16)

  /** TF-IDF keyword extraction (q158): top-5 terms per document by
    * tf·ln(N/df) — per-document tagging, where q127's BM25 scores
    * documents for a query. See [[TextAnalysis.tfidfKeywords]]. */
  def tfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    // (doc, term) counts from the shared postings artifact (see
    // tfidfTopTerms); the idf fit + per-doc window stay timed
    val (postings, nDocs, _) = RetrievalQueries.corpusPostings(spark, dir)
    TextAnalysis.tfidfKeywordsFromCounts(
      postings.select(col("doc_id"), col("term"), col("tf")), nDocs, k = 5)
  }

  /** Compressibility quality screen (q159, rows-only — DuckDB has no
    * zlib surface, so the signal can't be hash-oracled; the semantics
    * are pinned by CompressSpec instead): per-source DEFLATE
    * compression-ratio band report — mean ratio plus counts of
    * repetitive-tail (boilerplate compresses far below prose) and
    * noise-tail documents. ONE narrow map (the per-thread-Deflater
    * kernel) into a per-source partial agg; ratios quantized to 1e4
    * fixed point BEFORE the mean sum so the report is add-order free.
    * GATED since round 11 (pass_class_order): three designed probe
    * classes must order boilerplate < prose < noise through the same
    * kernel, so the signal itself is asserted per round, not just its
    * row count. */
  def compressQuality(spark: SparkSession, dir: String): DataFrame = {
    val ratioFp = round(TextAnalysis.deflateSize(col("text")).cast("double")
      / octet_length(col("text")).cast("double") * 1e4).cast("long")
    val report = t(spark, dir, "documents")
      .select(col("source"), ratioFp.as("r_fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (round(sum(col("r_fp")).cast("double") / count(lit(1)) / 1e4, 6) + lit(0.0))
          .as("mean_ratio"),
        sum(when(col("r_fp") < 3000L, 1L).otherwise(0L)).as("n_repetitive"),
        sum(when(col("r_fp") > 9000L, 1L).otherwise(0L)).as("n_noise"))
    // GATE rows (the pass_* convention, RECALL.json via Verify): three
    // DESIGNED text classes pushed through the SAME kernel — the
    // signal's whole premise is boilerplate << prose << noise, so the
    // probes' ratios must order that way or the screen is broken (the
    // fixture's real sources are homogeneous synthetic prose and can't
    // witness the ordering themselves). `zz~` prefixes sort the probe
    // rows after every real source. Probe ratios are computed through
    // a 3-row frame (same codegen kernel as the corpus pass — not a
    // driver-side reimplementation), collected, and the ordering
    // verdict rides every row as pass_class_order.
    val ss = spark
    import ss.implicits._
    val probes = Seq(
      ("zz~probe_boilerplate",
        "home | products | docs | about | contact | copyright acme corp " +
          "all rights reserved | terms of service | privacy policy\n" * 24),
      ("zz~probe_prose",
        "The measurement of compressibility serves as a language agnostic " +
          "screen for text quality because ordinary prose occupies a narrow " +
          "band between two failure modes. Repeated navigation chrome and " +
          "templated boilerplate collapse under a dictionary coder since the " +
          "same phrases recur at short distances, while randomized padding or " +
          "binary noise resists compression almost entirely because no " +
          "structure repeats at any distance. A curation pipeline exploits " +
          "this by computing the ratio of compressed size to raw size once " +
          "per document and flagging both tails for review before training. " +
          "The middle of the distribution, where genuine writing lives, " +
          "passes through untouched and no tokenizer or vocabulary is needed " +
          "at any point in the procedure."),
      ("zz~probe_noise", {
        // deterministic xorshift64 stream over a 64-symbol alphabet —
        // incompressible by design, identical on every run/host
        val syms =
          "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789+/"
        val sb = new StringBuilder
        var x = 0x9E3779B97F4A7C15L
        var i = 0
        while (i < 1200) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          sb.append(syms(((x >>> 8) % 64).toInt)); i += 1
        }
        sb.toString
      }))
    val probeStats = probes.toDF("source", "text")
      .select(col("source"), ratioFp.as("r_fp"))
      .select(col("source"), lit(1L).as("n_docs"),
        (round(col("r_fp").cast("double") / 1e4, 6) + lit(0.0)).as("mean_ratio"),
        when(col("r_fp") < 3000L, 1L).otherwise(0L).as("n_repetitive"),
        when(col("r_fp") > 9000L, 1L).otherwise(0L).as("n_noise"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ordered =
      probeStats("zz~probe_boilerplate") < probeStats("zz~probe_prose") &&
        probeStats("zz~probe_prose") < probeStats("zz~probe_noise")
    val probeRows = probes.map(_._1).sorted.map { s =>
      (s, 1L, probeStats(s), if (probeStats(s) < 0.3) 1L else 0L,
        if (probeStats(s) > 0.9) 1L else 0L)
    }.toDF("source", "n_docs", "mean_ratio", "n_repetitive", "n_noise")
    report.unionByName(probeRows)
      .withColumn("pass_class_order", lit(if (ordered) 1 else 0))
      .orderBy(col("source"))
  }

  /** Percentile-rank quality blending (q160): the rule-based quality
    * score and the distinct-token ratio — incommensurable scales —
    * rank-normalized to tie-aware global percentiles and blended as
    * the mean; the combined curation score a filtering pass thresholds
    * on. See [[graft.operators.Sampling.percentileBlend]] for the
    * no-global-window prefix machinery. */
  def qualityBlend(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.percentileBlend(
      TextAnalysis.withTextStats(spread(docs(spark, dir)))
        .select(col("doc_id"), col("quality_score"), col("distinct_ratio")),
      Seq("quality" -> col("quality_score"), "distinct" -> col("distinct_ratio")))

  /** Duplicate-rate league table (q163): per source, the fraction of
    * documents implicated in ANY near-dup pair (the cached q52
    * machinery) — the "which source is the copy farm" signal a
    * curation pass uses to set per-source quotas and crawl priorities.
    * One distinct over the labeled ids (already a tiny fraction of the
    * corpus), one left join onto (doc_id, source), one partial agg. */
  def dupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    val dup = corpusGroupLabels(spark, dir)
      .select(col("doc_id")).distinct().withColumn("is_dup", lit(1L))
    t(spark, dir, "documents").select(col("doc_id"), col("source"))
      .join(dup, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"))
      .select(col("source"), col("n_docs"), col("n_dup"),
        (round(col("n_dup").cast("double") / col("n_docs"), 6) + lit(0.0))
          .as("dup_rate"))
      .orderBy(col("source"))
  }

  /** Canary occurrence totals (q167): per blocklist phrase, the
    * number of documents containing it and the TOTAL occurrence count
    * corpus-wide — the contamination-canary tally an eval-integrity
    * audit publishes (q156 flags documents; this one quantifies
    * exposure per canary). Same one-automaton-walk cost
    * ([[TextAnalysis.multiMatchCounts]]); the per-pattern reshape is a
    * posexplode of a fixed-length array + partial agg. */
  def canaryCounts(spark: SparkSession, dir: String): DataFrame = {
    val ss = spark
    import ss.implicits._
    val names = BlockPhrases.zipWithIndex
      .map { case (p, i) => (i + 1, p) }.toDF("pattern_id", "pattern")
    t(spark, dir, "documents")
      .select(posexplode(
        TextAnalysis.multiMatchCounts(col("text"), BlockPhrases))
        .as(Seq("pos", "cnt")))
      .groupBy((col("pos") + 1).as("pattern_id"))
      .agg(sum(when(col("cnt") > 0, 1L).otherwise(0L)).as("n_docs"),
        sum(col("cnt").cast("long")).as("n_occurrences"))
      .join(broadcast(names), Seq("pattern_id"))
      .select(col("pattern_id"), col("pattern"), col("n_docs"), col("n_occurrences"))
      .orderBy(col("pattern_id"))
  }

  /** Schema-evolution ingest (q168): two corpus drops whose schemas
    * DIFFER — drop 2 grew a `lang` column — read as one frame via
    * parquet `mergeSchema` (the real mechanics: Spark unions the file
    * footers' schemas and back-fills NULL for files missing a column;
    * at 100 TB this is how a years-long corpus with accreting metadata
    * reads without a rewrite). The report is the per-drop completeness
    * of the accreted column — what a backfill decision reads. Drops
    * are fixture-derived parquet written once per dataset under the
    * repo-scratch path (the q111 idiom); the oracle re-derives the
    * merged frame directly from `documents`, so the hash gate checks
    * the EVOLUTION mechanics, not the copy. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    // content-keyed + blocking write-once (Scratch): a concurrent
    // caller waits for the writer instead of racing it to the read
    val base = Scratch.dir(spark, dir, "oracle-scratch", "documents") + "/q168"
    Scratch.writeOnce(base) {
      if (!graft.index.ArtifactStore.current.exists(s"$base/d2/_SUCCESS")) {
        val d = t(spark, dir, "documents")
        d.filter(col("doc_id") < 250)
          .select(lit(1).as("drop_no"), col("doc_id"), col("source"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$base/d1")
        d.filter(col("doc_id") >= 250)
          .select(lit(2).as("drop_no"), col("doc_id"), col("source"), col("n_chars"),
            col("lang"))
          .write.mode("overwrite").parquet(s"$base/d2")
      }
    }
    spark.read.option("mergeSchema", "true").parquet(s"$base/d1", s"$base/d2")
      .groupBy(col("drop_no"))
      .agg(count(lit(1)).as("n_rows"), count(col("lang")).as("n_lang_present"),
        (round(count(col("lang")).cast("double") / count(lit(1)), 6) + lit(0.0))
          .as("lang_completeness"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("drop_no"))
  }

  /** Language-ID confusion audit (q169): the q47 heuristic's
    * prediction cross-tabulated against the corpus's labeled `lang`
    * column, plus each truth-language's accuracy — the calibration a
    * pipeline runs before trusting a cheap classifier to route a
    * mixture (q71's rates key on language). One narrow scoring map +
    * one partial-agg groupBy; accuracy derives from exact counts. */
  def langidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.withLangId(
      spread(t(spark, dir, "documents").select(col("doc_id"), col("text"), col("lang"))))
    scored.groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_frac",
        (round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("lang"))), 6) + lit(0.0)))
      .orderBy(col("lang"), col("lang_pred"))
  }

  /** Corpus-release round trip (q170): publish `documents` as an
    * integrity-manifested release ([[graft.sources.CorpusRelease]] —
    * sharded parquet + order-independent content checksum, verified on
    * open), then report the shard layout through the VERIFIED open
    * path. The oracle re-derives the shard grouping directly from
    * `documents`, so the hash gate proves the publish→verify→serve
    * loop loses and corrupts nothing. */
  def corpusReleaseAudit(spark: SparkSession, dir: String): DataFrame = {
    // content-keyed + blocking write-once (Scratch): the release.json
    // manifest is the completeness marker (CorpusRelease writes it LAST)
    val base = Scratch.dir(spark, dir, "oracle-scratch", "documents") + "/q170"
    Scratch.writeOnce(base) {
      if (!graft.index.ArtifactStore.current.exists(s"$base/release.json"))
        graft.sources.CorpusRelease.write(
          t(spark, dir, "documents").select(col("doc_id"), col("text")), base, shards = 8)
    }
    graft.sources.CorpusRelease.open(spark, base)
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy(col("shard"))
  }

  /** Near-dup cluster report (q171): per q52 component — size, id
    * span, injected-probe membership, and the number of distinct REAL
    * sources it spans (a cluster crossing many sources is syndication/
    * mirroring; within one source it's re-posting) — the shape of the
    * duplication a curation decision reads after q163's rates. Group
    * stats are one partial agg over the cached labels; the source mix
    * is a left join onto (doc_id, source) — injected probe ids miss
    * and count nothing. */
  def dupClusterReport(spark: SparkSession, dir: String): DataFrame = {
    val labels = corpusGroupLabels(spark, dir)
    labels
      .join(t(spark, dir, "documents").select(col("doc_id"), col("source")),
        Seq("doc_id"), "left")
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_members"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(when(col("doc_id") >= 100000L, 1L).otherwise(0L)).as("n_injected"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("group_id"))
  }

  /** q156's phrase blocklist — multi-word phrases (so token-level
    * blocklist joins couldn't express the screen), declared once so
    * the Spark side and the oracle inline the identical literals. */
  private[queries] val BlockPhrases =
    Seq("slow fast", "hash value", "customer query", "data column", "spark join")

  /** Phrase-blocklist screen (q156): flagged documents with the
    * distinct blocklist phrases each contains — the NSFW/policy/canary
    * wordlist pass a crawl pipeline runs on every document. ONE
    * Aho–Corasick automaton walk per row regardless of pattern count
    * ([[TextAnalysis.multiMatch]]; the automaton rides into codegen as
    * a reference object), then a narrow filter — no join, no shuffle
    * until the final tiny sort. Matched indices render as a CSV string
    * (driver outputs are ARRAY-free by contract). */
  def blocklistScreen(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.multiMatch(col("text"), BlockPhrases).as("m"))
      .filter(size(col("m")) > 0)
      .select(col("doc_id"), size(col("m")).as("n_matched"),
        array_join(transform(col("m"), i => i.cast("string")), ",").as("matched"))
      .orderBy(col("doc_id"))

  private val RagDim = 16

  /** Shared chunk-embedding artifact for the retrieval pair q122/q150:
    * every document's overlapping 8-token windows embedded as 16-bucket
    * hashed bag-of-words counts — computed once per sf-dir per JVM (the
    * corpusShingles convention: a RAG deployment chunks + embeds its
    * corpus once and serves many retrieval queries off the embedded
    * chunks; both queries re-ran the chunk + tokenize + hash pipeline
    * per sweep run until r17). Prewarmed as chunk_emb_build_sec. */
  private def chunkEmbeddings(spark: SparkSession, dir: String): DataFrame =
    cachedShingles(s"$dir#chunk-emb", {
      val chunks = TextAnalysis.chunkTokens(spread(docs(spark, dir)),
        size = 8, stride = 4)
      val withTids = chunks.withColumn("tids",
        transform(TextAnalysis.tokens(col("chunk")),
          t => pmod(TextAnalysis.termHash(t), lit(RagDim.toLong))))
      def comp(j: Int) =
        org.apache.spark.sql.functions.size(
          filter(col("tids"), x => x === j.toLong)).cast("long").as(s"c$j")
      withTids.select(
        Seq(col("id").as("doc_id"), col("chunk_no")) ++
          (0 until RagDim).map(comp): _*)
    })

  /** COMPOSED RAG retrieval (q122): the full chunk → embed → retrieve
    * → parent-doc pipeline over REAL chunk provenance — the end-to-end
    * a RAG user actually runs, where q109's synthetic `vec_id div 4`
    * grouping stays as the unit twin. Stages: (1)
    * [[TextAnalysis.chunkTokens]] splits every document into
    * overlapping 8-token windows (q119's splitter — its `(doc_id,
    * chunk_no)` provenance is what this query finally consumes);
    * (2) each chunk embeds as a 16-bucket hashed bag-of-words
    * ([[TextAnalysis.termHash]] mod 16 — integer counts, so distances
    * are EXACT and the DuckDB twin replays them bit-for-bit);
    * (3) query chunks (first two windows of docs 0-2) retrieve by
    * squared-L2 over chunk embeddings; (4) per-document min-pool +
    * bounded-heap top-3 — parent-doc scoring on the true provenance.
    *
    * Scale shape: chunking and embedding are pure column expressions
    * (posexplode + transform/filter folds — no tokenize shuffle, no
    * vocabulary pass); queries broadcast; min-pool is a partial-agg
    * groupBy carrying O(queries × docs) rows; the doc top-k is the
    * same bounded-heap aggregate as every kNN query. Swapping stage 3
    * for the ANN graph/IVF tier changes nothing else — exactly the
    * q109 contract, now fed by real chunks. */
  def ragRetrieval(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.topKPairs
    // chunk embeddings from the shared artifact ([[chunkEmbeddings]]);
    // the retrieval stages (3)-(4) are this query's timed work
    val emb = chunkEmbeddings(spark, dir)
    val queries = emb.filter(col("doc_id") < 3 && col("chunk_no") < 2)
      .select(Seq((col("doc_id") * 1000L + col("chunk_no")).as("query_id")) ++
        (0 until RagDim).map(j => col(s"c$j").as(s"q$j")): _*)
    val distExpr = (0 until RagDim).map(j =>
        (col(s"q$j") - col(s"c$j")) * (col(s"q$j") - col(s"c$j")))
      .reduce(_ + _).cast("double")
    val best = emb.crossJoin(broadcast(queries))
      .select(col("query_id"), col("doc_id"), distExpr.as("dist"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(min(col("dist")).as("dist"))
    best.groupBy(col("query_id"))
      .agg(topKPairs(col("dist"), col("doc_id"), 3).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("doc_id"), col("p.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** q150: late-interaction (MaxSim, ColBERT-style — Khattab & Zaharia
    * 2020) retrieval over the q122 chunk embeddings: a QUERY is a whole
    * document's chunk-vector SET and score(Q, D) = Σ_{q∈Q} max_{d∈D}
    * ⟨q, d⟩ — each query chunk finds its best-matching passage in the
    * candidate doc, so a doc answering ALL the query's aspects beats
    * one matching a single chunk hard (what single-vector min-pool,
    * q122, cannot express). Integer hashed-BoW dots keep every score an
    * exact BIGINT, so the ranking is hash-oracled, not recall-gated.
    *
    * Scale shape: the query chunk set broadcasts; ONE corpus chunk
    * scan; max-per-(query-chunk, doc) then sum-per-(query-doc, doc)
    * are two partial aggs; the doc top-3 rides the bounded heap on
    * −score. At a real deployment the crossJoin swaps for an ANN
    * candidate stage exactly as q109/q122 document. */
  def maxsimRetrieval(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.topKPairs
    // chunk embeddings from the shared artifact ([[chunkEmbeddings]]);
    // the MaxSim scoring pipeline is this query's timed work
    val emb = chunkEmbeddings(spark, dir)
    val queries = emb.filter(col("doc_id") < 3)
      .select(Seq(col("doc_id").as("q_doc"), col("chunk_no").as("q_chunk")) ++
        (0 until RagDim).map(j => col(s"c$j").as(s"q$j")): _*)
    val dotExpr = (0 until RagDim).map(j => col(s"q$j") * col(s"c$j")).reduce(_ + _)
    val scores = emb.crossJoin(broadcast(queries))
      .select(col("q_doc"), col("q_chunk"), col("doc_id"), dotExpr.as("dot"))
      .groupBy(col("q_doc"), col("q_chunk"), col("doc_id"))
      .agg(max(col("dot")).as("m"))
      .groupBy(col("q_doc"), col("doc_id"))
      .agg(sum(col("m")).as("score"))
    scores.groupBy(col("q_doc"))
      .agg(topKPairs((-col("score")).cast("double"), col("doc_id"), 3).as("tk"))
      .select(col("q_doc"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("q_doc"), col("p.id").as("doc_id"),
        (-col("p.dist")).cast("long").as("score"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("q_doc"), col("rnk"))
  }

  /** Per-source corpus card (q108): the one-page dataset summary a
    * curation pipeline publishes per ingested source — doc/char/token
    * volume, language spread, and how many of the source's docs are
    * byte-exact copies of ANYTHING in the corpus (cross-source: a doc
    * mirrored from another source counts in both cards).
    *
    * Scale shape: per-doc columns are one narrow scan pass; the
    * global copy count groups on md5(text) (32-byte key, partial agg)
    * and joins back on the SAME key; the card itself is a partial-agg
    * groupBy on `source` whose output is #sources rows. The distinct
    * lang count rides the same source-keyed shuffle (two-phase
    * count-distinct), bounded by #langs per source. */
  def corpusCard(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    // planted "mirror" source: the first 10 docs re-ingested verbatim
    // under a new source, so the cross-source dup column has signal
    // (the fixture corpus itself has no byte-exact copies)
    val ingest = d.unionByName(d.filter(col("doc_id") < 10)
      .select((col("doc_id") + 300000L).as("doc_id"), col("text"),
        col("lang"), lit("mirror").as("source"), col("n_chars")))
    val base = ingest.select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
      size(TextAnalysis.tokens(col("text"))).as("n_tokens"),
      md5(col("text")).as("h"))
    val copies = base.groupBy(col("h")).agg(count(lit(1)).as("n_copies"))
    base.join(copies, Seq("h"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
      .orderBy(col("source"))
  }

  /** Gopher-style repetition metrics per document (q64). The flag is
    * computed from the ROUNDED fractions so the oracle engine flags
    * identically; int-cast because the gate's normalizer hashes ints
    * more portably than booleans. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(spread(docs(spark, dir)))
      .withColumn("repetitive", col("repetitive").cast("int"))
      .select(col("doc_id"), col("top1gram_frac"), col("top2gram_frac"),
        col("top3gram_frac"), col("repetitive"))
      .orderBy(col("doc_id"))

  /** Substring-level (8-token chunk-hash) duplication stats (q69):
    * the 50 most chunk-contaminated documents. */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.chunkDupStats(spread(docs(spark, dir)), k = 8)
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"), col("dup_frac"))
      .orderBy(col("dup_frac").desc, col("doc_id"))
      .limit(50)

  /** Exact-substring span removal (q74): cut every cross-document
    * duplicated 8-token chunk span, keeping the smallest-doc-id
    * canonical occurrence; the cleaned text ships as an md5 so the
    * driver gate hashes a scalar, with the removal counts alongside.
    * TOTAL over documents (null text stays a null-stat row). */
  def dedupSpanRemoval(spark: SparkSession, dir: String): DataFrame =
    Dedup.removeDupSpans(spread(docs(spark, dir)), k = 8)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        md5(col("cleaned_text")).as("cleaned_md5"))
      .orderBy(col("doc_id"))

  /** Corpus-unigram NLL quality score per document (q70). */
  def unigramNll(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramNllScores(spread(docs(spark, dir)))
      .orderBy(col("doc_id"))

  /** Per-language keep rates for q71: downsample the dominant English,
    * thin Chinese, keep the rest — a typical mixture-rebalancing spec. */
  val MixtureRates: Map[String, Double] =
    Map("en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 0.75, "zh" -> 0.25)

  /** Deterministic mixture resampling over `lang` (q71). */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixtureSample(
      t(spark, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
      MixtureRates)
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
      .orderBy(col("doc_id"))

  /** Per-source contribution quota (q72): at most 15 docs per source,
    * chosen deterministically by (bucket, doc_id). */
  def sourceQuota(spark: SparkSession, dir: String): DataFrame =
    Sampling.quotaCap(
      t(spark, dir, "documents").select(col("doc_id"), col("source")),
      maxPerGroup = 15)
      .orderBy(col("source"), col("bucket"), col("doc_id"))

  /** Sequence packing into 512-token training bins (q73). */
  def seqPack(spark: SparkSession, dir: String): DataFrame =
    Sampling.packSequences(docs(spark, dir), budget = 512L)
      .orderBy(col("doc_id"))

  /** Dup-planted embeddings corpus for q82: exact copies of vec_id < 25
    * under shifted ids. Semantic dedup must drop each copy (cosine 1.0
    * to its original, same cluster by construction) and keep the
    * natural corpus (max natural pair similarity ≈ 0.51 at sf0.01,
    * far under the 0.9 threshold). */
  private def embCorpus(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    e.unionByName(e.filter(col("vec_id") < 25)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
  }

  /** SRP (random-hyperplane) signature pairs (q103): 32-bit cosine
    * sketches of the dup-planted embeddings corpus, paired by the
    * exact banded hamming join — the embedding-geometry counterpart
    * of q97, and (unlike the recall-gated q56 LSH tier) value-oracled
    * because both the signature and the block cover are exact. */
  def srpPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = spread(embCorpus(spark, dir))
      .select(col("vec_id"), Similarity.srpSignature(col("embedding")).as("sig"))
    Dedup.simhashNearDupPairs(sigs, maxHamming = 1, nBands = 2,
        idCol = "vec_id", hashCol = "sig")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q184: the near-dup SCALE tier itself, hash-oracled — q45's
    * default path above [[Dedup.EmbeddingExactThreshold]] forced onto
    * the fixture via `exactThreshold = 0` (32-bit SRP sketch → 8-bit
    * pigeonhole block equi-join → hamming ≤ 3 → true-cosine rescore →
    * top-20). Every stage is DuckDB-expressible (srpSigSql is the
    * proven q103 twin; banding/hamming are integer bit math; the
    * rescore is q45's cosine), so the tier that actually runs at 100
    * TB is equality-gated, not only spec-gated — the q127/q132
    * serve-the-scale-path-through-the-oracle pattern. */
  def srpNearDupTier(spark: SparkSession, dir: String): DataFrame =
    // the dup-planted corpus (q103's): 25 exact-copy pairs guarantee
    // the tier has real signal to rank, not just incidental hamming
    // coincidences among random vectors
    Dedup.embeddingNearDupPairs(embCorpus(spark, dir), topN = 20,
      exactThreshold = 0L)

  /** q185: the WIDE near-dup tier (64-bit SRP sketch / 16-bit
    * pigeonhole blocks — what [[Dedup.SrpWideThreshold]] auto-selects
    * past 200k rows) forced onto the fixture and hash-oracled like
    * q184. The two gates together pin BOTH automatic operating points
    * of the default near-dup scale path; bit 63's two's-complement
    * SQL term is the only cross-engine subtlety (see srpSigSqlBits). */
  def srpWideNearDupTier(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupPairs(embCorpus(spark, dir), topN = 20,
      exactThreshold = 0L, srpWideThreshold = 0L)

  /** Stratified exact-proportion split (q104): per-label 10/10/80
    * test/val/train over the embeddings, cut at exact integer
    * boundaries in deterministic id-hash order. */
  def stratSplit(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSplit(
      spread(t(spark, dir, "embeddings").select(col("vec_id"), col("label"))),
      col("label"), testPct = 10, valPct = 10)
      .orderBy(col("vec_id"))

  /** SemDeDup-style semantic dedup (q82): deterministic seed-medoid
    * clustering (k=8) + within-cluster cosine pruning at 0.9. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.semanticDedup(embCorpus(spark, dir), k = 8, simThreshold = 0.9)
      .withColumn("keep", col("keep").cast("int"))
      .orderBy(col("vec_id"))

  /** Hashed linear quality scorer (q83): fastText-shaped feature-hash
    * scoring as one pure column expression — no explode, no shuffle.
    * The gate checks the exact integer `score_fp` (the rounded
    * per-token mean can land on a .5 tie that HALF_UP and libm-style
    * rounding resolve differently across engines — one such row exists
    * at sf0.01). */
  def hashedQuality(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.withHashedLinearScore(spread(docs(spark, dir)))
      .select(col("doc_id"), col("n_tokens"), col("score_fp"),
        col("keep").cast("int").as("keep"))
      .orderBy(col("doc_id"))

  /** Temperature-scaled language mixture weights (q84): α = 0.5 over
    * the (skewed) language distribution, corpus budget 50% — English
    * dominance flattens toward the tail languages. */
  def sourceTemperature(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureWeights(
      t(spark, dir, "documents").select(col("doc_id"), col("lang")),
      alpha = 0.5, budgetFrac = 0.5, stratumCol = "lang")
      .select(col("lang"), col("n_docs"),
        (col("weight") + lit(0.0)).as("weight"), (col("rate") + lit(0.0)).as("rate"))
      .orderBy(col("lang"))

  /** Curriculum ordering (q85): global rank by (quality_score DESC,
    * doc_id) via the distributed prefix rank — no single-partition
    * window. */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame =
    Sampling.curriculumRank(
      TextAnalysis.withTextStats(spread(docs(spark, dir))), col("quality_score"))
      .select(col("doc_id"), (col("score") + lit(0.0)).as("quality_score"),
        col("rank").as("curriculum_rank"))
      .orderBy(col("curriculum_rank"))

  /** Per-label embedding centroids (q86): class prototypes via map-side
    * fixed-point component sums. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroids(t(spark, dir, "embeddings"))
      .withColumn("centroid", col("centroid") + lit(0.0))
      .orderBy(col("label"), col("pos"))

  /** Int8 scalar quantization of the embeddings corpus (q87): symmetric
    * per-dimension max-abs scales, codes in [-127, 127], per-vector
    * reconstruction MSE. */
  def int8Quantize(spark: SparkSession, dir: String): DataFrame =
    Similarity.int8Quantize(t(spark, dir, "embeddings"))
      .select(col("vec_id"),
        array_join(col("codes").cast("array<string>"), ",").as("codes_csv"),
        (col("mse") + lit(0.0)).as("mse"))
      .orderBy(col("vec_id"))

  /** Winnowing-minimizer duplication stats (q88) over the dup-planted
    * corpus: the chunk-dedup signal of q69 at ~2/(w+1) of the
    * fingerprint volume. */
  def winnowDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowDupStats(spread(corpus(spark, dir)), k = 8, w = 4)
      .select(col("doc_id"), col("n_chunks"), col("n_minimizers").cast("long").as("n_minimizers"),
        col("n_dup_minimizers"), (col("dup_frac") + lit(0.0)).as("dup_frac"))
      .orderBy(col("dup_frac").desc, col("doc_id")).limit(50)

  /** Cross-source shingle-overlap matrix (q89): shared distinct
    * 3-shingles and Jaccard per source pair. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    Dedup.crossSourceOverlap(
      spread(t(spark, dir, "documents").select(col("source"), col("text"))), k = 3)
      .select(col("src_a"), col("src_b"), col("n_shared"),
        (col("jaccard") + lit(0.0)).as("jaccard"))
      .orderBy(col("jaccard").desc, col("src_a"), col("src_b"))

  /** Semantic decontamination (q96): max embedding cosine of every
    * training vector against the held-out benchmark slice
    * (vec_id % 25 == 0), with the contamination flag at τ = 0.8 —
    * the embedding-space twin of q59's shingle decontamination. */
  def semanticDecon(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    Similarity.semanticDecontaminate(
      spread(e.filter(col("vec_id") % 25 =!= 0)),
      e.filter(col("vec_id") % 25 === 0), tau = 0.8)
      .orderBy(col("vec_id"))
  }

  /** Corpus-bigram NLL quality score per document (q95): chain-rule
    * perplexity signal one order up from q70. */
  def bigramNll(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramNllScores(spread(docs(spark, dir)))
      .orderBy(col("doc_id"))

  /** Balanced shard assignment (q91): size-ranked round-robin deal of
    * the corpus into 8 training shards, summarized per shard. */
  def shardPlan(spark: SparkSession, dir: String): DataFrame = {
    val sized = spread(docs(spark, dir))
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    Sampling.shardAssign(sized, nShards = 8, sizeCol = col("n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("size")).as("sum_tokens"))
      .orderBy(col("shard"))
  }

  // ------------------------------------------------------------- oracles

  /** DuckDB twin of Similarity.srpSignature: per bit b, the sign of
    * the embedding's dot with the deterministic ±1 hyperplane derived
    * from the quadratic modular mix of (b, j). Bit 63 contributes the
    * BIGINT minimum (two's complement: a long with the sign bit set is
    * −2^63 plus its positive low bits, so the term SUM reproduces the
    * engine's `sig |= 1L << 63` exactly without overflowing). */
  private def srpSigSqlBits(nBits: Int): String = (0 until nBits).map { b =>
    val x = s"(${(b + 7).toLong * 1000003L} + j * 10007)"
    val sgn = s"(CASE WHEN (((($x * $x) % 1000000007) * 48271 + $x * 16807) " +
      s"% 2147483647) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
    val term = if (b == 63) "(-9223372036854775807 - 1)" else s"${1L << b}"
    s"(CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1), " +
      s"j -> CAST(embedding[j] AS DOUBLE) * $sgn)) > 0 THEN $term ELSE 0 END)"
  }.mkString(" + ")

  private def srpSigSql: String = srpSigSqlBits(32)

  private def simhashSumsSql(bits: Int = 32): String =
    (0 until bits).map(b =>
      s"sum(CASE WHEN ((tid * ${Dedup.simA(b)} + ${Dedup.simB(b)}) % $P) % 2 = 1 THEN cnt ELSE -cnt END) AS s$b")
      .mkString(", ")
  // bit 63's term is Long.MinValue, which has no BIGINT literal
  // (9223372036854775808 overflows before negation) — the srpSigSql
  // idiom spells it (-max - 1); DuckDB's left-assoc sum stays in-range
  // because bits 0..62 total < 2^63 before the negative term lands
  private def simhashBitsSql(bits: Int = 32): String =
    (0 until bits).map(b =>
      if (b == 63) "(CASE WHEN s63 > 0 THEN (-9223372036854775807 - 1) ELSE 0 END)"
      else s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")

  /** Shared by q138 (single-store probe) and q180 (merged half-store
    * probe): DuckDB re-derives both signature sets and the cross-split
    * band join from the corpus — the serving layout (one store vs a
    * merge of two) must be invisible in the answer. */
  private lazy val incrementalProbeOracle: String =
    s"""WITH $corpusSql,
       |${shinglesCte("corpus")},
       |$shingleIdsCte,
       |sigs AS (SELECT doc_id, $sigExprSql AS sig FROM dsi GROUP BY doc_id),
       |bands AS (SELECT doc_id, sig, bb.b AS band, list_slice(sig, bb.b * $RowsPerBand + 1, bb.b * $RowsPerBand + $RowsPerBand) AS bandsig
       |          FROM sigs CROSS JOIN (SELECT unnest([${(0 until Bands).mkString(",")}]) AS b) bb),
       |cand AS (SELECT DISTINCT x.doc_id AS batch_id, y.doc_id AS store_id, x.sig AS sa, y.sig AS sb
       |         FROM bands x JOIN bands y ON x.band = y.band AND x.bandsig = y.bandsig
       |         WHERE x.doc_id >= 100000 AND y.doc_id < 100000)
       |SELECT batch_id, store_id, $estJaccardSql AS est_jaccard
       |FROM cand WHERE $estJaccardSql >= 0.5
       |ORDER BY batch_id, store_id""".stripMargin

  /** Learned linear quality filter (q186): train a batch perceptron
    * ON the cluster — the distributable core of the fastText-style
    * model filters (CCNet, RefinedWeb) with EXACT integer arithmetic,
    * so the DuckDB twin replays the whole training run (unrolled
    * epoch CTEs) bit-for-bit. The supervision is distant: docs whose
    * mean token length is confidently short (10·chars < 52·tokens)
    * are labeled +1, confidently long (> 56·tokens) −1, and the
    * ambiguous band ABSTAINS from the training set — the standard
    * weak-labeling recipe, and what makes the problem separable with
    * a real margin. Features are token count and the DECORRELATED
    * excess-chars residual (chars − 5·tokens): raw (tokens, chars)
    * are ~0.98-correlated, which crushes the perceptron margin/radius
    * ratio and stalls convergence (measured: oscillation at 154
    * errors; residualized it hits 0 by epoch 7-8 at every sf). Emits
    * the per-epoch weight trajectory + misclassification count — the
    * learning curve the pipeline gate reads, which must reach 0 on
    * separable data. */
  def linearFilter(spark: SparkSession, dir: String): DataFrame = {
    val feats = lfFeatures(spark, dir).filter(col("y") =!= 0L)
    TextAnalysis.batchPerceptron(
        feats, Seq("n_tokens", "excess_chars"), "y", epochs = LfEpochs)
      .orderBy(col("epoch"))
  }

  /** Shared q186/q187/q190 feature frame: distant band label y
    * (+1 confidently-short mean token length, −1 confidently-long,
    * 0 abstain) plus the decorrelated (n_tokens, excess_chars)
    * features — ALL docs, abstentions included. */
  private def lfFeatures(spark: SparkSession, dir: String): DataFrame =
    spread(t(spark, dir, "documents"))
      .select(length(col("text")).cast("long").as("nc"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .select(
        when(lit(10L) * col("nc") < lit(52L) * col("nt"), 1L)
          .when(lit(10L) * col("nc") > lit(56L) * col("nt"), -1L)
          .otherwise(0L).as("y"),
        col("nt").as("n_tokens"),
        (col("nc") - lit(5L) * col("nt")).as("excess_chars"))

  /** Final trained weights of the q186 perceptron, memoized
    * content-keyed (the q175 PQ-model pattern): training is 10 epochs
    * × one full-corpus aggregate each, and THREE queries consume the
    * same weights (q186 emits the trajectory; q187 applies; q190
    * calibrates) — without the memo q187/q190 each retrain from
    * scratch, and bench repeats multiply it. The weight file is a
    * 3-long pipe-joined line under the documents table's content
    * fingerprint, atomic-rename written, so later JVMs (bench rounds,
    * Verify) load instead of retraining; a fixture rewrite changes
    * the fingerprint and invalidates. q186 itself still runs the
    * training (its OUTPUT is the learning curve). */
  private def lfTrainedWeights(spark: SparkSession, dir: String): Seq[Long] = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // training config rides in the store label (r14 advisor): a new
    // epoch count or feature recipe (v1 = distant 5.2/5.6 band over
    // n_tokens/excess_chars) must invalidate the memoized weights
    val base = Scratch.dir(spark, dir, s"lf-weights-e$LfEpochs-v1", "documents")
    val f = Paths.get(s"$base/weights.txt")
    Scratch.writeOnce(base) {
      if (!Files.exists(f)) {
        val trained = linearFilter(spark, dir).orderBy(col("epoch").desc).head()
        Files.createDirectories(f.getParent)
        val tmp = Files.createTempFile(f.getParent, "w-", ".tmp")
        Files.writeString(tmp,
          s"${trained.getLong(1)}|${trained.getLong(2)}|${trained.getLong(3)}")
        Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
      }
    }
    Files.readString(f).trim.split("\\|").toSeq.map(_.toLong)
  }

  /** Apply the q186-trained filter to the WHOLE corpus (q187) —
    * including the rows the distant labeler abstained on, which is
    * the point of training a model at all: it decides the band no
    * rule covered. Output: per (band label, keep) cell counts with
    * exact integer margin extrema — the acceptance audit a pipeline
    * reads before turning a learned filter on (the y=0 rows' split
    * shows where the learned boundary landed inside the band; any
    * keep=false under y=+1 would be a train/apply skew bug). */
  def linearFilterApply(spark: SparkSession, dir: String): DataFrame = {
    val weights = lfTrainedWeights(spark, dir)
    TextAnalysis.linearFilterScore(
        lfFeatures(spark, dir), Seq("n_tokens", "excess_chars"), weights)
      .groupBy(col("y"), col("keep"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("margin")).as("min_margin"), max(col("margin")).as("max_margin"))
      .orderBy(col("y"), col("keep"))
  }

  /** Operating-point calibration sweep for the q186-trained filter
    * (q190): confusion counts against the distant band labels at every
    * threshold of a symmetric exponential (4^k) grid — the exact-
    * integer PR curve a pipeline reads to pick the filter's keep
    * threshold (margin > 0 is just ONE operating point; shifting it
    * trades the band split). One corpus pass: rows fan out over the
    * broadcast 35-threshold grid and collapse into map-side partial
    * aggregates, so the exchange is 35 rows of six BIGINTs at any
    * corpus size. */
  def filterCalibration(spark: SparkSession, dir: String): DataFrame = {
    val weights = lfTrainedWeights(spark, dir)
    def cell(cond: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(when(cond, 1L).otherwise(0L))
    TextAnalysis.linearFilterScore(
        lfFeatures(spark, dir), Seq("n_tokens", "excess_chars"), weights)
      .select(col("y"), col("margin"), explode(lit(CalibThresholds)).as("thr"))
      .groupBy(col("thr"))
      .agg(
        cell(col("y") === 1L && col("margin") > col("thr")).as("tp"),
        cell(col("y") === -1L && col("margin") > col("thr")).as("fp"),
        cell(col("y") === 1L && col("margin") <= col("thr")).as("fn"),
        cell(col("y") === -1L && col("margin") <= col("thr")).as("tn"),
        cell(col("y") === 0L && col("margin") > col("thr")).as("band_keep"))
      .orderBy(col("thr"))
  }

  /** q190's threshold grid: 0 and ±4^k for k in 0..16 — exponential
    * so one sweep covers margin scales from single tokens to the
    * full-corpus weight magnitudes (weights grow with corpus size). */
  private val CalibThresholds: Array[Long] = {
    val pos = (0 to 16).map(k => 1L << (2 * k))
    (pos.map(-_) ++ Seq(0L) ++ pos).sorted.toArray
  }

  /** DSIR hashed-unigram importance filter (q188): fit the raw/target
    * hashed-unigram bucket distributions with lang='en' as the target
    * domain ([[Sampling.dsirImportance]] — Xie et al. 2023), score
    * every document with the exact-integer linearized likelihood-ratio
    * surrogate, and report the per-(lang, keep) acceptance audit with
    * exact score extrema. The distribution-MATCHING counterpart of the
    * q83/q186 classifier filters: no labels, just "weigh documents by
    * how much their token mass looks like the target domain". Fit
    * shuffles 1024 bucket rows; scoring is a zero-shuffle narrow pass
    * (model ships as two array literals); the audit exchange is ten
    * rows. */
  def dsirFilter(spark: SparkSession, dir: String): DataFrame =
    Sampling.dsirImportance(
        spread(t(spark, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"))),
        isTarget = col("lang") === "en", buckets = DsirBuckets)
      .groupBy(col("lang"), (col("score") > 0L).as("keep"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))
      .orderBy(col("lang"), col("keep"))

  /** The q189 selection preview: the 50 most target-like documents by
    * DSIR importance (score desc, doc_id tie-break) — the head of the
    * keep-list when the resampling retains a top fraction. TakeOrdered
    * (per-partition heaps), not a global sort. */
  def dsirTopK(spark: SparkSession, dir: String): DataFrame =
    Sampling.dsirImportance(
        spread(t(spark, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"))),
        isTarget = col("lang") === "en", buckets = DsirBuckets)
      .select(col("doc_id"), col("lang"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50)

  private val DsirBuckets = 1024

  /** Distinct-n lexical diversity league table (q191): per source,
    * total vs distinct unigram/bigram counts and the exact fixed-point
    * distinct-1/distinct-2 ratios ([[TextAnalysis.distinctNgramStats]]
    * — Li et al. 2016's mode-collapse screen, the first audit run on
    * synthetic/generated corpora before they enter a training mix). */
  def distinctNgrams(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.distinctNgramStats(
        spread(t(spark, dir, "documents").select(col("source"), col("text"))))
      .orderBy(col("source"))

  /** Content-defined-chunking storage-dedup league table (q192):
    * per source, total vs distinct vs NOVEL chunk volume under
    * LBFS/FastCDC-style content-defined boundaries
    * ([[graft.operators.Dedup.cdcChunkStats]], w=8 chars, divisor 32)
    * — the storage-dedup view of corpus redundancy, robust to
    * insertions where fixed-stride chunking (q69) is not. */
  def cdcChunkCard(spark: SparkSession, dir: String): DataFrame =
    Dedup.cdcChunkStats(
        spread(t(spark, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"))))
      .orderBy(col("source"))

  /** q198's gated-sample fraction (per-10k): the exact-truth leg runs
    * on a seeded HALF-corpus sample — the 100 TB shape made real (an
    * uncapped exact-Jaccard pass over the full corpus is
    * fixture-only; the sampled card estimates the same per-tier pair
    * quality at ~frac² of the truth-join cost). Deterministic
    * md5(seed:doc_id) predicate, replayed verbatim by the DuckDB
    * twin. */
  private val TierEvalSampleFracPer10k = 5000L
  private val TierEvalSampleSeed = "q198"

  /** Per-tier recall gates for the q198 card (per-10k scale).
    * minhash_lsh is THE near-dup coverage tier — its whole job
    * against the Jaccard ≥ 0.5 truth is recall, so it carries the
    * repo-wide 0.70 bar (measured 0.98–1.00 at both fixtures).
    * simhash_h1 and chunk_k8 carry a deliberate 0.50 bar each — the
    * adjudicated "this tier alone is not a near-dup pass" line,
    * still failing loudly if coverage collapses: simhash at
    * hamming ≤ 1 of a 32-bit sketch is a STRICT-similarity tier
    * (≈ cosine ≥ 0.99 of the term vector) that by design misses the
    * 0.5–0.8 Jaccard band (measured 0.89 recall at sf0.01 but 0.57
    * at sf0.1, where longer near-miss variants flip > 1 sketch bit
    * — with 1.1% precision there; the card exists to SHOW that),
    * and chunk_k8 is the containment-style tier for copy-paste
    * spans whole-doc similarity under-reports (high precision,
    * partial whole-doc recall — 0.69–1.0 measured).
    *
    * simhash_h7_64 (r14 verdict item 4) is the WIDE simhash
    * operating point — 64-bit sketch, hamming ≤ 7 over an 8×8-bit
    * pigeonhole cover (the [[graft.operators.Dedup.SrpWideThreshold]]
    * widening applied to the token simhash) — and carries the
    * repo-wide 0.70 bar: measured 1.00 recall at sf0.01 / 0.96 at
    * sf0.1 vs h1's 0.89 / 0.57, with the banded equi-join cost
    * intact (8-bit blocks ≈ n/256 bucket occupancy). The operating
    * point came from a DuckDB sweep of the full hamming grid against
    * the sampled truth at sf0.1: h≤3/64-bit (the first candidate
    * widening) reads 0.62 recall at 0.70 precision — a fine
    * precision-first point but NOT a coverage tier — h≤5 reads 0.89
    * (clears, thin headroom on a bar that decays with doc length),
    * h≤7 reads 0.963 at 2.4% precision: candidate-tier economics
    * (recall is the job; survivors feed an exact verifier, q147's
    * pattern). h1 stays in the card as the documented strict tier. */
  private val TierEvalGates: Map[String, Long] =
    Map("minhash_lsh" -> 7000L, "simhash_h1" -> 5000L,
      "simhash_h7_64" -> 7000L, "chunk_k8" -> 5000L)

  /** Sampled exact-truth pair set shared by the q198/q199 eval cards
    * (doc_a < doc_b with true 3-shingle Jaccard ≥ 0.5 over the seeded
    * half-corpus sample), persisted content-keyed (the q175/orc
    * pattern): truth is a one-time evaluation artifact — without the
    * store BOTH cards re-derive the same uncapped exact-Jaccard pass
    * per call and bench repeats measure truth re-derivation instead
    * of the tier legs. Built once per fixture content under
    * writeOnce; later JVMs read the parquet. */
  private def sampledTruthPairs(spark: SparkSession, dir: String): DataFrame = {
    // the PRODUCING parameters ride in the store label (r14 advisor):
    // content-keying alone covers only the fixture — a future change
    // to the sample frac/seed or jaccard cutoff must invalidate the
    // cached truth, not silently serve the old operating point's
    val base = Scratch.dir(spark, dir,
      s"tier-eval-truth-f$TierEvalSampleFracPer10k-s$TierEvalSampleSeed-j5000",
      "documents")
    Scratch.writeOnce(base) {
      if (!new java.io.File(s"$base/data/_SUCCESS").exists()) {
        Dedup.ngramJaccardPairsFromShingles(
            Dedup.docSample(corpusShingles(spark, dir),
              TierEvalSampleFracPer10k, TierEvalSampleSeed),
            maxShingleFreq = 0)
          .filter(col("jaccard") >= 0.5)
          .select(col("doc_a"), col("doc_b"))
          .write.mode("overwrite").parquet(s"$base/data")
      }
    }
    spark.read.parquet(s"$base/data")
  }

  /** One cached candidate-pair leg of the q198 card: parquet under a
    * PARAM-carrying Scratch label, the truth-leg pattern applied to
    * every leg (r15 verdict item 4) — pair generation is a one-time
    * evaluation artifact per (fixture content, producing parameters),
    * so a warm card evaluation is pure fused eval over four tiny
    * parquet reads instead of four pair-generation job chains. The
    * producing parameters ride in the label: a future change to a
    * tier's operating point invalidates ITS cache, never silently
    * serves the old one. */
  private def cachedPairLeg(spark: SparkSession, dir: String, label: String)
      (build: => DataFrame): DataFrame = {
    val base = Scratch.dir(spark, dir, label, "documents")
    Scratch.writeOnce(base) {
      if (!new java.io.File(s"$base/data/_SUCCESS").exists())
        build.select(col("doc_a"), col("doc_b"))
          .write.mode("overwrite").parquet(s"$base/data")
    }
    spark.read.parquet(s"$base/data")
  }

  /** BOTH simhash legs as cached artifacts off ONE sketch aggregation
    * (simhashBoth: the 64-bit family's first 32 hash functions ARE
    * the 32-bit family) — the shared-pass economy only matters on the
    * cold build; warm cards read the two pair parquets directly. */
  private def cachedSimhashLegs(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val frac = TierEvalSampleFracPer10k; val seed = TierEvalSampleSeed
    val b32 = Scratch.dir(spark, dir, s"tier-sim32-h1-b2-f$frac-s$seed", "documents")
    val b64 = Scratch.dir(spark, dir, s"tier-sim64-h7-b8-f$frac-s$seed", "documents")
    Scratch.writeOnce(s"$b32|$b64") {
      val need32 = !new java.io.File(s"$b32/data/_SUCCESS").exists()
      val need64 = !new java.io.File(s"$b64/data/_SUCCESS").exists()
      if (need32 || need64) {
        val sk = Dedup.simhashBoth(
            Dedup.docSample(corpusTokenCounts(spark, dir), frac, seed))
          .localCheckpoint(true)
        if (need32)
          Dedup.simhashNearDupPairs(sk.select(col("doc_id"), col("simhash32")),
              maxHamming = 1, nBands = 2, hashCol = "simhash32")
            .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
            .write.mode("overwrite").parquet(s"$b32/data")
        if (need64)
          Dedup.simhashNearDupPairs(sk.select(col("doc_id"), col("simhash64")),
              maxHamming = 7, nBands = 8, hashCol = "simhash64", bits = 64)
            .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
            .write.mode("overwrite").parquet(s"$b64/data")
        graft.plans.Blocks.release(sk)
      }
    }
    (spark.read.parquet(s"$b32/data"), spark.read.parquet(s"$b64/data"))
  }

  /** Per-tier recall gates for the q199 threshold sweep (per-10k).
    * The sweep's tiers are NESTED (one candidate set filtered at
    * rising est_jaccard bars), so recall is monotone nonincreasing by
    * construction — the gates pin each operating point's coverage
    * against the fixed jaccard ≥ 0.5 truth: the 0.25 and 0.50 bars
    * are coverage tiers (0.70 — at 16 minhashes a true ≥ 0.5 pair
    * estimates ≥ 0.5 with high probability), while 0.75 deliberately
    * trades the 0.5–0.75 band away for precision (documented 0.30
    * bar — the "high-precision prefilter" operating point). */
  private val SweepGates: Map[String, Long] =
    Map("lsh_t2500" -> 7000L, "lsh_t5000" -> 7000L, "lsh_t7500" -> 3000L)

  /** LSH operating-point sweep card (q199): precision/recall of the
    * MinHash-LSH candidate tier at est_jaccard ≥ {0.25, 0.50, 0.75}
    * against the sampled exact truth (jaccard ≥ 0.5) — the PR-curve a
    * pipeline reads to pick the dedup tier's threshold, the pair-set
    * sibling of q190's filter calibration. ONE banding join produces
    * the 0.25-threshold candidate set (est_jaccard rides along); the
    * higher tiers are filters over it, so the sweep costs one tier
    * plus two predicates. Same seeded doc sample and per-tier gate
    * discipline as q198; `pass_recall_monotone` pins the nesting
    * invariant (recall nonincreasing as the bar rises) in-card. */
  def dedupThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val frac = TierEvalSampleFracPer10k
    val truth = sampledTruthPairs(spark, dir).localCheckpoint(true)
    // the 0.25-threshold candidate set (est_jaccard rides along for
    // the tier filters) is a param-keyed Scratch artifact like every
    // q198 leg — warm sweeps are three predicates over one tiny
    // parquet read; the cold build's sampled signatures are a filter
    // of the cached full-corpus artifact (signatures are doc-local),
    // never a re-aggregation
    val candBase = Scratch.dir(spark, dir,
      s"tier-lsh-sweep-t2500-f$frac-s$TierEvalSampleSeed", "documents")
    Scratch.writeOnce(candBase) {
      if (!new java.io.File(s"$candBase/data/_SUCCESS").exists())
        Dedup.lshCandidatePairs(
            Dedup.docSample(corpusSignatures(spark, dir), frac, TierEvalSampleSeed),
            threshold = 0.25)
          .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
          .write.mode("overwrite").parquet(s"$candBase/data")
    }
    val cand = spark.read.parquet(s"$candBase/data")
    val tiers = Seq(2500, 5000, 7500).map { t =>
      (s"lsh_t$t", cand.filter(col("est_jaccard") >= t / 10000.0))
    }
    // constant partition key: the frame is 3 rows by construction, but
    // an UNpartitioned window is the repo's no-go idiom (and warns) —
    // partitionBy(lit) keeps the plan warning-free at zero cost
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit("sweep")).orderBy(col("tier"))
    val out = Dedup.evalPairSets(tiers, truth, gatesPer10k = SweepGates)
      .withColumn("sample_frac_per_10k", lit(frac))
      // NULL recall (n_truth=0 on a degenerate sample) must compare as
      // a FAILED invariant (0), matching the DuckDB twin's CASE ELSE 0
      // — a bare boolean cast yields NULL, which Verify's min() would
      // silently skip (r14 advisor)
      .withColumn("pass_recall_monotone",
        when(lag(col("recall_per_10k"), 1).over(w).isNull, 1L)
          .otherwise(coalesce(
            (col("recall_per_10k") <= lag(col("recall_per_10k"), 1).over(w))
              .cast("long"), lit(0L))))
      .orderBy(col("tier"))
      .localCheckpoint(true)
    graft.plans.Blocks.release(truth)
    out
  }

  /** Dedup candidate-tier evaluation card (q198): precision/recall of
    * the MinHash-LSH (est_jaccard ≥ 0.5), strict SimHash (32-bit,
    * hamming ≤ 1, 2×16-bit blocks), wide SimHash (64-bit, hamming ≤ 7,
    * 8×8-bit blocks) and chunk candidate tiers against EXACT truth —
    * all sampled-corpus pairs with true 3-shingle Jaccard ≥ 0.5
    * ([[graft.operators.Dedup.evalPairSets]]). The "which tier at
    * what miss cost" decision table. ALL legs (truth and tiers) run
    * on the same seeded doc sample ([[graft.operators.Dedup
    * .docSample]], both pair endpoints sampled) — the q56 pattern,
    * so the card's cost is bounded at any corpus size; the
    * `sample_frac_per_10k` column records the operating point. Each
    * tier carries its deliberate recall gate ([[TierEvalGates]]);
    * Verify's sibling-gate rule turns that into a per-tier margin
    * gate in RECALL.json. All three pair sets are individually
    * oracled full-corpus (q41/q43/q97), so the eval composition is
    * too. */
  def dedupTierEval(spark: SparkSession, dir: String): DataFrame = {
    val frac = TierEvalSampleFracPer10k; val seed = TierEvalSampleSeed
    def sampledByDoc(df: DataFrame) = Dedup.docSample(df, frac, seed)
    // EVERY leg — truth AND the four candidate tiers — is a
    // param-keyed Scratch artifact (r15 verdict item 4): pair
    // generation runs once per (fixture content, operating point) and
    // a warm card evaluation is the fused broadcast-scored eval over
    // five tiny parquet reads. Cold builds still run as INDEPENDENT
    // concurrent Spark jobs (the VectorIndex.build graph∥ring idiom —
    // measured r15: one collapsed DAG read 8.5 s warm vs 4.4 s for
    // explicit concurrent legs), with both simhash tiers coming off
    // ONE sketch aggregation (cachedSimhashLegs).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fTruth = Future {
      sampledTruthPairs(spark, dir).localCheckpoint(true)
    }
    val fLsh = Future {
      // signatures are doc-local, so the sampled signature set is a
      // FILTER of the cached full-corpus artifact — bit-identical to
      // signing the sampled shingles, without re-running the 16-min
      // aggregation on the cold build
      cachedPairLeg(spark, dir, s"tier-lsh-t5000-f$frac-s$seed") {
        Dedup.lshCandidatePairs(
          sampledByDoc(corpusSignatures(spark, dir)), threshold = 0.5)
      }
    }
    val fSims = Future { cachedSimhashLegs(spark, dir) }
    val fChunk = Future {
      cachedPairLeg(spark, dir, s"tier-chunk-k8-f$frac-s$seed") {
        Dedup.chunkPairs(sampledByDoc(spread(corpus(spark, dir))), k = 8)
      }
    }
    val truth = Await.result(fTruth, Duration.Inf)
    val lsh = Await.result(fLsh, Duration.Inf)
    val (simhash, simhash64) = Await.result(fSims, Duration.Inf)
    val chunk = Await.result(fChunk, Duration.Inf)
    val out = Dedup.evalPairSets(
        Seq(("minhash_lsh", lsh), ("simhash_h1", simhash),
          ("simhash_h7_64", simhash64), ("chunk_k8", chunk)),
        truth, gatesPer10k = TierEvalGates)
      .withColumn("sample_frac_per_10k", lit(frac))
      .orderBy(col("tier"))
      .localCheckpoint(true)
    graft.plans.Blocks.release(truth)
    out
  }

  /** ORC round-trip fidelity gate (q197): write the corpus to ORC
    * (Spark's second columnar format — the interchange target when a
    * downstream stack is Hive/Trino-shaped), read it back, and emit a
    * per-source content checksum the oracle computes over the ORIGINAL
    * parquet — so a green row proves the ORC encode/decode preserved
    * every (doc_id, lang, text) byte. The checksum is a SUM of
    * per-row md5-prefix hashes reduced mod 10^9 (order-independent; a
    * fingerprint any engine reproduces without seeing the ORC side).
    * The modulus is 10^9, not 10^12, because the engines overflow
    * DIFFERENTLY: Spark's BIGINT sum wraps silently while DuckDB
    * promotes to HUGEINT, so the sides would diverge exactly when the
    * sum exceeds 2^63 — at 10^9 the terms keep the signed-64 sum safe
    * to ~9·10^9 rows per source.
    * The ORC copy builds once per fixture content (Scratch.dir) under
    * writeOnce, so bench repeats time the READ path. */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val base = Scratch.dir(spark, dir, "orc-corpus", "documents")
    Scratch.writeOnce(base) {
      if (!new java.io.File(s"$base/data/_SUCCESS").exists())
        t(spark, dir, "documents").write.mode("overwrite").orc(s"$base/data")
    }
    spark.read.orc(s"$base/data")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(conv(substring(md5(concat_ws(":",
            col("doc_id"), col("lang"), col("text"))), 1, 15), 16, 10)
          .cast("long") % 1000000000L).as("content_sum"))
      .orderBy(col("source"))
  }

  /** UniMax language-budget allocation card (q193): per-language token
    * counts water-filled under a 4/5-of-corpus budget at maxEpochs=1
    * ([[graft.operators.Sampling.unimaxAllocation]], Chung et al.
    * 2023) — the low-resource languages fund fully, the dominant
    * language absorbs the integer water level; both branches of the
    * algorithm are live at every fixture sf. */
  def unimaxAlloc(spark: SparkSession, dir: String): DataFrame = {
    val counts = spread(t(spark, dir, "documents"))
      .groupBy(col("lang"))
      .agg(sum(size(TextAnalysis.tokens(col("text"))).cast("long")).as("n_tokens"))
      .localCheckpoint(true)
    val budget = counts.agg(sum(col("n_tokens"))).head().getLong(0) * 4L / 5L
    Sampling.unimaxAllocation(counts, budget, maxEpochs = 1)
      .orderBy(col("lang"))
  }

  /** Directional containment pairs (q194): Broder containment over the
    * dup-planted corpus at the q57 shingle-frequency cap — the
    * doc-inside-doc screen whole-doc Jaccard under-reports
    * ([[graft.operators.Dedup.containmentPairs]]). Exact per-10k
    * integer scores; pairs where either direction ≥ 0.8. */
  def containmentCard(spark: SparkSession, dir: String): DataFrame =
    // reads the shared corpus tokenization ([[corpusShingles]] — the
    // same spread + 3-shingle explode containmentPairs would re-derive
    // per run; q41/q42/q43/q52 already share it): the timed work is
    // the containment kernel, not a fourth re-shingling of the corpus
    Dedup.containmentPairsFromShingles(corpusShingles(spark, dir),
        minContainmentPer10k = 8000L, maxShingleFreq = 6)
      .orderBy(col("doc_a"), col("doc_b"))

  /** The q186 oracle: training unrolled as CTE pairs — u_k sums the
    * misclassified gradient under e_{k-1}'s weights (exact BIGINT),
    * e_k applies it. Generated mechanically so every epoch's SQL is
    * uniform; epoch count and feature lists come from the SAME
    * constants the Spark side uses. */
  private val LfEpochs = 10

  /** Shared training CTE chain for the q186/q187 oracles: f0 (raw
    * counts) → lab (band labels + features) → feats (abstention
    * filtered) → e0..e{LfEpochs} (weights after each epoch). */
  private def linearFilterCtes: String = {
    val epochs = LfEpochs
    val steps = (1 to epochs).map { k =>
      s"""u$k AS (SELECT CAST(COALESCE(SUM(y),0) AS BIGINT) AS g0,
         |  CAST(COALESCE(SUM(y*f1),0) AS BIGINT) AS g1,
         |  CAST(COALESCE(SUM(y*f2),0) AS BIGINT) AS g2,
         |  COUNT(*) AS nw
         |  FROM feats, e${k - 1} WHERE y*(w0 + w1*f1 + w2*f2) <= 0),
         |e$k AS (SELECT w0+g0 AS w0, w1+g1 AS w1, w2+g2 AS w2, u$k.nw AS nw
         |  FROM e${k - 1}, u$k)""".stripMargin
    }.mkString(",\n")
    s"""f0 AS (SELECT CAST(length(text) AS BIGINT) AS nc,
       |  CAST(len($toksSql) AS BIGINT) AS nt FROM documents),
       |lab AS (SELECT CASE WHEN 10*nc < 52*nt THEN 1
       |                    WHEN 10*nc > 56*nt THEN -1 ELSE 0 END AS y,
       |  nt AS f1, nc - 5*nt AS f2 FROM f0),
       |feats AS (SELECT * FROM lab WHERE y <> 0),
       |e0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |  CAST(0 AS BIGINT) AS w2),
       |$steps""".stripMargin
  }

  private def linearFilterOracleSql: String = {
    val rows = (1 to LfEpochs).map { k =>
      s"SELECT CAST($k AS BIGINT) AS epoch, w0 AS w_bias, w1 AS w_n_tokens, " +
        s"w2 AS w_excess_chars, nw AS n_misclassified FROM e$k"
    }.mkString("\nUNION ALL ")
    s"""WITH $linearFilterCtes
       |SELECT * FROM ($rows) ORDER BY epoch""".stripMargin
  }

  private def linearFilterApplyOracleSql: String =
    s"""WITH $linearFilterCtes
       |SELECT y, (w0 + w1*f1 + w2*f2) > 0 AS keep, COUNT(*) AS n_docs,
       |  MIN(w0 + w1*f1 + w2*f2) AS min_margin,
       |  MAX(w0 + w1*f1 + w2*f2) AS max_margin
       |FROM lab, e$LfEpochs GROUP BY 1, 2 ORDER BY y, keep""".stripMargin

  /** Shared q188/q189 oracle CTE chain: tokens -> md5-prefix buckets ->
    * per-bucket raw/target counts -> totals -> per-doc exact-integer
    * importance scores (the same linearized likelihood-ratio surrogate
    * [[graft.operators.Sampling.dsirImportance]] computes). */
  private def dsirCtes: String =
    s"""toks AS (SELECT doc_id, lang, unnest($toksSql) AS tok FROM documents),
       |bk AS (SELECT doc_id, lang,
       |  CAST(('0x' || substr(md5(tok), 1, 15))::UBIGINT % $DsirBuckets AS BIGINT) AS bkt
       |  FROM toks),
       |stats AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cr,
       |  CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS ct FROM bk GROUP BY bkt),
       |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM stats),
       |dscore AS (SELECT bk.doc_id, any_value(bk.lang) AS lang,
       |  CAST(sum(s.ct * t.nr - s.cr * t.nt) AS BIGINT) AS score
       |  FROM bk JOIN stats s ON bk.bkt = s.bkt CROSS JOIN tot t
       |  GROUP BY bk.doc_id)""".stripMargin

  private def filterCalibrationOracleSql: String = {
    def cell(cond: String, name: String) =
      s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS $name"
    s"""WITH $linearFilterCtes,
       |thr AS (SELECT unnest([${CalibThresholds.mkString(", ")}]) AS thr)
       |SELECT CAST(thr AS BIGINT) AS thr,
       |  ${cell("y = 1 AND (w0 + w1*f1 + w2*f2) > thr", "tp")},
       |  ${cell("y = -1 AND (w0 + w1*f1 + w2*f2) > thr", "fp")},
       |  ${cell("y = 1 AND (w0 + w1*f1 + w2*f2) <= thr", "fn")},
       |  ${cell("y = -1 AND (w0 + w1*f1 + w2*f2) <= thr", "tn")},
       |  ${cell("y = 0 AND (w0 + w1*f1 + w2*f2) > thr", "band_keep")}
       |FROM lab, e$LfEpochs, thr GROUP BY thr ORDER BY thr""".stripMargin
  }

  private def distinctNgramsOracleSql: String =
    s"""WITH toks AS (SELECT source, $toksSql AS t FROM documents),
       |tids AS (SELECT source, list_transform(t, x -> ${termHashSql("x")}) AS h,
       |                list_transform(t, x -> ${termHash2Sql("x")}) AS h2
       |         FROM toks WHERE t IS NOT NULL),
       |uni AS (SELECT source, unnest(list_transform(range(0, len(h)),
       |          i -> ${chunkIdSqlK(1)})) AS nid FROM tids WHERE len(h) >= 1),
       |bi AS (SELECT source, unnest(list_transform(range(0, len(h) - 1),
       |          i -> ${chunkIdSqlK(2)})) AS nid FROM tids WHERE len(h) >= 2),
       |u AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       |        CAST(count(DISTINCT nid) AS BIGINT) AS n_distinct_1 FROM uni GROUP BY source),
       |b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
       |        CAST(count(DISTINCT nid) AS BIGINT) AS n_distinct_2 FROM bi GROUP BY source)
       |SELECT u.source, n_tokens, n_distinct_1, n_bigrams, n_distinct_2,
       |  (n_distinct_1 * 20000 + n_tokens) // (n_tokens * 2) AS distinct1_per_10k,
       |  (n_distinct_2 * 20000 + n_bigrams) // (n_bigrams * 2) AS distinct2_per_10k
       |FROM u LEFT JOIN b ON u.source = b.source ORDER BY u.source""".stripMargin

  /** q192 oracle: the whole CDC pipeline — codepoint streams, kernel
    * window folds (chunkIdSqlK over per-CHAR values), content-defined
    * cuts, span substrings, md5-prefix chunk ids, and the three
    * per-source cards — replayed in list SQL. */
  private def cdcOracleSql: String = {
    val (w, d) = (8, 32)
    s"""WITH cps AS (SELECT source, doc_id, text AS t,
       |        CAST(length(text) AS BIGINT) AS len,
       |        list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) AS h,
       |        list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) AS h2
       |      FROM documents),
       |cut AS (SELECT source, doc_id, t, len,
       |        CASE WHEN len < $w THEN CAST([] AS BIGINT[]) ELSE
       |          list_filter(list_transform(range(0, len - $w + 1), i ->
       |            CASE WHEN (${chunkIdSqlK(w)}) % $d = 0 AND i + $w < len
       |                 THEN i + $w ELSE -1 END), x -> x >= 0)
       |        END AS cuts FROM cps),
       |spans AS (SELECT source, doc_id, t, list_prepend(CAST(0 AS BIGINT), cuts) AS starts,
       |        list_append(cuts, len) AS ends FROM cut),
       |chunks AS (SELECT source, doc_id,
       |        unnest(list_transform(range(0, len(starts)), j ->
       |          substr(t, CAST(starts[j+1] + 1 AS INT), CAST(ends[j+1] - starts[j+1] AS INT)))) AS chunk
       |      FROM spans),
       |rws AS (SELECT source, doc_id,
       |        CAST(('0x' || substr(md5(chunk), 1, 15))::UBIGINT AS BIGINT) AS cid,
       |        CAST(length(chunk) AS BIGINT) AS clen FROM chunks),
       |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
       |        CAST(sum(clen) AS BIGINT) AS total_chars FROM rws GROUP BY source),
       |pc AS (SELECT source, cid, min(clen) AS clen FROM rws GROUP BY source, cid),
       |dist AS (SELECT source, CAST(count(*) AS BIGINT) AS n_distinct_chunks,
       |        CAST(sum(clen) AS BIGINT) AS distinct_chars FROM pc GROUP BY source),
       |fo AS (SELECT cid, arg_min(source, doc_id) AS first_src, min(clen) AS clen
       |       FROM rws GROUP BY cid),
       |novel AS (SELECT first_src AS source, CAST(count(*) AS BIGINT) AS novel_chunks,
       |        CAST(sum(clen) AS BIGINT) AS novel_chars FROM fo GROUP BY first_src)
       |SELECT per.source, n_chunks, total_chars, n_distinct_chunks, distinct_chars,
       |  COALESCE(novel_chunks, CAST(0 AS BIGINT)) AS novel_chunks,
       |  COALESCE(novel_chars, CAST(0 AS BIGINT)) AS novel_chars,
       |  (distinct_chars * 20000 + total_chars) // (total_chars * 2) AS dedup_ratio_per_10k
       |FROM per JOIN dist USING(source) LEFT JOIN novel USING(source)
       |ORDER BY per.source""".stripMargin
  }

  /** q193 oracle: the water-filling replayed with SQL windows — rank
    * strata by cap ascending, find the max feasible rank j*, fully
    * fund ranks ≤ j*, give the rest the integer water level. */
  private def unimaxOracleSql: String =
    s"""WITH counts AS (SELECT lang, CAST(sum(len($toksSql)) AS BIGINT) AS n
       |        FROM documents GROUP BY lang),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) * 4 // 5 AS budget FROM counts),
       |ranked AS (SELECT lang, n, n * 1 AS cap,
       |    CAST(ROW_NUMBER() OVER (ORDER BY n * 1, lang) AS BIGINT) AS rnk,
       |    CAST(SUM(n * 1) OVER (ORDER BY n * 1, lang
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx
       |  FROM counts),
       |ngc AS (SELECT CAST(count(*) AS BIGINT) AS ng FROM ranked),
       |js AS (SELECT COALESCE(MAX(rnk), 0) AS jstar FROM ranked, ngc, tot
       |       WHERE cap * (ng - rnk + 1) + (pfx - cap) <= budget),
       |pj AS (SELECT COALESCE((SELECT pfx FROM ranked, js WHERE rnk = jstar), 0) AS pfxj),
       |lvl AS (SELECT CASE WHEN ng > jstar THEN (budget - pfxj) // (ng - jstar)
       |               ELSE 0 END AS t FROM ngc, js, pj, tot)
       |SELECT lang, n, cap,
       |  CASE WHEN rnk <= jstar THEN cap ELSE LEAST(cap, t) END AS allocated,
       |  (CASE WHEN rnk <= jstar THEN cap ELSE LEAST(cap, t) END * 20000 + n)
       |    // (n * 2) AS epochs_per_10k
       |FROM ranked, js, lvl ORDER BY lang""".stripMargin

  private def containmentOracleSql: String =
    s"""WITH $corpusSql,
       |${shinglesCte("corpus")},
       |freq AS (SELECT shingle, count(*) AS f FROM sh GROUP BY shingle),
       |kept AS (SELECT s.doc_id, s.shingle FROM sh s JOIN freq fq ON s.shingle = fq.shingle
       |         WHERE fq.f <= 6),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM kept GROUP BY doc_id),
       |inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_inter
       |          FROM kept x JOIN kept y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_inter, sa.n AS sa, sb.n AS sb,
       |       (n_inter * 20000 + sa.n) // (sa.n * 2) AS containment_ab_per_10k,
       |       (n_inter * 20000 + sb.n) // (sb.n * 2) AS containment_ba_per_10k
       |FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE GREATEST((n_inter * 20000 + sa.n) // (sa.n * 2),
       |               (n_inter * 20000 + sb.n) // (sb.n * 2)) >= 8000
       |ORDER BY doc_a, doc_b""".stripMargin

  val oracles: Map[String, String] = Map(
    "q186_linear_filter" -> linearFilterOracleSql,
    "q187_linear_filter_apply" -> linearFilterApplyOracleSql,
    "q192_cdc_chunks" -> cdcOracleSql,
    "q193_unimax_alloc" -> unimaxOracleSql,
    "q194_containment" -> containmentOracleSql,
    "q197_orc_roundtrip" ->
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
         |  CAST(sum(('0x' || substr(md5(concat_ws(':', doc_id, lang, text)), 1, 15))::UBIGINT
         |    % 1000000000) AS BIGINT) AS content_sum
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q198_dedup_tier_eval" -> {
      def evalLeg(predCte: String, name: String) =
        s"""SELECT '$name' AS tier,
           |  CAST(${TierEvalGates(name)} AS BIGINT) AS recall_per_10k_gate,
           |  CAST($TierEvalSampleFracPer10k AS BIGINT) AS sample_frac_per_10k,
           |  CAST(sum(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
           |  CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
           |  CAST(sum(CASE WHEN p IS NOT NULL AND t IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |  CAST(sum(CASE WHEN p IS NOT NULL AND t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |  CAST(sum(CASE WHEN t IS NOT NULL AND p IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |  CAST(CASE WHEN sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) > 0 THEN
           |    (sum(CASE WHEN p IS NOT NULL AND t IS NOT NULL THEN 1 ELSE 0 END) * 20000
           |     + sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END))
           |    // (sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) * 2) END AS BIGINT) AS precision_per_10k,
           |  CAST(CASE WHEN sum(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END) > 0 THEN
           |    (sum(CASE WHEN p IS NOT NULL AND t IS NOT NULL THEN 1 ELSE 0 END) * 20000
           |     + sum(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END))
           |    // (sum(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END) * 2) END AS BIGINT) AS recall_per_10k
           |FROM ((SELECT doc_a, doc_b, 1 AS p FROM $predCte) pp
           |      FULL OUTER JOIN (SELECT doc_a, doc_b, 1 AS t FROM truth) tt
           |      USING (doc_a, doc_b))""".stripMargin
      s"""WITH $corpusSql,
         |scorpus AS (SELECT * FROM corpus
         |  WHERE ('0x' || substr(md5(concat_ws(':', '$TierEvalSampleSeed', doc_id)), 1, 15))::UBIGINT
         |        % 10000 < $TierEvalSampleFracPer10k),
         |${shinglesCte("scorpus")},
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS ni
         |          FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |truth AS (SELECT doc_a, doc_b FROM inter
         |          JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         |          WHERE ROUND(CAST(ni AS DOUBLE) / CAST(sa.n + sb.n - ni AS DOUBLE), 4) >= 0.5),
         |$shingleIdsCte,
         |$lshCandCtes,
         |lshp AS (SELECT DISTINCT doc_a, doc_b FROM cand WHERE $estJaccardSql >= 0.5),
         |tok2 AS (SELECT doc_id, unnest($toksSql) AS token FROM scorpus),
         |counts2 AS (SELECT doc_id, token, count(*) AS cnt FROM tok2 GROUP BY 1, 2),
         |dtc2 AS (SELECT doc_id, ${termHashSql("token")} AS tid, cnt FROM counts2),
         |sums2 AS (SELECT doc_id, ${simhashSumsSql()} FROM dtc2 GROUP BY doc_id),
         |shx AS (SELECT doc_id, CAST(${simhashBitsSql()} AS BIGINT) AS shv FROM sums2),
         |simp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM shx a JOIN shx b ON a.doc_id < b.doc_id
         |         WHERE bit_count(xor(a.shv, b.shv)) <= 1),
         |sums64 AS (SELECT doc_id, ${simhashSumsSql(64)} FROM dtc2 GROUP BY doc_id),
         |shx64 AS (SELECT doc_id, CAST(${simhashBitsSql(64)} AS BIGINT) AS shv FROM sums64),
         |simp64 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |           FROM shx64 a JOIN shx64 b ON a.doc_id < b.doc_id
         |           WHERE bit_count(xor(a.shv, b.shv)) <= 7),
         |ctoks AS (SELECT doc_id, $toksSql AS t FROM scorpus),
         |ctids AS (SELECT doc_id, list_transform(t, x -> ${termHashSql("x")}) AS h,
         |                 list_transform(t, x -> ${termHash2Sql("x")}) AS h2
         |          FROM ctoks WHERE len(t) >= 8),
         |cids AS (SELECT DISTINCT doc_id, cid FROM (
         |           SELECT doc_id, unnest(list_transform(range(0, len(h) - 7),
         |             i -> $chunkIdSql)) AS cid
         |           FROM ctids)),
         |cfreq AS (SELECT cid, count(*) AS f FROM cids GROUP BY cid),
         |ckept AS (SELECT c.doc_id, c.cid FROM cids c JOIN cfreq fq ON c.cid = fq.cid
         |          WHERE fq.f <= 1000),
         |chkp AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM ckept x JOIN ckept y ON x.cid = y.cid AND x.doc_id < y.doc_id)
         |SELECT * FROM (
         |${evalLeg("lshp", "minhash_lsh")}
         |UNION ALL
         |${evalLeg("simp", "simhash_h1")}
         |UNION ALL
         |${evalLeg("simp64", "simhash_h7_64")}
         |UNION ALL
         |${evalLeg("chkp", "chunk_k8")}
         |) ORDER BY tier""".stripMargin
    },
    "q199_lsh_threshold_sweep" -> {
      def sweepLeg(thr: Int, name: String) =
        s"""SELECT '$name' AS tier,
           |  CAST(${SweepGates(name)} AS BIGINT) AS recall_per_10k_gate,
           |  CAST($TierEvalSampleFracPer10k AS BIGINT) AS sample_frac_per_10k,
           |  CAST(sum(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
           |  CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
           |  CAST(sum(CASE WHEN p IS NOT NULL AND t IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |  CAST(sum(CASE WHEN p IS NOT NULL AND t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |  CAST(sum(CASE WHEN t IS NOT NULL AND p IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |  CAST(CASE WHEN sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) > 0 THEN
           |    (sum(CASE WHEN p IS NOT NULL AND t IS NOT NULL THEN 1 ELSE 0 END) * 20000
           |     + sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END))
           |    // (sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) * 2) END AS BIGINT) AS precision_per_10k,
           |  CAST(CASE WHEN sum(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END) > 0 THEN
           |    (sum(CASE WHEN p IS NOT NULL AND t IS NOT NULL THEN 1 ELSE 0 END) * 20000
           |     + sum(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END))
           |    // (sum(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END) * 2) END AS BIGINT) AS recall_per_10k
           |FROM ((SELECT doc_a, doc_b, 1 AS p FROM lshp_all WHERE est >= ${thr / 10000.0}) pp
           |      FULL OUTER JOIN (SELECT doc_a, doc_b, 1 AS t FROM truth) tt
           |      USING (doc_a, doc_b))""".stripMargin
      s"""WITH $corpusSql,
         |scorpus AS (SELECT * FROM corpus
         |  WHERE ('0x' || substr(md5(concat_ws(':', '$TierEvalSampleSeed', doc_id)), 1, 15))::UBIGINT
         |        % 10000 < $TierEvalSampleFracPer10k),
         |${shinglesCte("scorpus")},
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS ni
         |          FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |truth AS (SELECT doc_a, doc_b FROM inter
         |          JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         |          WHERE ROUND(CAST(ni AS DOUBLE) / CAST(sa.n + sb.n - ni AS DOUBLE), 4) >= 0.5),
         |$shingleIdsCte,
         |$lshCandCtes,
         |lshp_all AS (SELECT DISTINCT doc_a, doc_b, $estJaccardSql AS est FROM cand
         |             WHERE $estJaccardSql >= 0.25)
         |SELECT *,
         |  CASE WHEN lag(recall_per_10k) OVER (ORDER BY tier) IS NULL THEN CAST(1 AS BIGINT)
         |       WHEN recall_per_10k <= lag(recall_per_10k) OVER (ORDER BY tier)
         |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pass_recall_monotone
         |FROM (
         |${sweepLeg(2500, "lsh_t2500")}
         |UNION ALL
         |${sweepLeg(5000, "lsh_t5000")}
         |UNION ALL
         |${sweepLeg(7500, "lsh_t7500")}
         |) ORDER BY tier""".stripMargin
    },
    "q188_dsir_filter" ->
      s"""WITH $dsirCtes
         |SELECT lang, score > 0 AS keep, CAST(count(*) AS BIGINT) AS n_docs,
         |  min(score) AS min_score, max(score) AS max_score
         |FROM dscore GROUP BY 1, 2 ORDER BY lang, keep""".stripMargin,
    "q189_dsir_topk" ->
      s"""WITH $dsirCtes
         |SELECT doc_id, lang, score FROM dscore
         |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
    "q190_filter_calibration" -> filterCalibrationOracleSql,
    "q191_distinct_ngrams" -> distinctNgramsOracleSql,
    "q40_dedup_exact" ->
      s"""WITH $corpusSql
         |SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
         |       count(*) AS n_copies,
         |       array_to_string(list_slice(list_sort(list(doc_id)), 1, 1000), ',') AS member_csv
         |FROM corpus GROUP BY md5(text) HAVING count(*) > 1 ORDER BY canonical_id""".stripMargin,
    "q41_ngram_jaccard" ->
      s"""WITH $corpusSql,
         |${shinglesCte("corpus")},
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS ni
         |          FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       ROUND(CAST(ni AS DOUBLE) / CAST(sa.n + sb.n - ni AS DOUBLE), 4) AS jaccard
         |FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""".stripMargin,
    "q57_ngram_jaccard_capped" ->
      s"""WITH $corpusSql,
         |${shinglesCte("corpus")},
         |freq AS (SELECT shingle, count(*) AS f FROM sh GROUP BY shingle),
         |kept AS (SELECT s.doc_id, s.shingle FROM sh s JOIN freq fq ON s.shingle = fq.shingle
         |         WHERE fq.f <= 6),
         |sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS ni
         |          FROM kept x JOIN kept y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       ROUND(CAST(ni AS DOUBLE) / CAST(sa.n + sb.n - ni AS DOUBLE), 4) AS jaccard
         |FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""".stripMargin,
    "q42_minhash_signatures" ->
      s"""WITH ${shinglesCte("documents")},
         |$shingleIdsCte
         |SELECT doc_id, array_to_string($sigExprSql, ',') AS sig_csv
         |FROM dsi GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q43_minhash_lsh" ->
      s"""WITH $corpusSql,
         |${shinglesCte("corpus")},
         |$shingleIdsCte,
         |$lshCandCtes
         |SELECT doc_a, doc_b, $estJaccardSql AS est_jaccard
         |FROM cand WHERE $estJaccardSql >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q147_editdist_verify" ->
      s"""WITH $corpusSql,
         |${shinglesCte("corpus")},
         |$shingleIdsCte,
         |$lshCandCtes,
         |pairs AS (SELECT doc_a, doc_b FROM cand WHERE $estJaccardSql >= 0.5),
         |scored AS (SELECT p.doc_a, p.doc_b,
         |                  levenshtein(a.text, b.text) AS lev,
         |                  greatest(length(a.text), length(b.text)) AS ml
         |           FROM pairs p
         |           JOIN corpus a ON a.doc_id = p.doc_a
         |           JOIN corpus b ON b.doc_id = p.doc_b),
         |fin AS (SELECT doc_a, doc_b, lev,
         |               CASE WHEN ml = 0 THEN 1.0
         |                    ELSE ROUND(1.0 - CAST(lev AS DOUBLE) / CAST(ml AS DOUBLE), 4) + 0.0
         |               END AS sim
         |        FROM scored)
         |SELECT doc_a, doc_b, lev, sim,
         |       CASE WHEN sim >= 0.9 THEN 1 ELSE 0 END AS verified
         |FROM fin ORDER BY doc_a, doc_b""".stripMargin,
    // q148: q147's verified pairs -> q52's recursive components ->
    // min-id keeper. Non-verified candidates contribute NO edge.
    "q148_verified_dedup" ->
      s"""WITH RECURSIVE $corpusSql,
         |${shinglesCte("corpus")},
         |$shingleIdsCte,
         |$lshCandCtes,
         |pairs AS (SELECT doc_a, doc_b FROM cand WHERE $estJaccardSql >= 0.5),
         |scored AS (SELECT p.doc_a, p.doc_b,
         |                  levenshtein(a.text, b.text) AS lev,
         |                  greatest(length(a.text), length(b.text)) AS ml
         |           FROM pairs p
         |           JOIN corpus a ON a.doc_id = p.doc_a
         |           JOIN corpus b ON b.doc_id = p.doc_b),
         |verified AS (SELECT doc_a, doc_b FROM scored
         |             WHERE (CASE WHEN ml = 0 THEN 1.0
         |                         ELSE ROUND(1.0 - CAST(lev AS DOUBLE) / CAST(ml AS DOUBLE), 4) + 0.0
         |                    END) >= 0.9),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM verified
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM verified),
         |nodes AS (SELECT DISTINCT a AS node FROM edges),
         |reach(node, lab) AS (
         |  SELECT node, node AS lab FROM nodes
         |  UNION
         |  SELECT e.b AS node, r.lab FROM reach r JOIN edges e ON e.a = r.node)
         |SELECT node AS doc_id, min(lab) AS group_id,
         |       CASE WHEN node = min(lab) THEN 1 ELSE 0 END AS keep
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    // q138: same signature pipeline, but candidates cross the
    // store/batch split (store = originals < 100000, batch = the
    // planted dup probes) — replaying the persisted-store probe from
    // first principles.
    "q138_incremental_dedup" -> incrementalProbeOracle,
    // q180: SAME oracle as q138 (exact-twin pattern) — the Spark side
    // serves the probe from a MERGE of two parity-split half stores,
    // so the hash match proves merge == build-of-union through the
    // driver gate.
    "q180_sigstore_merge" -> incrementalProbeOracle,
    // q163: docs implicated in any >= 0.5 LSH pair (the q52 chain up
    // to `pairs` — no recursion needed for membership), joined onto
    // real documents only (the injected probe ids match nothing).
    "q163_dup_rate_by_source" ->
      s"""WITH $corpusSql,
         |${shinglesCte("corpus")},
         |$shingleIdsCte,
         |$lshCandCtes,
         |pairs AS (SELECT doc_a, doc_b FROM cand WHERE $estJaccardSql >= 0.5),
         |dup AS (SELECT DISTINCT doc_id FROM
         |         (SELECT doc_a AS doc_id FROM pairs
         |          UNION ALL SELECT doc_b AS doc_id FROM pairs))
         |SELECT d.source, count(*) AS n_docs,
         |       CAST(count(dup.doc_id) AS BIGINT) AS n_dup,
         |       ROUND(CAST(count(dup.doc_id) AS DOUBLE) / count(*), 6) + 0.0 AS dup_rate
         |FROM documents d LEFT JOIN dup ON dup.doc_id = d.doc_id
         |GROUP BY 1 ORDER BY source""".stripMargin,
    // q171: the q52 component derivation + per-group stats; the LEFT
    // JOIN misses injected probe ids, so n_sources counts real docs.
    "q171_dup_cluster_report" ->
      s"""WITH RECURSIVE $corpusSql,
         |${shinglesCte("corpus")},
         |$shingleIdsCte,
         |$lshCandCtes,
         |pairs AS (SELECT doc_a, doc_b FROM cand WHERE $estJaccardSql >= 0.5),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
         |nodes AS (SELECT DISTINCT a AS node FROM edges),
         |reach(node, lab) AS (
         |  SELECT node, node AS lab FROM nodes
         |  UNION
         |  SELECT e.b AS node, r.lab FROM reach r JOIN edges e ON e.a = r.node),
         |g AS (SELECT node AS doc_id, min(lab) AS group_id FROM reach GROUP BY node)
         |SELECT g.group_id, count(*) AS n_members,
         |       min(g.doc_id) AS min_id, max(g.doc_id) AS max_id,
         |       CAST(SUM(CASE WHEN g.doc_id >= 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_injected,
         |       count(DISTINCT d.source) AS n_sources
         |FROM g LEFT JOIN documents d ON d.doc_id = g.doc_id
         |GROUP BY 1 ORDER BY group_id""".stripMargin,
    "q52_dedup_groups" ->
      s"""WITH RECURSIVE $corpusSql,
         |${shinglesCte("corpus")},
         |$shingleIdsCte,
         |$lshCandCtes,
         |pairs AS (SELECT doc_a, doc_b FROM cand WHERE $estJaccardSql >= 0.5),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
         |nodes AS (SELECT DISTINCT a AS node FROM edges),
         |reach(node, lab) AS (
         |  SELECT node, node AS lab FROM nodes
         |  UNION
         |  SELECT e.b AS node, r.lab FROM reach r JOIN edges e ON e.a = r.node)
         |SELECT node AS doc_id, min(lab) AS group_id FROM reach
         |GROUP BY node ORDER BY doc_id""".stripMargin,
    // q52's grouping + q46's quality arithmetic + per-group best pick
    // (ROW_NUMBER replays the struct-max: quality DESC, doc_id ASC).
    "q134_dedup_keep_best" ->
      s"""WITH RECURSIVE $corpusSql,
         |${shinglesCte("corpus")},
         |$shingleIdsCte,
         |$lshCandCtes,
         |pairs AS (SELECT doc_a, doc_b FROM cand WHERE $estJaccardSql >= 0.5),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
         |nodes AS (SELECT DISTINCT a AS node FROM edges),
         |reach(node, lab) AS (
         |  SELECT node, node AS lab FROM nodes
         |  UNION
         |  SELECT e.b AS node, r.lab FROM reach r JOIN edges e ON e.a = r.node),
         |comp AS (SELECT node AS doc_id, min(lab) AS group_id FROM reach GROUP BY node),
         |qbase AS (SELECT doc_id, $toksSql AS t FROM corpus),
         |qstats AS (SELECT doc_id,
         |    len(t) AS n_tokens,
         |    ROUND(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4) AS distinct_ratio,
         |    ROUND(CAST(list_sum(list_transform(t, s -> length(s))) AS DOUBLE) / len(t), 4) AS avg_token_len,
         |    ROUND(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to'))) AS DOUBLE) / len(t), 4) AS stopword_ratio
         |  FROM qbase),
         |q AS (SELECT doc_id,
         |  ROUND((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.25 ELSE 0.0 END
         |       + CASE WHEN avg_token_len BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0.0 END
         |       + CASE WHEN distinct_ratio >= 0.3 THEN 0.25 ELSE 0.0 END
         |       + CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END), 2) AS quality_score
         |  FROM qstats),
         |m AS (SELECT comp.doc_id, group_id, quality_score FROM comp JOIN q USING (doc_id)),
         |r AS (SELECT *, ROW_NUMBER() OVER
         |        (PARTITION BY group_id ORDER BY quality_score DESC, doc_id) AS rn FROM m)
         |SELECT doc_id, group_id, quality_score, (rn = 1) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "q65_leakage_safe_split" ->
      s"""WITH RECURSIVE $corpusSql,
         |${shinglesCte("corpus")},
         |$shingleIdsCte,
         |$lshCandCtes,
         |pairs AS (SELECT doc_a, doc_b FROM cand WHERE $estJaccardSql >= 0.5),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
         |nodes AS (SELECT DISTINCT a AS node FROM edges),
         |reach(node, lab) AS (
         |  SELECT node, node AS lab FROM nodes
         |  UNION
         |  SELECT e.b AS node, r.lab FROM reach r JOIN edges e ON e.a = r.node),
         |comp AS (SELECT node AS doc_id, min(lab) AS group_id FROM reach GROUP BY node),
         |grouped AS (SELECT c.doc_id, COALESCE(comp.group_id, c.doc_id) AS group_id
         |            FROM corpus c LEFT JOIN comp USING (doc_id)),
         |s AS (SELECT doc_id, group_id,
         |  CASE WHEN ((group_id % 1000000007) * (2654435761 % 1000000007)) % 1000000007 % 100 < 80 THEN 'train'
         |       WHEN ((group_id % 1000000007) * (2654435761 % 1000000007)) % 1000000007 % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split FROM grouped)
         |SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT group_id) AS n_groups,
         |       CAST(SUM(doc_id) AS BIGINT) AS id_sum
         |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "q44_simhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |counts AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
         |dtc AS (SELECT doc_id, ${termHashSql("token")} AS tid, cnt FROM counts),
         |sums AS (SELECT doc_id, ${simhashSumsSql()} FROM dtc GROUP BY doc_id)
         |SELECT doc_id, CAST(${simhashBitsSql()} AS BIGINT) AS simhash FROM sums ORDER BY doc_id""".stripMargin,
    "q45_embedding_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(COALESCE(list_sum(list_transform(range(1, len(a.embedding)+1),
        |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
        |        (SQRT(list_sum(list_transform(range(1, len(a.embedding)+1),
        |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
        |         SQRT(list_sum(list_transform(range(1, len(b.embedding)+1),
        |          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 0.0), 4) + 0.0 AS cos_sim,
        |  'exact-crossjoin' AS tier
        |FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id < b.vec_id
        |ORDER BY cos_sim DESC, id_a, id_b LIMIT 20""".stripMargin,
    "q46_text_stats" ->
      s"""WITH base AS (
         |  SELECT doc_id, length(text) AS n_chars, $toksSql AS t FROM documents),
         |stats AS (
         |  SELECT doc_id, n_chars,
         |    len(t) AS n_tokens,
         |    len(list_distinct(t)) AS n_distinct_tokens,
         |    ROUND(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4) AS distinct_ratio,
         |    ROUND(CAST(list_sum(list_transform(t, s -> length(s))) AS DOUBLE) / len(t), 4) AS avg_token_len,
         |    ROUND(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to'))) AS DOUBLE) / len(t), 4) AS stopword_ratio
         |  FROM base)
         |SELECT doc_id, n_chars, n_tokens, n_distinct_tokens, distinct_ratio, avg_token_len, stopword_ratio,
         |  ROUND((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.25 ELSE 0.0 END
         |       + CASE WHEN avg_token_len BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0.0 END
         |       + CASE WHEN distinct_ratio >= 0.3 THEN 0.25 ELSE 0.0 END
         |       + CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END), 2) AS quality_score
         |FROM stats ORDER BY doc_id""".stripMargin,
    "q47_langid" -> {
      val scoreCols = TextAnalysis.langMarkers.map { case (l, ms) =>
        s"len(list_filter(t, x -> x IN (${ms.map(m => s"'$m'").mkString(",")}))) AS score_$l"
      }.mkString(",\n    ")
      val best = TextAnalysis.langMarkers.map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
      val pred = TextAnalysis.langMarkers.map { case (l, _) =>
        s"WHEN score_$l = $best AND score_$l > 0 THEN '$l'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH base AS (SELECT doc_id, $toksSql AS t FROM documents),
         |scored AS (SELECT doc_id,
         |    $scoreCols
         |  FROM base)
         |SELECT doc_id, ${TextAnalysis.langMarkers.map { case (l, _) => s"score_$l" }.mkString(", ")},
         |       $pred AS lang_pred
         |FROM scored ORDER BY doc_id""".stripMargin
    },
    // q169: the q47 scoring chain cross-tabbed against the labeled
    // lang column; row_frac normalizes within each truth language.
    "q169_langid_confusion" -> {
      val scoreCols = TextAnalysis.langMarkers.map { case (l, ms) =>
        s"len(list_filter(t, x -> x IN (${ms.map(m => s"'$m'").mkString(",")}))) AS score_$l"
      }.mkString(",\n    ")
      val best = TextAnalysis.langMarkers.map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
      val pred = TextAnalysis.langMarkers.map { case (l, _) =>
        s"WHEN score_$l = $best AND score_$l > 0 THEN '$l'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH base AS (SELECT doc_id, lang, $toksSql AS t FROM documents),
         |scored AS (SELECT doc_id, lang, $scoreCols FROM base),
         |p AS (SELECT lang, $pred AS lang_pred FROM scored),
         |c AS (SELECT lang, lang_pred, count(*) AS n_docs FROM p GROUP BY 1, 2)
         |SELECT lang, lang_pred, n_docs,
         |       ROUND(CAST(n_docs AS DOUBLE) /
         |             SUM(n_docs) OVER (PARTITION BY lang), 6) + 0.0 AS row_frac
         |FROM c ORDER BY lang, lang_pred""".stripMargin
    },
    "q48_token_regex_count" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q59_decontaminate" ->
      s"""WITH ${shinglesCte("documents")},
         |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 5)
         |SELECT doc_id, COUNT(*) AS n_shared_shingles
         |FROM sh JOIN bench USING (shingle)
         |WHERE doc_id >= 5
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q58_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
         |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |nn AS (SELECT COUNT(*) AS n FROM documents),
         |s AS (SELECT doc_id, term, tf, df,
         |             ROUND(tf * LN((nn.n + 1.0) / (df + 1.0)), 4) + 0.0 AS tfidf
         |      FROM tf JOIN dfx USING (term) CROSS JOIN nn),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk FROM s)
         |SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "q49_fingerprint" ->
      s"""WITH base AS (SELECT doc_id, $toksSql AS t FROM documents)
         |SELECT doc_id,
         |  CASE WHEN len(t) = 0 THEN 0
         |       ELSE list_reduce(list_transform(t, s -> length(s) * 256 + unicode(s)),
         |                        (h, x) -> (h * 31 + x) % 1000000007) END AS fingerprint
         |FROM base ORDER BY doc_id""".stripMargin,
    "q50_multimodal_meta" ->
      """SELECT doc_id, strlen(text) AS n_bytes, unicode(text) AS first_code,
        |       CAST(list_sum(list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT))) % 65521 AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q51_token_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest($toksSql) AS token FROM documents)
         |SELECT token, count(*) AS cnt FROM tok GROUP BY token
         |ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    // Replays the Efraimidis–Spirtes keys: u = (60-bit md5 prefix + 1)
    // / 2^60, rank by ln(u)/w desc. Both engines round the same
    // h+1 > 2^53 integer to the same nearest double (IEEE), so ln gets
    // bit-identical inputs.
    "q125_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id,
         |    len($toksSql) AS w,
         |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT + 1)
         |      / 1152921504606846976.0 AS u
         |  FROM documents)
         |SELECT doc_id, CAST(w AS BIGINT) AS w, round(ln(u)/w, 6) + 0.0 AS score
         |FROM d ORDER BY ln(u)/w DESC, doc_id LIMIT 100""".stripMargin,
    // The bloom pre-filter is invisible to the answer (no false
    // negatives; false positives rescued by the exact anti join), so
    // a plain NOT IN replays it.
    "q126_bloom_decontaminate" ->
      s"""WITH $corpusSql,
         |block AS (SELECT md5(text) AS h FROM corpus WHERE doc_id % 7 = 0)
         |SELECT doc_id FROM corpus
         |WHERE md5(text) NOT IN (SELECT h FROM block)
         |ORDER BY doc_id""".stripMargin,
    // Full JS re-derivation: add-one smoothing over the joint vocab,
    // per-term contribution quantized at 1e12 exactly as the operator
    // does, total = integer sum of the quantized contributions.
    "q129_token_drift" ->
      s"""WITH ca AS (SELECT term, count(*) AS c_a FROM
         |        (SELECT unnest($toksSql) AS term FROM documents WHERE lang = 'en') GROUP BY 1),
         |cb AS (SELECT term, count(*) AS c_b FROM
         |        (SELECT unnest($toksSql) AS term FROM documents WHERE lang = 'zh') GROUP BY 1),
         |v AS (SELECT COALESCE(ca.term, cb.term) AS term,
         |             COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
         |      FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
         |st AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a, CAST(sum(c_b) AS BIGINT) AS n_b,
         |              count(*) AS vsz FROM v),
         |p AS (SELECT term, c_a, c_b,
         |        (c_a + 1.0) / (st.n_a + st.vsz) AS pa,
         |        (c_b + 1.0) / (st.n_b + st.vsz) AS pb
         |      FROM v CROSS JOIN st),
         |c AS (SELECT term, c_a, c_b,
         |        CAST(ROUND((0.5 * (pa * LN(pa / (0.5 * (pa + pb))))
         |                  + 0.5 * (pb * LN(pb / (0.5 * (pa + pb))))) * 1000000000000.0) AS BIGINT) AS fp
         |      FROM p),
         |t AS (SELECT CAST(sum(fp) AS BIGINT) AS tot FROM c)
         |SELECT term, c_a, c_b, fp / 1000000000000.0 AS js_contrib,
         |       t.tot / 1000000000000.0 AS js_total
         |FROM c CROSS JOIN t ORDER BY fp DESC, term LIMIT 20""".stripMargin,
    // Full relational KL replay: q unsmoothed over source-present
    // terms, baseline add-one smoothed over the corpus vocab, per-term
    // quantize at 1e12 then integer sum per source.
    "q131_source_drift" ->
      s"""WITH tok AS (SELECT source, unnest($toksSql) AS term FROM documents),
         |sc AS (SELECT source, term, count(*) AS c FROM tok GROUP BY 1, 2),
         |cb AS (SELECT term, CAST(sum(c) AS BIGINT) AS c_all FROM sc GROUP BY 1),
         |st AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_all, count(*) AS vsz FROM cb),
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src FROM sc GROUP BY 1),
         |f AS (SELECT sc.source, ns.n_src,
         |        CAST(ROUND((CAST(c AS DOUBLE) / ns.n_src)
         |             * LN((CAST(c AS DOUBLE) / ns.n_src) / ((c_all + 1.0) / (st.n_all + st.vsz)))
         |             * 1000000000000.0) AS BIGINT) AS fp
         |      FROM sc JOIN cb USING (term) JOIN ns USING (source) CROSS JOIN st),
         |k AS (SELECT source, n_src AS n_tokens, CAST(sum(fp) AS BIGINT) AS kl_fp
         |      FROM f GROUP BY 1, 2)
         |SELECT source, n_tokens, kl_fp / 1000000000000.0 AS kl
         |FROM k ORDER BY kl_fp DESC, source""".stripMargin,
    // dHash replay from the pixel formula (the Spark side hashed REAL
    // decoded PNGs): 9x8 nearest-neighbor integer-luma grid, bit k set
    // iff gray(gx,gy) > gray(gx+1,gy); brute-force hamming <= 3 pairs
    // == the banded join's output by the pigeonhole theorem. The
    // signed-BIGINT wrap at bit 63 rides a HUGEINT sum.
    "q133_image_neardup" ->
      s"""WITH imgs AS (
         |  SELECT doc_id AS id, doc_id AS mid, FALSE AS mut FROM documents WHERE doc_id < 200
         |  UNION ALL
         |  SELECT doc_id, doc_id + 100000, TRUE FROM documents WHERE doc_id < 25),
         |dim AS (SELECT mid, id, mut, 8 + id % 9 AS w, 8 + id % 7 AS h FROM imgs),
         |cell AS (SELECT mid, gx, gy,
         |    CASE WHEN mut AND ((gx*w)//9) = 0 AND ((gy*h)//8) = 0 THEN 255000
         |         ELSE 299*((id*31 + ((gx*w)//9)*7  + ((gy*h)//8)*13) % 256)
         |            + 587*((id*17 + ((gx*w)//9)*11 + ((gy*h)//8)*3)  % 256)
         |            + 114*((id*23 + ((gx*w)//9)*5  + ((gy*h)//8)*19) % 256) END AS g
         |  FROM dim, (SELECT unnest(range(0, 9)) AS gx) xs, (SELECT unnest(range(0, 8)) AS gy) ys),
         |bit AS (SELECT a.mid, (a.gy * 8 + a.gx) AS k
         |        FROM cell a JOIN cell b ON a.mid = b.mid AND a.gy = b.gy AND b.gx = a.gx + 1
         |        WHERE a.gx < 8 AND a.g > b.g),
         |hsh AS (SELECT i.mid,
         |          CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
         |                    THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS dhash
         |        FROM imgs i LEFT JOIN
         |          (SELECT mid, SUM(1::HUGEINT << k) AS s FROM bit GROUP BY mid) b USING (mid)),
         |p AS (SELECT x.mid AS id_a, y.mid AS id_b,
         |             CAST(bit_count(xor(COALESCE(x.dhash, 0), COALESCE(y.dhash, 0))) AS BIGINT) AS hamming
         |      FROM hsh x JOIN hsh y ON x.mid < y.mid)
         |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,
    // q146: hashes re-derived from the WAV sample formula; same
    // HUGEINT bit-sum + pair fragments as q133.
    "q146_audio_neardup" ->
      s"""WITH auds AS (
         |  SELECT doc_id AS id, doc_id AS mid, FALSE AS mut FROM documents WHERE doc_id < 200
         |  UNION ALL
         |  SELECT doc_id, doc_id + 100000, TRUE FROM documents WHERE doc_id < 25),
         |smp AS (SELECT mid, id, mut, CAST(256 + id % 97 AS BIGINT) AS n FROM auds),
         |v AS (SELECT mid, n, t,
         |        CASE WHEN mut THEN (((id*37 + t*101 + ((t*t) % 9973)*29) % 65536) - 32768) // 2
         |             ELSE ((id*37 + t*101 + ((t*t) % 9973)*29) % 65536) - 32768 END AS s
         |      FROM (SELECT mid, id, mut, n, unnest(range(0, n)) AS t FROM smp)),
         |wagg AS (SELECT mid, (t*65)//n AS wi, SUM(s) AS e, COUNT(*) AS c
         |         FROM v GROUP BY 1, 2),
         |bit AS (SELECT a.mid, a.wi AS k
         |        FROM wagg a JOIN wagg b ON a.mid = b.mid AND b.wi = a.wi + 1
         |        WHERE a.wi < 64 AND b.e * a.c > a.e * b.c),
         |hsh AS (SELECT i.mid,
         |          CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
         |                    THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS ahash
         |        FROM auds i LEFT JOIN
         |          (SELECT mid, SUM(1::HUGEINT << k) AS s FROM bit GROUP BY mid) b USING (mid)),
         |p AS (SELECT x.mid AS id_a, y.mid AS id_b,
         |             CAST(bit_count(xor(COALESCE(x.ahash, 0), COALESCE(y.ahash, 0))) AS BIGINT) AS hamming
         |      FROM hsh x JOIN hsh y ON x.mid < y.mid)
         |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,
    // Exact mining re-derivation: the MG candidate pass is a pure
    // superset filter, so plain GROUP BY + HAVING reproduces q124's
    // output exactly.
    "q124_frequent_ngrams" ->
      s"""WITH ${shinglesCte("documents")}
         |SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
         |HAVING count(*) >= 6 ORDER BY df DESC, shingle""".stripMargin,
    "q54_multimodal_features" ->
      """WITH codes AS (SELECT doc_id, strlen(text) AS n,
        |  list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) AS cs
        |  FROM documents)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
        |  CAST(list_sum(cs) % 65521 AS BIGINT) AS checksum,
        |  CAST(CAST(n AS FLOAT) AS DOUBLE) AS f0,
        |  CAST(CAST(CAST(list_sum(cs) AS DOUBLE) / n AS FLOAT) AS DOUBLE) AS f1,
        |  CAST(CAST(list_min(cs) AS FLOAT) AS DOUBLE) AS f2,
        |  CAST(CAST(list_max(cs) AS FLOAT) AS DOUBLE) AS f3,
        |  CAST(CAST(len(list_filter(cs, x -> x = 0)) AS FLOAT) AS DOUBLE) AS f4,
        |  CAST(CAST(cs[1] AS FLOAT) AS DOUBLE) AS f5,
        |  CAST(CAST(cs[n] AS FLOAT) AS DOUBLE) AS f6,
        |  CAST(CAST(4 AS FLOAT) AS DOUBLE) AS f7
        |FROM codes ORDER BY doc_id""".stripMargin,
    "q55_frame_sample" ->
      """WITH f AS (SELECT doc_id, strlen(text) AS n, text FROM documents
        |           WHERE doc_id < 100 AND text IS NOT NULL),
        |g AS (SELECT doc_id, i AS frame_idx,
        |        least(CAST(i AS BIGINT) * greatest(1, n // 4), greatest(0, CAST(n AS BIGINT) - 1)) AS "offset",
        |        n, text
        |      FROM f CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i))
        |SELECT doc_id, frame_idx, "offset",
        |  CAST(strlen(substr(text, CAST("offset" + 1 AS INT), 16)) AS BIGINT) AS frame_len,
        |  md5(substr(text, CAST("offset" + 1 AS INT), 16)) AS frame_md5
        |FROM g ORDER BY doc_id, frame_idx""".stripMargin,
    "q64_repetition" -> {
      def gramsCte(n: Int): String =
        if (n == 1) s"(SELECT doc_id, unnest(t) AS gram FROM base)"
        else {
          val join = (0 until n).map(o => s"t[i+$o]").mkString(" || ' ' || ")
          s"(SELECT doc_id, unnest(list_transform(range(1, len(t) - ${n - 2}), i -> $join)) AS gram " +
            s"FROM base WHERE len(t) >= $n)"
        }
      def fCtes(n: Int): String =
        s"""c$n AS (SELECT doc_id, gram, count(*) AS c FROM ${gramsCte(n)} GROUP BY 1, 2),
           |f$n AS (SELECT doc_id, ROUND(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4) AS f
           |        FROM c$n GROUP BY doc_id)""".stripMargin
      val thr = TextAnalysis.RepetitionThresholds
      s"""WITH base AS (SELECT doc_id, $toksSql AS t FROM documents),
         |${fCtes(1)},
         |${fCtes(2)},
         |${fCtes(3)}
         |SELECT b.doc_id,
         |  COALESCE(f1.f, 0.0) AS top1gram_frac,
         |  COALESCE(f2.f, 0.0) AS top2gram_frac,
         |  COALESCE(f3.f, 0.0) AS top3gram_frac,
         |  CAST(COALESCE(f1.f, 0.0) > ${thr(0)} OR COALESCE(f2.f, 0.0) > ${thr(1)}
         |       OR COALESCE(f3.f, 0.0) > ${thr(2)} AS INT) AS repetitive
         |FROM base b
         |LEFT JOIN f1 ON f1.doc_id = b.doc_id
         |LEFT JOIN f2 ON f2.doc_id = b.doc_id
         |LEFT JOIN f3 ON f3.doc_id = b.doc_id
         |ORDER BY b.doc_id""".stripMargin
    },
    "q69_chunk_dedup" -> {
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |tids AS (SELECT doc_id, list_transform(t, x -> ${termHashSql("x")}) AS h,
         |                list_transform(t, x -> ${termHash2Sql("x")}) AS h2
         |         FROM toks WHERE len(t) >= 8),
         |ids AS (SELECT DISTINCT doc_id, cid FROM (
         |          SELECT doc_id, unnest(list_transform(range(0, len(h) - 7),
         |            i -> $chunkIdSql)) AS cid
         |          FROM tids)),
         |shared AS (SELECT cid FROM ids GROUP BY cid HAVING count(DISTINCT doc_id) > 1),
         |per AS (SELECT i.doc_id, count(*) AS n_chunks,
         |               sum(CASE WHEN s.cid IS NOT NULL THEN 1 ELSE 0 END) AS n_dup_chunks
         |        FROM ids i LEFT JOIN shared s ON i.cid = s.cid
         |        GROUP BY i.doc_id)
         |SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
         |       CAST(n_dup_chunks AS BIGINT) AS n_dup_chunks,
         |       ROUND(CAST(n_dup_chunks AS DOUBLE) / CAST(n_chunks AS DOUBLE), 4) AS dup_frac
         |FROM per WHERE n_dup_chunks > 0
         |ORDER BY dup_frac DESC, doc_id LIMIT 50""".stripMargin
    },
    "q76_image_decode" -> {
      val histCols = (0 until 8).map(i =>
        s"sum(CASE WHEN luma // 32 = $i THEN 1 ELSE 0 END) AS hh$i").mkString(",\n         ")
      def f(expr: String) = s"CAST(CAST($expr AS FLOAT) AS DOUBLE)"
      def mean(s: String) = f(s"CAST($s AS DOUBLE) / n")
      val histSel = (0 until 8).map(i =>
        s"${mean(s"hh$i")} AS f${6 + i}").mkString(",\n       ")
      s"""WITH ids AS (SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS w,
         |                    CAST(8 + doc_id % 7 AS BIGINT) AS h
         |             FROM documents WHERE doc_id < 200),
         |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM ids),
         |v AS (SELECT doc_id, w, h,
         |        (doc_id * 31 + (p % w) * 7 + (p // w) * 13) % 256 AS r,
         |        (doc_id * 17 + (p % w) * 11 + (p // w) * 3) % 256 AS g,
         |        (doc_id * 23 + (p % w) * 5 + (p // w) * 19) % 256 AS b
         |      FROM px),
         |l AS (SELECT *, (r * 299 + g * 587 + b * 114) // 1000 AS luma FROM v),
         |agg AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h, count(*) AS n,
         |         sum(r) AS sr, sum(g) AS sg, sum(b) AS sb, sum(luma) AS sl,
         |         $histCols
         |        FROM l GROUP BY doc_id)
         |SELECT doc_id,
         |       ${f("w")} AS f0, ${f("h")} AS f1,
         |       ${mean("sr")} AS f2, ${mean("sg")} AS f3,
         |       ${mean("sb")} AS f4, ${mean("sl")} AS f5,
         |       $histSel
         |FROM agg ORDER BY doc_id""".stripMargin
    },
    "q78_bpe_tokens" -> {
      // the SAME merge table, rank order, replayed as nested DuckDB
      // list_reduce folds; the accumulator is the space-joined symbol
      // string (symbols never contain whitespace — words are
      // whitespace-split), `ends_with` reads its last symbol
      val fold = graft.operators.TextAnalysis.BpeMerges
        .foldLeft("array_to_string(string_split(w, ''), ' ')") { case (prev, (l, r)) =>
          val m = l + r
          s"list_reduce(string_split($prev, ' '), (a, x) -> " +
            s"CASE WHEN (a = '$l' OR ends_with(a, ' $l')) AND x = '$r' " +
            s"THEN CASE WHEN a = '$l' THEN '$m' " +
            s"ELSE left(a, length(a) - ${l.length}) || '$m' END " +
            s"ELSE a || ' ' || x END)"
        }
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |words AS (SELECT doc_id, w FROM tok WHERE length(w) > 0),
         |c AS (SELECT doc_id, len(string_split($fold, ' ')) AS c FROM words)
         |SELECT doc_id, count(*) AS n_words, CAST(sum(c) AS BIGINT) AS n_bpe_tokens
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // q173: the q78 fold grouped by language + the fertility division.
    "q173_tokenizer_fertility" -> {
      val fold = graft.operators.TextAnalysis.BpeMerges
        .foldLeft("array_to_string(string_split(w, ''), ' ')") { case (prev, (l, r)) =>
          val m = l + r
          s"list_reduce(string_split($prev, ' '), (a, x) -> " +
            s"CASE WHEN (a = '$l' OR ends_with(a, ' $l')) AND x = '$r' " +
            s"THEN CASE WHEN a = '$l' THEN '$m' " +
            s"ELSE left(a, length(a) - ${l.length}) || '$m' END " +
            s"ELSE a || ' ' || x END)"
        }
      s"""WITH tok AS (SELECT lang, unnest($toksSql) AS w FROM documents),
         |words AS (SELECT lang, w FROM tok WHERE length(w) > 0),
         |c AS (SELECT lang, len(string_split($fold, ' ')) AS c FROM words)
         |SELECT lang, count(*) AS n_words, CAST(sum(c) AS BIGINT) AS n_bpe_tokens,
         |       ROUND(CAST(sum(c) AS DOUBLE) / count(*), 6) + 0.0 AS fertility
         |FROM c GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q77_audio_decode" -> {
      def f(expr: String) = s"CAST(CAST($expr AS FLOAT) AS DOUBLE)"
      def mean(s: String) = f(s"CAST($s AS DOUBLE) / n")
      val histCols = (0 until 4).map(b =>
        s"sum(CASE WHEN (s + 32768) // 16384 = $b THEN 1 ELSE 0 END) AS hb$b")
        .mkString(",\n         ")
      val histSel = (0 until 4).map(b => s"${mean(s"hb$b")} AS f${10 + b}")
        .mkString(",\n       ")
      s"""WITH ids AS (SELECT doc_id, CAST(256 + doc_id % 97 AS BIGINT) AS n
         |             FROM documents WHERE doc_id < 200),
         |smp AS (SELECT doc_id, n, unnest(range(0, n)) AS t FROM ids),
         |v AS (SELECT doc_id, n, t,
         |        ((doc_id * 37 + t * 101 + ((t * t) % 9973) * 29) % 65536) - 32768 AS s
         |      FROM smp),
         |zrows AS (SELECT doc_id,
         |        CASE WHEN (s >= 0) != (lag(s) OVER (PARTITION BY doc_id ORDER BY t) >= 0)
         |             THEN 1 ELSE 0 END AS z
         |      FROM v),
         |zagg AS (SELECT doc_id, sum(z) AS zc FROM zrows GROUP BY doc_id),
         |agg AS (SELECT doc_id, any_value(n) AS n, min(s) AS mn, max(s) AS mx,
         |         sum(s) AS ssum, sum(abs(s)) AS sabs, sum(s * s) AS se,
         |         $histCols
         |        FROM v GROUP BY doc_id)
         |SELECT doc_id,
         |       ${f("1")} AS f0, ${f("8000")} AS f1, ${f("16")} AS f2,
         |       ${f("n")} AS f3, ${f("mn")} AS f4, ${f("mx")} AS f5,
         |       ${mean("ssum")} AS f6, ${mean("sabs")} AS f7,
         |       ${f("zc")} AS f8, ${mean("se")} AS f9,
         |       $histSel
         |FROM agg JOIN zagg USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "q79_video_decode" -> {
      // mirrors Multimodal.packSyntheticGifs (frame/pixel/palette
      // formulas) + GifVideoDecoder feature arithmetic exactly
      def f(expr: String) = s"CAST(CAST($expr AS FLOAT) AS DOUBLE)"
      def mean(s: String) = f(s"CAST($s AS DOUBLE) / n")
      val histCols = (0 until 6).map(i =>
        s"sum(CASE WHEN least(luma // 43, 5) = $i THEN 1 ELSE 0 END) AS hh$i")
        .mkString(",\n         ")
      val histSel = (0 until 6).map(i => s"${mean(s"hh$i")} AS f${10 + i}")
        .mkString(",\n       ")
      s"""WITH ids AS (SELECT doc_id, CAST(2 + doc_id % 4 AS BIGINT) AS nf,
         |                    CAST(8 + doc_id % 6 AS BIGINT) AS w,
         |                    CAST(8 + doc_id % 5 AS BIGINT) AS h
         |             FROM documents WHERE doc_id < 150),
         |fr AS (SELECT doc_id, nf, w, h, unnest(range(0, nf)) AS fidx FROM ids),
         |px AS (SELECT doc_id, nf, w, h, fidx, unnest(range(0, w * h)) AS p FROM fr),
         |pi AS (SELECT doc_id, nf, w, h, fidx,
         |         (doc_id * 13 + fidx * 101 + (p % w) * 7 + (p // w) * 29) % 256 AS i
         |       FROM px),
         |v AS (SELECT doc_id, nf, w, h, fidx,
         |        (i * 37 + 11) % 256 AS r, (i * 59 + 3) % 256 AS g,
         |        (i * 83 + 7) % 256 AS b
         |      FROM pi),
         |l AS (SELECT *, (r * 299 + g * 587 + b * 114) // 1000 AS luma FROM v),
         |agg AS (SELECT doc_id, any_value(nf) AS nf, any_value(w) AS w,
         |         any_value(h) AS h, count(*) AS n,
         |         sum(r) AS sr, sum(g) AS sg, sum(b) AS sb, sum(luma) AS sl,
         |         sum(CASE WHEN fidx = 0 THEN luma ELSE 0 END) AS sl0,
         |         sum(CASE WHEN fidx = nf - 1 THEN luma ELSE 0 END) AS sln,
         |         $histCols
         |        FROM l GROUP BY doc_id)
         |SELECT doc_id,
         |       ${f("nf")} AS f0, ${f("w")} AS f1, ${f("h")} AS f2, ${f("n")} AS f3,
         |       ${mean("sr")} AS f4, ${mean("sg")} AS f5, ${mean("sb")} AS f6,
         |       ${mean("sl")} AS f7,
         |       ${f("CAST(sl0 AS DOUBLE) / (w * h)")} AS f8,
         |       ${f("CAST(sln AS DOUBLE) / (w * h)")} AS f9,
         |       $histSel
         |FROM agg ORDER BY doc_id""".stripMargin
    },
    "q80_pii_redact" -> {
      // same injected suffix, same pattern strings (Java/RE2-common
      // subset), same replace order as TextAnalysis.redactPii
      val e = graft.operators.TextAnalysis.EmailPattern
      val ip = graft.operators.TextAnalysis.Ipv4Pattern
      val ph = graft.operators.TextAnalysis.PhonePattern
      s"""WITH p AS (SELECT doc_id,
         |        text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         |        || CASE WHEN doc_id % 3 != 1
         |             THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
         |                  || '.0.' || CAST(doc_id % 250 AS VARCHAR)
         |             ELSE '' END
         |        || CASE WHEN doc_id % 2 = 0
         |             THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |             ELSE '' END AS text
         |      FROM documents)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '$e')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
         |       CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phones,
         |       md5(regexp_replace(regexp_replace(regexp_replace(text,
         |         '$e', '<EMAIL>', 'g'),
         |         '$ip', '<IP>', 'g'),
         |         '$ph', '<PHONE>', 'g')) AS redacted_md5
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "q81_line_boilerplate" ->
      s"""WITH $corpusSql,
         |toks AS (SELECT doc_id, $toksSql AS t FROM corpus),
         |ln AS (SELECT doc_id,
         |         unnest(list_transform(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT)),
         |           i -> struct_pack(line_no := i,
         |             line := array_to_string(list_slice(t, i * 8 + 1, i * 8 + 8), ' ')))) AS s
         |       FROM toks),
         |l2 AS (SELECT doc_id, s.line_no AS line_no, s.line AS line FROM ln),
         |freq AS (SELECT line, count(DISTINCT doc_id) AS df FROM l2 GROUP BY line),
         |tg AS (SELECT l2.doc_id, l2.line_no, l2.line, freq.df >= 3 AS is_boiler
         |       FROM l2 JOIN freq USING (line)),
         |agg AS (SELECT doc_id, count(*) AS n_lines,
         |         CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |         coalesce(array_to_string(list(line ORDER BY line_no)
         |           FILTER (WHERE NOT is_boiler), ' '), '') AS cleaned
         |        FROM tg GROUP BY doc_id)
         |SELECT doc_id, n_lines, n_removed, md5(cleaned) AS cleaned_md5
         |FROM agg ORDER BY doc_id""".stripMargin,
    "q107_line_dedup_keepfirst" ->
      s"""WITH $corpusSql,
         |toks AS (SELECT doc_id, $toksSql AS t FROM corpus),
         |ln AS (SELECT doc_id,
         |         unnest(list_transform(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT)),
         |           i -> struct_pack(line_no := i,
         |             line := array_to_string(list_slice(t, i * 8 + 1, i * 8 + 8), ' ')))) AS s
         |       FROM toks),
         |l2 AS (SELECT doc_id, s.line_no AS line_no, s.line AS line FROM ln),
         |rk AS (SELECT doc_id, line_no, line,
         |         row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
         |       FROM l2),
         |agg AS (SELECT doc_id, count(*) AS n_lines,
         |         CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |         coalesce(array_to_string(list(line ORDER BY line_no)
         |           FILTER (WHERE rn = 1), ' '), '') AS cleaned
         |        FROM rk GROUP BY doc_id)
         |SELECT doc_id, n_lines, n_removed, md5(cleaned) AS cleaned_md5
         |FROM agg ORDER BY doc_id""".stripMargin,
    "q117_pipeline_yield" ->
      s"""WITH $corpusSql,
         |base AS (SELECT doc_id, text, $toksSql AS t FROM corpus),
         |stats AS (SELECT doc_id, text,
         |    len(t) AS n_tokens,
         |    ROUND(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4) AS distinct_ratio,
         |    ROUND(CAST(list_sum(list_transform(t, s -> length(s))) AS DOUBLE) / len(t), 4) AS avg_token_len,
         |    ROUND(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to'))) AS DOUBLE) / len(t), 4) AS stopword_ratio
         |  FROM base),
         |q AS (SELECT doc_id, text FROM stats
         |  WHERE ROUND((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.25 ELSE 0.0 END
         |      + CASE WHEN avg_token_len BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0.0 END
         |      + CASE WHEN distinct_ratio >= 0.3 THEN 0.25 ELSE 0.0 END
         |      + CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END), 2) >= 0.5),
         |w AS (SELECT md5(text) AS h, min(doc_id) AS doc_id FROM q GROUP BY 1),
         |d AS (SELECT q.doc_id, q.text FROM q JOIN w ON w.doc_id = q.doc_id),
         |toksd AS (SELECT doc_id, $toksSql AS t FROM d),
         |bsh AS (SELECT DISTINCT shingle FROM (
         |    SELECT unnest(list_distinct(list_transform(range(1, greatest(len(t)-1, 1)),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
         |    FROM base WHERE doc_id < 5 AND len(t) >= 3)),
         |tsh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(t)-1, 1)),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
         |    FROM toksd WHERE doc_id >= 5 AND len(t) >= 3),
         |dropped AS (SELECT DISTINCT doc_id FROM tsh JOIN bsh USING (shingle)),
         |e AS (SELECT * FROM d WHERE doc_id >= 5
         |      AND doc_id NOT IN (SELECT doc_id FROM dropped))
         |SELECT * FROM (
         |  SELECT '00_ingest' AS stage, count(*) AS n_docs FROM corpus
         |  UNION ALL SELECT '10_quality', count(*) FROM q
         |  UNION ALL SELECT '20_dedup', count(*) FROM d
         |  UNION ALL SELECT '30_decontam', count(*) FROM e)
         |ORDER BY stage""".stripMargin,
    "q122_rag_retrieval" -> {
      // the q119 chunk CTE feeding a 16-bucket hashed-BoW embed, then
      // min-pool + row_number top-3 per query — (dist, doc_id) order
      // matches the bounded-heap aggregate's lexicographic contract
      def bucket(j: Int) =
        s"len(list_filter(ct, x -> (${termHashSql("x")}) % $RagDim = $j))"
      val embCols = (0 until RagDim).map(j => s"${bucket(j)} AS c$j").mkString(", ")
      val qCols = (0 until RagDim).map(j => s"c$j AS q$j").mkString(", ")
      val distSql = (0 until RagDim)
        .map(j => s"(q.q$j - e.c$j) * (q.q$j - e.c$j)").mkString(" + ")
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |w AS (SELECT doc_id, t,
         |        greatest(1, CAST(ceil((len(t) - 8) / 4.0) AS INT) + 1) AS nw FROM toks),
         |ch AS (SELECT doc_id, unnest(list_transform(range(0, nw),
         |        i -> struct_pack(chunk_no := i,
         |          chunk := array_to_string(list_slice(t, i*4 + 1, i*4 + 8), ' ')))) AS s
         |      FROM w),
         |f AS (SELECT doc_id, s.chunk_no AS chunk_no,
         |        string_split(s.chunk, ' ') AS ct FROM ch),
         |e AS (SELECT doc_id, chunk_no, $embCols FROM f),
         |q AS (SELECT doc_id * 1000 + chunk_no AS query_id, $qCols
         |      FROM e WHERE doc_id < 3 AND chunk_no < 2),
         |d AS (SELECT q.query_id, e.doc_id,
         |        CAST($distSql AS DOUBLE) AS dist FROM e CROSS JOIN q),
         |b AS (SELECT query_id, doc_id, min(dist) AS dist FROM d GROUP BY 1, 2),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY dist, doc_id) AS rnk FROM b)
         |SELECT query_id, doc_id, dist, CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin
    },
    "q150_maxsim_retrieval" -> {
      // q122's chunk/bucket CTEs, then MaxSim: per-(query-chunk, doc)
      // max dot, per-(query-doc, doc) sum, top-3 by (score DESC, id)
      def bucket(j: Int) =
        s"len(list_filter(ct, x -> (${termHashSql("x")}) % $RagDim = $j))"
      val embCols = (0 until RagDim).map(j => s"${bucket(j)} AS c$j").mkString(", ")
      val qCols = (0 until RagDim).map(j => s"c$j AS q$j").mkString(", ")
      val dotSql = (0 until RagDim).map(j => s"q.q$j * e.c$j").mkString(" + ")
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |w AS (SELECT doc_id, t,
         |        greatest(1, CAST(ceil((len(t) - 8) / 4.0) AS INT) + 1) AS nw FROM toks),
         |ch AS (SELECT doc_id, unnest(list_transform(range(0, nw),
         |        i -> struct_pack(chunk_no := i,
         |          chunk := array_to_string(list_slice(t, i*4 + 1, i*4 + 8), ' ')))) AS s
         |      FROM w),
         |f AS (SELECT doc_id, s.chunk_no AS chunk_no,
         |        string_split(s.chunk, ' ') AS ct FROM ch),
         |e AS (SELECT doc_id, chunk_no, $embCols FROM f),
         |q AS (SELECT doc_id AS q_doc, chunk_no AS q_chunk, $qCols
         |      FROM e WHERE doc_id < 3),
         |d AS (SELECT q.q_doc, q.q_chunk, e.doc_id, ($dotSql) AS dot
         |      FROM e CROSS JOIN q),
         |m AS (SELECT q_doc, q_chunk, doc_id, max(dot) AS m FROM d GROUP BY 1, 2, 3),
         |s AS (SELECT q_doc, doc_id, CAST(SUM(m) AS BIGINT) AS score FROM m GROUP BY 1, 2),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_doc
         |        ORDER BY score DESC, doc_id) AS rnk FROM s)
         |SELECT q_doc, doc_id, score, CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY q_doc, rnk""".stripMargin
    },
    "q119_chunk_overlap" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |w AS (SELECT doc_id, t,
         |        greatest(1, CAST(ceil((len(t) - 8) / 4.0) AS INT) + 1) AS nw FROM toks),
         |c AS (SELECT doc_id, unnest(list_transform(range(0, nw),
         |        i -> struct_pack(chunk_no := i,
         |          chunk := array_to_string(list_slice(t, i*4 + 1, i*4 + 8), ' ')))) AS s
         |      FROM w),
         |f AS (SELECT doc_id, s.chunk_no AS chunk_no, s.chunk AS chunk FROM c)
         |SELECT doc_id, chunk_no, md5(chunk) AS chunk_md5,
         |  len(regexp_split_to_array(trim(lower(chunk)), '\\s+')) AS n_tokens
         |FROM f ORDER BY doc_id, chunk_no""".stripMargin,
    // q160: RANK() - 1 == count-strictly-below (the tie-aware
    // percentile), fp = (cnt_less * 1e6) // (n - 1) exact floor ints,
    // blend = mean of fps by integer div; stats replay q46's CTE.
    "q160_quality_blend" ->
      s"""WITH base AS (
         |  SELECT doc_id, $toksSql AS t FROM documents),
         |stats AS (
         |  SELECT doc_id,
         |    ROUND(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4) AS distinct_ratio,
         |    ROUND(CAST(list_sum(list_transform(t, s -> length(s))) AS DOUBLE) / len(t), 4) AS avg_token_len,
         |    ROUND(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to'))) AS DOUBLE) / len(t), 4) AS stopword_ratio,
         |    len(t) AS n_tokens
         |  FROM base),
         |scored AS (
         |  SELECT doc_id, distinct_ratio,
         |    ROUND((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.25 ELSE 0.0 END
         |         + CASE WHEN avg_token_len BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0.0 END
         |         + CASE WHEN distinct_ratio >= 0.3 THEN 0.25 ELSE 0.0 END
         |         + CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END), 2) AS quality_score
         |  FROM stats),
         |nn AS (SELECT GREATEST(count(*) - 1, 1) AS nm1 FROM scored),
         |f AS (SELECT doc_id,
         |        (CAST(RANK() OVER (ORDER BY quality_score) - 1 AS BIGINT) * 1000000) // nn.nm1 AS q_fp,
         |        (CAST(RANK() OVER (ORDER BY distinct_ratio) - 1 AS BIGINT) * 1000000) // nn.nm1 AS d_fp
         |      FROM scored CROSS JOIN nn)
         |SELECT doc_id, q_fp / 1000000.0 AS quality_pct, d_fp / 1000000.0 AS distinct_pct,
         |       ((q_fp + d_fp) // 2) / 1000000.0 AS blend
         |FROM f ORDER BY doc_id""".stripMargin,
    // q158: tf and df exact ints over one token CTE; idf quantized to
    // a 1e6 fixed-point BIGINT before the tf multiply (the bm25Ctes
    // idiom), ROW_NUMBER per doc with term tie-break.
    "q158_tfidf_keywords" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |dtc AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |nd AS (SELECT count(DISTINCT doc_id) AS n FROM dtc),
         |dfc AS (SELECT term, count(*) AS dft FROM dtc GROUP BY 1),
         |s AS (SELECT dtc.doc_id, dtc.term, dtc.tf,
         |        dtc.tf * CAST(ROUND(LN(CAST(nd.n AS DOUBLE) / CAST(dfc.dft AS DOUBLE))
         |          * 1000000.0) AS BIGINT) AS score_fp
         |      FROM dtc JOIN dfc USING (term) CROSS JOIN nd),
         |r AS (SELECT *, ROW_NUMBER() OVER
         |        (PARTITION BY doc_id ORDER BY score_fp DESC, term) AS rnk FROM s)
         |SELECT doc_id, CAST(rnk AS INT) AS rnk, term, tf, score_fp
         |FROM r WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin,
    // q157: top-16 vocab by (count DESC, term), then per-source
    // covered occurrences + distinct OOV types — DuckDB SUM(BIGINT)
    // widens to HUGEINT, so every sum is cast back before compare.
    "q157_vocab_coverage" ->
      s"""WITH toks AS (SELECT source, unnest($toksSql) AS term FROM documents),
         |stc AS (SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2),
         |tot AS (SELECT term, CAST(sum(c) AS BIGINT) AS tc FROM stc GROUP BY 1),
         |v AS (SELECT term FROM (SELECT term,
         |        ROW_NUMBER() OVER (ORDER BY tc DESC, term) AS rn FROM tot)
         |      WHERE rn <= 16),
         |cov AS (SELECT s.source, CAST(sum(s.c) AS BIGINT) AS n_tokens,
         |        CAST(sum(CASE WHEN v.term IS NOT NULL THEN s.c ELSE 0 END) AS BIGINT) AS covered,
         |        count(DISTINCT CASE WHEN v.term IS NULL THEN s.term END) AS oov_types
         |      FROM stc s LEFT JOIN v ON v.term = s.term GROUP BY 1)
         |SELECT source, n_tokens,
         |       ROUND(CAST(covered AS DOUBLE) / n_tokens, 6) + 0.0 AS covered_frac,
         |       oov_types
         |FROM cov ORDER BY source""".stripMargin,
    // q170: shard grouping re-derived directly from documents — the
    // hash gate proves the release publish/verify/serve loop is
    // content-preserving.
    "q170_corpus_release" ->
      """SELECT CAST(doc_id % 8 AS INT) AS shard, count(*) AS n_docs,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,
    // q168: the merged-drops frame re-derived directly from documents
    // (drop 1 predates the lang column -> NULL back-fill).
    "q168_schema_evolution" ->
      s"""WITH m AS (
         |  SELECT 1 AS drop_no, doc_id, source, CAST(NULL AS VARCHAR) AS lang
         |  FROM documents WHERE doc_id < 250
         |  UNION ALL
         |  SELECT 2 AS drop_no, doc_id, source, lang
         |  FROM documents WHERE doc_id >= 250)
         |SELECT drop_no, count(*) AS n_rows,
         |       count(lang) AS n_lang_present,
         |       ROUND(CAST(count(lang) AS DOUBLE) / count(*), 6) + 0.0 AS lang_completeness,
         |       count(DISTINCT source) AS n_sources
         |FROM m GROUP BY 1 ORDER BY drop_no""".stripMargin,
    // q167: replace-based occurrence counts per pattern — equals the
    // automaton's all-positions count because the phrases have no
    // proper border (multi-word: no self-overlap possible).
    "q167_canary_counts" -> {
      val vals = BlockPhrases.zipWithIndex
        .map { case (p, i) => s"(${i + 1}, '$p')" }.mkString(", ")
      s"""WITH pats(i, p) AS (VALUES $vals),
         |c AS (SELECT d.doc_id, pats.i, pats.p,
         |        (length(d.text) - length(replace(d.text, pats.p, ''))) // length(pats.p) AS cnt
         |      FROM documents d CROSS JOIN pats)
         |SELECT i AS pattern_id, p AS pattern,
         |       CAST(SUM(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         |       CAST(SUM(cnt) AS BIGINT) AS n_occurrences
         |FROM c GROUP BY 1, 2 ORDER BY pattern_id""".stripMargin
    },
    // q156: per-pattern contains() replay of the Aho-Corasick screen
    // (the oracle is O(patterns) per row — exactly the cost shape the
    // automaton collapses to one walk).
    "q156_blocklist_screen" -> {
      val arr = BlockPhrases.map(p => s"'$p'").mkString("[", ", ", "]")
      s"""WITH m AS (SELECT doc_id,
         |        list_filter(range(1, ${BlockPhrases.length + 1}),
         |          i -> contains(text, ($arr)[i])) AS l
         |      FROM documents)
         |SELECT doc_id, CAST(len(l) AS INT) AS n_matched,
         |       array_to_string(list_transform(l, x -> CAST(x AS VARCHAR)), ',') AS matched
         |FROM m WHERE len(l) > 0 ORDER BY doc_id""".stripMargin
    },
    "q116_pmi_collocations" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |u AS (SELECT unnest(t) AS term FROM toks),
         |uni AS (SELECT term, count(*) AS c FROM u GROUP BY 1),
         |nu AS (SELECT count(*) AS n FROM u),
         |b0 AS (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
         |       FROM toks WHERE len(t) >= 2),
         |nb AS (SELECT count(*) AS n FROM b0),
         |bi AS (SELECT bg, count(*) AS cab FROM b0 GROUP BY 1),
         |j AS (SELECT string_split(bg, ' ')[1] AS l, string_split(bg, ' ')[2] AS r, cab
         |      FROM bi WHERE cab >= 5),
         |p AS (SELECT j.l, j.r, j.cab,
         |        ROUND(LN((CAST(j.cab AS DOUBLE) * nu.n * nu.n) /
         |          (CAST(nb.n AS DOUBLE) * ul.c * ur.c)), 4) + 0.0 AS pmi
         |      FROM j JOIN uni ul ON ul.term = j.l JOIN uni ur ON ur.term = j.r
         |      CROSS JOIN nu CROSS JOIN nb)
         |SELECT l, r, cab, pmi FROM p ORDER BY pmi DESC, l, r LIMIT 20""".stripMargin,
    "q113_decontamination_report" ->
      s"""WITH ${shinglesCte("documents")},
         |bench AS (SELECT DISTINCT doc_id AS bench_id, shingle FROM sh WHERE doc_id < 5),
         |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 5)
         |SELECT bench_id, count(DISTINCT doc_id) AS n_leaking_docs,
         |  count(*) AS n_shared_pairs
         |FROM tr JOIN bench USING (shingle)
         |GROUP BY bench_id ORDER BY bench_id""".stripMargin,
    "q111_jsonl_ingest" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 50 <> 0 GROUP BY lang
        |UNION ALL
        |SELECT '__quarantined__' AS lang, count(*) AS n_docs, 0 AS sum_chars
        |FROM documents WHERE doc_id % 50 = 0
        |ORDER BY lang""".stripMargin,
    // q139: identical partition rule to q111 — the CSV dump corrupts
    // exactly the doc_id % 50 == 0 lines.
    "q139_csv_ingest" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 50 <> 0 GROUP BY lang
        |UNION ALL
        |SELECT '__quarantined__' AS lang, count(*) AS n_docs, 0 AS sum_chars
        |FROM documents WHERE doc_id % 50 = 0
        |ORDER BY lang""".stripMargin,
    "q110_unicode_normalize" ->
      """WITH inj AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 2 = 0 THEN ' caf' || chr(233) || ' unicode'
        |                 ELSE ' cafe' || chr(769) || ' unicode' END AS t
        |  FROM documents)
        |SELECT doc_id, length(t) AS pre_len, length(nfc_normalize(t)) AS post_len,
        |  md5(nfc_normalize(t)) AS norm_md5
        |FROM inj ORDER BY doc_id""".stripMargin,
    "q108_corpus_card" ->
      s"""WITH ingest AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM documents
         |  UNION ALL SELECT doc_id + 300000, text, lang, 'mirror', n_chars
         |    FROM documents WHERE doc_id < 10),
         |b AS (SELECT doc_id, lang, source, n_chars,
         |             len($toksSql) AS n_tokens, md5(text) AS h FROM ingest),
         |c AS (SELECT h, count(*) AS n_copies FROM b GROUP BY 1)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  count(DISTINCT lang) AS n_langs,
         |  CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
         |FROM b JOIN c USING (h)
         |GROUP BY source ORDER BY source""".stripMargin,
    "q74_span_removal" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |tids AS (SELECT doc_id, t, list_transform(t, x -> ${termHashSql("x")}) AS h,
         |                list_transform(t, x -> ${termHash2Sql("x")}) AS h2 FROM toks),
         |wins AS (SELECT doc_id, unnest(list_transform(range(0, len(h) - 7),
         |           i -> struct_pack(pos := i, cid := $chunkIdSql))) AS w
         |         FROM tids WHERE len(h) >= 8),
         |w2 AS (SELECT doc_id, w.pos AS pos, w.cid AS cid FROM wins),
         |canon AS (SELECT cid, min(doc_id) AS canon FROM w2
         |          GROUP BY cid HAVING count(DISTINCT doc_id) > 1),
         |rem AS (SELECT w2.doc_id, list_sort(list(DISTINCT w2.pos)) AS starts
         |        FROM w2 JOIN canon USING (cid)
         |        WHERE w2.doc_id <> canon.canon GROUP BY w2.doc_id),
         |prot AS (SELECT w2.doc_id, list_sort(list(DISTINCT w2.pos)) AS pstarts
         |         FROM w2 JOIN canon USING (cid)
         |         WHERE w2.doc_id = canon.canon GROUP BY w2.doc_id),
         |cut AS (SELECT t.doc_id, t.t,
         |          list_filter(t.t, (x, i) -> len(list_filter(COALESCE(r.starts, []::BIGINT[]),
         |            s -> s <= i - 1 AND i - 1 < s + 8)) = 0
         |            OR len(list_filter(COALESCE(p.pstarts, []::BIGINT[]),
         |              s -> s <= i - 1 AND i - 1 < s + 8)) > 0) AS kept
         |        FROM tids t LEFT JOIN rem r USING (doc_id)
         |                    LEFT JOIN prot p USING (doc_id))
         |SELECT doc_id, len(t) AS n_tokens,
         |       len(t) - len(kept) AS n_removed,
         |       md5(CASE WHEN t IS NULL THEN NULL
         |                ELSE COALESCE(array_to_string(kept, ' '), '') END) AS cleaned_md5
         |FROM cut ORDER BY doc_id""".stripMargin,
    "q70_doc_nll" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |freq AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
         |nn AS (SELECT sum(cf) AS n_total FROM freq),
         |fp AS (SELECT term,
         |         CAST(ROUND(-LN(CAST(cf AS DOUBLE) / CAST(n_total AS DOUBLE)) * 10000) AS BIGINT) AS nll_fp
         |       FROM freq CROSS JOIN nn),
         |s AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |             sum(tf * nll_fp) AS fpsum
         |      FROM tf JOIN fp USING (term) GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         |       CAST((fpsum * 2 + n_tokens) // (n_tokens * 2) AS DOUBLE) / 10000.0 + 0.0 AS avg_nll
         |FROM s ORDER BY doc_id""".stripMargin,
    "q71_mix_sample" -> {
      val cases = MixtureRates.toSeq.sortBy(_._1)
        .map { case (s, r) => s"WHEN '$s' THEN ${math.round(r * 10000)}" }.mkString(" ")
      s"""WITH b AS (SELECT doc_id, lang, source,
         |  ((doc_id % 1000000007) * 654435747) % 1000000007 % 10000 AS bucket FROM documents)
         |SELECT doc_id, lang, source, bucket FROM b
         |WHERE bucket < CASE lang $cases ELSE 0 END
         |ORDER BY doc_id""".stripMargin
    },
    "q73_pack" ->
      s"""WITH t AS (SELECT doc_id, COALESCE(len($toksSql), 0) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset FROM t)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(tok_offset AS BIGINT) AS tok_offset,
         |  CAST(tok_offset // 512 AS BIGINT) AS bin_id,
         |  CAST(tok_offset % 512 AS BIGINT) AS bin_offset
         |FROM c ORDER BY doc_id""".stripMargin,
    "q72_src_quota" ->
      """WITH b AS (SELECT doc_id, source,
        |  ((doc_id % 1000000007) * 654435747) % 1000000007 % 10000 AS bucket FROM documents),
        |r AS (SELECT source, doc_id, bucket,
        |  row_number() OVER (PARTITION BY source ORDER BY bucket, doc_id) AS rn FROM b)
        |SELECT source, doc_id, bucket FROM r WHERE rn <= 15
        |ORDER BY source, bucket, doc_id""".stripMargin,
    "q53_dataset_split" ->
      """WITH b AS (SELECT doc_id, ((doc_id % 1000000007) * 654435747) % 1000000007 % 100 AS bucket FROM documents),
        |s AS (SELECT doc_id, CASE WHEN bucket < 80 THEN 'train'
        |                          WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM b)
        |SELECT split, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id,
        |       CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "q82_semantic_dedup" ->
      """WITH ec AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 25),
        |e AS (SELECT vec_id, embedding,
        |  SQRT(list_sum(list_transform(range(1, len(embedding)+1),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm,
        |  ((vec_id % 1000000007) * 654435747) % 1000000007 % 10000 AS b
        |  FROM ec),
        |seeds AS (SELECT vec_id AS seed_id, embedding AS svec, nrm AS snrm
        |          FROM e ORDER BY b, vec_id LIMIT 8),
        |sims AS (SELECT e.vec_id, s.seed_id,
        |  COALESCE(list_sum(list_transform(range(1, len(e.embedding)+1),
        |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(s.svec[i] AS DOUBLE))) / (e.nrm * s.snrm), 0.0) AS sim
        |  FROM e CROSS JOIN seeds s),
        |assign AS (SELECT vec_id, seed_id AS cluster FROM (
        |  SELECT vec_id, seed_id,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, seed_id) AS rn
        |  FROM sims) WHERE rn = 1),
        |cl AS (SELECT e.vec_id, a.cluster, e.embedding, e.nrm FROM e JOIN assign a USING (vec_id)),
        |pairs AS (SELECT b.vec_id AS id_b, CAST(count(*) AS BIGINT) AS n_dup_smaller
        |  FROM cl a JOIN cl b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE ROUND(COALESCE(list_sum(list_transform(range(1, len(a.embedding)+1),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (a.nrm * b.nrm), 0.0), 6) >= 0.9
        |  GROUP BY b.vec_id)
        |SELECT c.vec_id, c.cluster, CAST(COALESCE(p.n_dup_smaller, 0) AS BIGINT) AS n_dup_smaller,
        |  CAST(COALESCE(p.n_dup_smaller, 0) = 0 AS INT) AS keep
        |FROM cl c LEFT JOIN pairs p ON c.vec_id = p.id_b ORDER BY c.vec_id""".stripMargin,
    "q83_hashed_quality" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |w AS (SELECT doc_id, ((${termHashSql("token")} % 64 + 1) * 48271) % 2001 - 1000 AS wt FROM tok),
         |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, CAST(sum(wt) AS BIGINT) AS score_fp
         |      FROM w GROUP BY doc_id)
         |SELECT doc_id, n_tokens, score_fp,
         |  CAST(score_fp > 0 AS INT) AS keep
         |FROM s ORDER BY doc_id""".stripMargin,
    "q84_lang_temperature" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
        |z AS (SELECT lang, n_docs,
        |      CAST(ROUND(SQRT(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS zi FROM c),
        |t AS (SELECT CAST(SUM(zi) AS BIGINT) AS z, CAST(SUM(n_docs) AS BIGINT) AS total FROM z)
        |SELECT lang, n_docs,
        |  ROUND(CAST(zi AS DOUBLE) / CAST(z AS DOUBLE), 6) + 0.0 AS weight,
        |  ROUND(LEAST(1.0, (CAST(zi AS DOUBLE) / CAST(z AS DOUBLE)) * (total * 0.5) / CAST(n_docs AS DOUBLE)), 6) + 0.0 AS rate
        |FROM z CROSS JOIN t ORDER BY lang""".stripMargin,
    "q85_curriculum" ->
      s"""WITH base AS (SELECT doc_id, $toksSql AS t FROM documents),
         |stats AS (SELECT doc_id,
         |    len(t) AS n_tokens,
         |    ROUND(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4) AS distinct_ratio,
         |    ROUND(CAST(list_sum(list_transform(t, s -> length(s))) AS DOUBLE) / len(t), 4) AS avg_token_len,
         |    ROUND(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to'))) AS DOUBLE) / len(t), 4) AS stopword_ratio
         |  FROM base),
         |sc AS (SELECT doc_id,
         |  ROUND((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.25 ELSE 0.0 END
         |       + CASE WHEN avg_token_len BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0.0 END
         |       + CASE WHEN distinct_ratio >= 0.3 THEN 0.25 ELSE 0.0 END
         |       + CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END), 2) AS quality_score
         |FROM stats)
         |SELECT doc_id, quality_score + 0.0 AS quality_score,
         |  CAST(ROW_NUMBER() OVER (ORDER BY quality_score DESC, doc_id) AS BIGINT) AS curriculum_rank
         |FROM sc ORDER BY curriculum_rank""".stripMargin,
    "q86_label_centroids" ->
      """WITH p AS (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS pos),
        |x AS (SELECT label, pos,
        |      CAST(ROUND(CAST(embedding[pos] AS DOUBLE) * 1000000.0) AS BIGINT) AS fp
        |      FROM embeddings CROSS JOIN p),
        |s AS (SELECT label, pos, CAST(count(*) AS BIGINT) AS n_vecs,
        |      CAST(SUM(fp) AS BIGINT) AS fpsum FROM x GROUP BY label, pos)
        |SELECT label, n_vecs, CAST(pos AS INT) AS pos,
        |  ROUND(CAST(fpsum AS DOUBLE) / (CAST(n_vecs AS DOUBLE) * 1000000.0), 4) + 0.0 AS centroid
        |FROM s ORDER BY label, pos""".stripMargin,
    "q87_int8_quantize" ->
      """WITH p AS (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS i),
        |m AS (SELECT i, max(abs(CAST(embedding[i] AS DOUBLE))) AS s
        |      FROM embeddings CROSS JOIN p GROUP BY i),
        |sl AS (SELECT list(s ORDER BY i) AS sl FROM m),
        |q AS (SELECT vec_id, embedding, sl,
        |        list_transform(range(1, len(embedding) + 1), i ->
        |          CASE WHEN sl[i] = 0 THEN 0
        |               ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) * 127.0 / sl[i] + 0.5) AS INT)
        |          END) AS codes
        |      FROM embeddings CROSS JOIN sl)
        |SELECT vec_id, array_to_string(codes, ',') AS codes_csv,
        |  ROUND(list_reduce(list_transform(range(1, len(embedding) + 1), i ->
        |          (CAST(embedding[i] AS DOUBLE) - codes[i] * sl[i] / 127.0)
        |          * (CAST(embedding[i] AS DOUBLE) - codes[i] * sl[i] / 127.0)),
        |        (a, b) -> a + b) / len(embedding), 6) + 0.0 AS mse
        |FROM q ORDER BY vec_id""".stripMargin,
    "q88_winnow_dedup" -> {
      val guard = 8 + 4 - 1 // k + w - 1
      s"""WITH $corpusSql,
         |toks AS (SELECT doc_id, $toksSql AS t FROM corpus),
         |tids AS (SELECT doc_id, list_transform(t, x -> ${termHashSql("x")}) AS h,
         |                list_transform(t, x -> ${termHash2Sql("x")}) AS h2
         |         FROM toks WHERE len(t) >= $guard),
         |cds AS (SELECT doc_id,
         |          list_transform(range(0, len(h) - 7), i -> $chunkIdSql) AS c
         |        FROM tids),
         |mins AS (SELECT doc_id, len(list_distinct(c)) AS n_chunks,
         |           unnest(list_distinct(list_transform(range(0, len(c) - 3),
         |             j -> list_min(c[j+1:j+4])))) AS mid
         |         FROM cds),
         |shared AS (SELECT mid FROM mins GROUP BY mid HAVING count(*) > 1),
         |per AS (SELECT m.doc_id, any_value(n_chunks) AS n_chunks, count(*) AS n_minimizers,
         |               sum(CASE WHEN s.mid IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
         |        FROM mins m LEFT JOIN shared s ON m.mid = s.mid
         |        GROUP BY m.doc_id)
         |SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
         |       CAST(n_minimizers AS BIGINT) AS n_minimizers,
         |       CAST(n_dup AS BIGINT) AS n_dup_minimizers,
         |       ROUND(CAST(n_dup AS DOUBLE) / CAST(n_minimizers AS DOUBLE), 4) + 0.0 AS dup_frac
         |FROM per WHERE n_dup > 0
         |ORDER BY dup_frac DESC, doc_id LIMIT 50""".stripMargin
    },
    "q89_source_overlap" ->
      s"""WITH toks AS (SELECT source, $toksSql AS t FROM documents),
         |tids AS (SELECT source, list_transform(t, x -> ${termHashSql("x")}) AS h,
         |                list_transform(t, x -> ${termHash2Sql("x")}) AS h2
         |         FROM toks WHERE len(t) >= 3),
         |sid AS (SELECT DISTINCT source, sid FROM (
         |          SELECT source, unnest(list_distinct(list_transform(range(0, len(h) - 2),
         |            i -> ${chunkIdSqlK(3)}))) AS sid
         |          FROM tids)),
         |sizes AS (SELECT source, count(*) AS n FROM sid GROUP BY source),
         |inter AS (SELECT x.source AS src_a, y.source AS src_b, count(*) AS n_shared
         |          FROM sid x JOIN sid y ON x.sid = y.sid AND x.source < y.source
         |          GROUP BY 1, 2)
         |SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
         |  ROUND(CAST(n_shared AS DOUBLE) / CAST(sa.n + sb.n - n_shared AS DOUBLE), 6) + 0.0 AS jaccard
         |FROM inter JOIN sizes sa ON sa.source = src_a JOIN sizes sb ON sb.source = src_b
         |ORDER BY jaccard DESC, src_a, src_b""".stripMargin,
    "q91_shard_plan" ->
      s"""WITH sized AS (SELECT doc_id, len($toksSql) AS n_tokens FROM documents),
         |r AS (SELECT doc_id, n_tokens,
         |        ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
         |      FROM sized)
         |SELECT CAST((rn - 1) % 8 AS INT) AS shard, count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM r GROUP BY 1 ORDER BY shard""".stripMargin,
    "q95_bigram_nll" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |tids AS (SELECT doc_id, list_transform(t, x -> ${termHashSql("x")}) AS h,
         |                list_transform(t, x -> ${termHash2Sql("x")}) AS h2
         |         FROM toks WHERE len(t) >= 1),
         |pairs AS (SELECT doc_id,
         |            unnest(list_transform(range(1, len(h)), i -> h[i])) AS prev,
         |            unnest(list_transform(range(1, len(h)), i ->
         |              ((h[i] * 31 + h[i+1]) % 1000000007) * 1000000000
         |              + ((h2[i] * 37 + h2[i+1]) % 999999937))) AS bg
         |          FROM tids WHERE len(h) >= 2),
         |tf2 AS (SELECT doc_id, prev, bg, count(*) AS tf FROM pairs GROUP BY 1, 2, 3),
         |cf2 AS (SELECT prev, bg, sum(tf) AS cf FROM tf2 GROUP BY 1, 2),
         |ctx AS (SELECT prev, sum(cf) AS n_ctx FROM cf2 GROUP BY 1),
         |nll2 AS (SELECT prev, bg,
         |           CAST(ROUND(-LN(CAST(cf AS DOUBLE) / CAST(n_ctx AS DOUBLE)) * 10000) AS BIGINT) AS nll_fp
         |         FROM cf2 JOIN ctx USING (prev)),
         |docbig AS (SELECT doc_id, sum(tf * nll_fp) AS fp2
         |           FROM tf2 JOIN nll2 USING (prev, bg) GROUP BY doc_id),
         |uf AS (SELECT tid, count(*) AS cf
         |       FROM (SELECT unnest(h) AS tid FROM tids) GROUP BY tid),
         |nt AS (SELECT sum(cf) AS n_total FROM uf),
         |nll1 AS (SELECT tid,
         |           CAST(ROUND(-LN(CAST(cf AS DOUBLE) / CAST(n_total AS DOUBLE)) * 10000) AS BIGINT) AS nll_fp
         |         FROM uf CROSS JOIN nt),
         |f AS (SELECT doc_id, h[1] AS tid, len(h) AS n_tokens FROM tids)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |       CAST(((nll_fp + COALESCE(fp2, 0)) * 2 + n_tokens) // (n_tokens * 2) AS DOUBLE)
         |         / 10000.0 + 0.0 AS avg_nll
         |FROM f JOIN nll1 USING (tid) LEFT JOIN docbig USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q96_semantic_decon" ->
      """WITH b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
        |tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 <> 0),
        |cos AS (SELECT tr.vec_id,
        |  COALESCE(list_sum(list_transform(range(1, len(tr.embedding)+1),
        |          i -> CAST(tr.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
        |        (SQRT(list_sum(list_transform(range(1, len(tr.embedding)+1),
        |          i -> CAST(tr.embedding[i] AS DOUBLE) * CAST(tr.embedding[i] AS DOUBLE)))) *
        |         SQRT(list_sum(list_transform(range(1, len(b.embedding)+1),
        |          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 0.0) AS c
        |  FROM tr CROSS JOIN b),
        |m AS (SELECT vec_id, ROUND(MAX(c), 4) + 0.0 AS max_cos FROM cos GROUP BY vec_id)
        |SELECT vec_id, max_cos, max_cos >= 0.8 AS contaminated
        |FROM m ORDER BY vec_id""".stripMargin,
    "q97_simhash_pairs" ->
      s"""WITH $corpusSql,
         |tok AS (SELECT doc_id, unnest($toksSql) AS token FROM corpus),
         |counts AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
         |dtc AS (SELECT doc_id, ${termHashSql("token")} AS tid, cnt FROM counts),
         |sums AS (SELECT doc_id, ${simhashSumsSql()} FROM dtc GROUP BY doc_id),
         |sh AS (SELECT doc_id, CAST(${simhashBitsSql()} AS BIGINT) AS sh FROM sums)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 1
         |ORDER BY id_a, id_b""".stripMargin,
    "q98_bpe_learn" -> {
      // one unrolled learning round: pair counts over the current
      // symbolization sI, argmax with the (count DESC, l, r)
      // tie-break, re-symbolize via the SAME string-accumulator fold
      // as the q78 apply oracle — but with the learned pair read from
      // the cross-joined 1-row mI instead of a baked-in literal
      def pairs(s: String, p: String, c: String, m: String) =
        s"""$p AS (SELECT unnest(list_transform(range(1, len(s)), j -> s[j])) AS l,
           |            unnest(list_transform(range(1, len(s)), j -> s[j+1])) AS r, cnt
           |     FROM $s WHERE len(s) >= 2),
           |$c AS (SELECT l, r, sum(cnt) AS c FROM $p GROUP BY l, r),
           |$m AS (SELECT l, r, c FROM $c ORDER BY c DESC, l, r LIMIT 1)""".stripMargin
      def resym(prev: String, m: String, next: String) =
        s"""$next AS (SELECT string_split(list_reduce(s, (a, x) ->
           |  CASE WHEN (a = $m.l OR ends_with(a, ' ' || $m.l)) AND x = $m.r
           |       THEN CASE WHEN a = $m.l THEN $m.l || $m.r
           |            ELSE left(a, length(a) - length($m.l)) || $m.l || $m.r END
           |       ELSE a || ' ' || x END), ' ') AS s, cnt
           |  FROM $prev CROSS JOIN $m)""".stripMargin
      s"""WITH w0 AS (SELECT w, count(*) AS cnt
         |            FROM (SELECT unnest($toksSql) AS w FROM documents)
         |            WHERE length(w) > 0 GROUP BY w),
         |s0 AS (SELECT string_split(w, '') AS s, cnt FROM w0),
         |${pairs("s0", "p1", "c1", "m1")},
         |${resym("s0", "m1", "s1")},
         |${pairs("s1", "p2", "c2", "m2")},
         |${resym("s1", "m2", "s2")},
         |${pairs("s2", "p3", "c3", "m3")}
         |SELECT * FROM (
         |  SELECT 1 AS rnk, l AS left_sym, r AS right_sym, CAST(c AS BIGINT) AS pair_count FROM m1
         |  UNION ALL SELECT 2, l, r, CAST(c AS BIGINT) FROM m2
         |  UNION ALL SELECT 3, l, r, CAST(c AS BIGINT) FROM m3)
         |ORDER BY rnk""".stripMargin
    },
    "q102_span_decontam" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |tids AS (SELECT doc_id, t, list_transform(t, x -> ${termHashSql("x")}) AS h,
         |                list_transform(t, x -> ${termHash2Sql("x")}) AS h2 FROM toks),
         |bcids AS (SELECT DISTINCT cid FROM (
         |            SELECT unnest(list_transform(range(0, len(h) - 7),
         |              i -> $chunkIdSql)) AS cid
         |            FROM tids WHERE doc_id < 5 AND len(h) >= 8)),
         |wins AS (SELECT doc_id, unnest(list_transform(range(0, len(h) - 7),
         |           i -> struct_pack(pos := i, cid := $chunkIdSql))) AS w
         |         FROM tids WHERE doc_id >= 5 AND len(h) >= 8),
         |w2 AS (SELECT doc_id, w.pos AS pos, w.cid AS cid FROM wins),
         |rem AS (SELECT w2.doc_id, list_sort(list(DISTINCT w2.pos)) AS starts
         |        FROM w2 JOIN bcids USING (cid) GROUP BY w2.doc_id),
         |cut AS (SELECT t.doc_id, t.t,
         |          list_filter(t.t, (x, i) -> len(list_filter(COALESCE(r.starts, []::BIGINT[]),
         |            s -> s <= i - 1 AND i - 1 < s + 8)) = 0) AS kept
         |        FROM tids t LEFT JOIN rem r USING (doc_id)
         |        WHERE t.doc_id >= 5)
         |SELECT doc_id, len(t) AS n_tokens,
         |       len(t) - len(kept) AS n_removed,
         |       md5(CASE WHEN t IS NULL THEN NULL
         |                ELSE COALESCE(array_to_string(kept, ' '), '') END) AS cleaned_md5
         |FROM cut ORDER BY doc_id""".stripMargin,
    "q103_srp_pairs" ->
      s"""WITH ec AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 25),
         |sg AS (SELECT vec_id, CAST($srpSigSql AS BIGINT) AS sig FROM ec)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM sg a JOIN sg b ON a.vec_id < b.vec_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 1
         |ORDER BY id_a, id_b""".stripMargin,
    "q185_srp_wide_tier" ->
      s"""WITH ec AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 25),
         |sg AS (SELECT vec_id, embedding, CAST(${srpSigSqlBits(64)} AS BIGINT) AS sig FROM ec),
         |bd AS (SELECT vec_id, sig, b.blk, (sig >> (b.blk * 16)) & 65535 AS bv
         |       FROM sg, (SELECT unnest([0, 1, 2, 3]) AS blk) b),
         |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |         FROM bd x JOIN bd y ON x.blk = y.blk AND x.bv = y.bv AND x.vec_id < y.vec_id),
         |hp AS (SELECT c.id_a, c.id_b FROM cand c
         |       JOIN sg a ON a.vec_id = c.id_a JOIN sg b ON b.vec_id = c.id_b
         |       WHERE bit_count(xor(a.sig, b.sig)) <= 3)
         |SELECT h.id_a, h.id_b,
         |  ROUND(COALESCE(list_sum(list_transform(range(1, len(a.embedding)+1),
         |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
         |        (SQRT(list_sum(list_transform(range(1, len(a.embedding)+1),
         |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
         |         SQRT(list_sum(list_transform(range(1, len(b.embedding)+1),
         |          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 0.0), 4) + 0.0 AS cos_sim,
         |  'srp-banded-64bit' AS tier
         |FROM hp h JOIN ec a ON a.vec_id = h.id_a JOIN ec b ON b.vec_id = h.id_b
         |ORDER BY cos_sim DESC, id_a, id_b LIMIT 20""".stripMargin,
    "q184_srp_neardup_tier" ->
      s"""WITH ec AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 25),
         |sg AS (SELECT vec_id, embedding, CAST($srpSigSql AS BIGINT) AS sig FROM ec),
         |bd AS (SELECT vec_id, sig, b.blk, (sig >> (b.blk * 8)) & 255 AS bv
         |       FROM sg, (SELECT unnest([0, 1, 2, 3]) AS blk) b),
         |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |         FROM bd x JOIN bd y ON x.blk = y.blk AND x.bv = y.bv AND x.vec_id < y.vec_id),
         |hp AS (SELECT c.id_a, c.id_b FROM cand c
         |       JOIN sg a ON a.vec_id = c.id_a JOIN sg b ON b.vec_id = c.id_b
         |       WHERE bit_count(xor(a.sig, b.sig)) <= 3)
         |SELECT h.id_a, h.id_b,
         |  ROUND(COALESCE(list_sum(list_transform(range(1, len(a.embedding)+1),
         |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
         |        (SQRT(list_sum(list_transform(range(1, len(a.embedding)+1),
         |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
         |         SQRT(list_sum(list_transform(range(1, len(b.embedding)+1),
         |          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 0.0), 4) + 0.0 AS cos_sim,
         |  'srp-banded-32bit' AS tier
         |FROM hp h JOIN ec a ON a.vec_id = h.id_a JOIN ec b ON b.vec_id = h.id_b
         |ORDER BY cos_sim DESC, id_a, id_b LIMIT 20""".stripMargin,
    "q104_strat_split" ->
      """WITH b AS (SELECT vec_id, CAST(label AS VARCHAR) AS stratum,
        |             ((vec_id % 1000000007) * 654435747) % 1000000007 % 10000 AS bkt
        |           FROM embeddings),
        |r AS (SELECT vec_id, stratum,
        |        ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY bkt, vec_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY stratum) AS n
        |      FROM b)
        |SELECT vec_id, stratum,
        |       CASE WHEN rn * 100 <= n * 10 THEN 'test'
        |            WHEN rn * 100 <= n * 20 THEN 'val'
        |            ELSE 'train' END AS split
        |FROM r ORDER BY vec_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q186_linear_filter" -> (linearFilter _),
    "q187_linear_filter_apply" -> (linearFilterApply _),
    "q188_dsir_filter" -> (dsirFilter _),
    "q189_dsir_topk" -> (dsirTopK _),
    "q190_filter_calibration" -> (filterCalibration _),
    "q191_distinct_ngrams" -> (distinctNgrams _),
    "q192_cdc_chunks" -> (cdcChunkCard _),
    "q193_unimax_alloc" -> (unimaxAlloc _),
    "q194_containment" -> (containmentCard _),
    "q197_orc_roundtrip" -> (orcRoundTrip _),
    "q198_dedup_tier_eval" -> (dedupTierEval _),
    "q199_lsh_threshold_sweep" -> (dedupThresholdSweep _),
    "q40_dedup_exact" -> (dedupExact _),
    "q41_ngram_jaccard" -> (ngramJaccard _),
    "q42_minhash_signatures" -> (minhashSignatures _),
    "q43_minhash_lsh" -> (minhashLsh _),
    "q147_editdist_verify" -> (editDistVerify _),
    "q148_verified_dedup" -> (verifiedDedup _),
    "q138_incremental_dedup" -> (incrementalDedup _),
    "q180_sigstore_merge" -> (sigstoreMergeProbe _),
    "q44_simhash" -> (simhash _),
    "q45_embedding_neardup" -> (embeddingNearDup _),
    "q46_text_stats" -> (textStats _),
    "q47_langid" -> (langId _),
    "q48_token_regex_count" -> (tokenRegexCount _),
    "q49_fingerprint" -> (fingerprint _),
    "q50_multimodal_meta" -> (multimodalMeta _),
    "q51_token_heavy_hitters" -> (tokenHeavyHitters _),
    "q124_frequent_ngrams" -> (frequentNgramCard _),
    "q125_weighted_sample" -> (weightedSampleCard _),
    "q126_bloom_decontaminate" -> (bloomDecontaminate _),
    "q129_token_drift" -> (tokenDrift _),
    "q131_source_drift" -> (sourceDrift _),
    "q133_image_neardup" -> (imageNearDup _),
    "q146_audio_neardup" -> (audioNearDup _),
    "q134_dedup_keep_best" -> (dedupKeepBest _),
    "q52_dedup_groups" -> (dedupGroups _),
    "q53_dataset_split" -> (datasetSplit _),
    "q54_multimodal_features" -> (multimodalFeatures _),
    "q55_frame_sample" -> (multimodalFrames _),
    "q56_embedding_neardup_lsh" -> (embeddingNearDupLsh _),
    "q58_tfidf" -> (tfidfTopTerms _),
    "q59_decontaminate" -> (decontaminate _),
    "q57_ngram_jaccard_capped" -> (ngramJaccardCapped _),
    "q64_repetition" -> (repetitionStats _),
    "q65_leakage_safe_split" -> (leakageSafeSplit _),
    "q69_chunk_dedup" -> (chunkDedup _),
    "q74_span_removal" -> (dedupSpanRemoval _),
    "q76_image_decode" -> (imageDecode _),
    "q77_audio_decode" -> (audioDecode _),
    "q78_bpe_tokens" -> (bpeTokens _),
    "q79_video_decode" -> (videoDecode _),
    "q80_pii_redact" -> (piiRedact _),
    "q81_line_boilerplate" -> (lineBoilerplate _),
    "q107_line_dedup_keepfirst" -> (lineDedupKeepFirst _),
    "q108_corpus_card" -> (corpusCard _),
    "q110_unicode_normalize" -> (unicodeNormalize _),
    "q111_jsonl_ingest" -> (jsonlIngest _),
    "q139_csv_ingest" -> (csvIngest _),
    "q113_decontamination_report" -> (decontaminationReport _),
    "q116_pmi_collocations" -> (pmiCollocations _),
    "q156_blocklist_screen" -> (blocklistScreen _),
    "q157_vocab_coverage" -> (vocabCoverage _),
    "q158_tfidf_keywords" -> (tfidfKeywords _),
    "q159_compress_quality" -> (compressQuality _),
    "q160_quality_blend" -> (qualityBlend _),
    "q163_dup_rate_by_source" -> (dupRateBySource _),
    "q167_canary_counts" -> (canaryCounts _),
    "q168_schema_evolution" -> (schemaEvolution _),
    "q169_langid_confusion" -> (langidConfusion _),
    "q170_corpus_release" -> (corpusReleaseAudit _),
    "q171_dup_cluster_report" -> (dupClusterReport _),
    "q173_tokenizer_fertility" -> (tokenizerFertility _),
    "q119_chunk_overlap" -> (chunkOverlap _),
    "q122_rag_retrieval" -> (ragRetrieval _),
    "q150_maxsim_retrieval" -> (maxsimRetrieval _),
    "q117_pipeline_yield" -> (pipelineYield _),
    "q70_doc_nll" -> (unigramNll _),
    "q71_mix_sample" -> (mixtureSample _),
    "q72_src_quota" -> (sourceQuota _),
    "q73_pack" -> (seqPack _),
    "q82_semantic_dedup" -> (semanticDedup _),
    "q83_hashed_quality" -> (hashedQuality _),
    "q84_lang_temperature" -> (sourceTemperature _),
    "q85_curriculum" -> (curriculumOrder _),
    "q86_label_centroids" -> (labelCentroids _),
    "q87_int8_quantize" -> (int8Quantize _),
    "q88_winnow_dedup" -> (winnowDedup _),
    "q89_source_overlap" -> (sourceOverlap _),
    "q91_shard_plan" -> (shardPlan _),
    "q95_bigram_nll" -> (bigramNll _),
    "q96_semantic_decon" -> (semanticDecon _),
    "q97_simhash_pairs" -> (simhashPairs _),
    "q98_bpe_learn" -> (bpeLearn _),
    "q102_span_decontam" -> (spanDecontaminate _),
    "q103_srp_pairs" -> (srpPairs _),
    "q184_srp_neardup_tier" -> (srpNearDupTier _),
    "q185_srp_wide_tier" -> (srpWideNearDupTier _),
    "q104_strat_split" -> (stratSplit _)
  )
}
