package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, document statistics, quality scoring, language ID
  * (marker-token heuristic), regex token counting, and rolling-hash
  * fingerprinting.
  *
  * Every operator is a pure column expression (codegen'd, no UDFs) with
  * a deterministic arithmetic definition, so results are reproducible
  * bit-for-bit across engines and cluster sizes — the same property the
  * relational oracles rely on. All are per-row map operations: at
  * 100 TB they pipeline inside the Parquet scan stage with zero
  * shuffle; only the optional vocabulary ranking (see [[Vocabulary]])
  * needs a global pass.
  */
object TextAnalysis {

  import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}

  /** Unicode normalization (default NFC) — native codegen'd
    * expression ([[graft.functions.expressions.NormalizeUnicode]]).
    * Run at ingest, BEFORE any content hash: composed vs decomposed
    * encodings of the same visible text otherwise fracture every
    * downstream identity (exact-dedup md5, shingle/chunk hashes, BPE
    * merges, boilerplate line keys). */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(graft.functions.expressions.NormalizeUnicode(
      ExpressionUtils.expression(text), form))

  /** Canonical tokenization contract shared with the oracles:
    * lowercase, trim, split on runs of whitespace. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Word k-shingles joined by single spaces; empty when < k tokens.
    * One compiled loop per row ([[graft.functions.expressions
    * .ShingleJoin]]); the HOF twin below is the property-spec
    * reference. */
  def shingles(toks: Column, k: Int): Column =
    ExpressionUtils.column(graft.functions.expressions.ShingleJoin(
      ExpressionUtils.expression(toks), k))

  /** Interpreted HOF twin of [[shingles]], kept ONLY as the reference
    * side of the bit-identity property spec (TextStatsKernelSpec).
    * (The when-guard matters: Spark `sequence(1, n)` with n < 1 counts
    * DOWN, unlike DuckDB's empty range.) */
  private[graft] def shinglesHof(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)), i =>
        concat_ws(" ", (0 until k).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Overlapping fixed-token chunking (the RAG / embedding-prep
    * splitter): windows of `size` tokens every `stride` tokens, so
    * consecutive chunks share `size − stride` tokens of context and no
    * sentence straddles a hard boundary unseen. The final partial
    * window is kept (a document shorter than `size` is one chunk) —
    * dropping tails silently loses corpus. Emits
    * (id, chunk_no, chunk, n_tokens); chunk_no is the 0-based window
    * index, so parent-doc provenance (q109's passage→doc shape) is
    * `(id, chunk_no)` with no extra bookkeeping.
    *
    * One narrow projection per row — posexplode of a transform over
    * the token array; no shuffle, scan-bound at any scale. */
  def chunkTokens(df: DataFrame, size: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"need 1 <= stride <= size, got size=$size stride=$stride")
    val toks = tokens(col(textCol))
    val nWin = greatest(lit(1),
      (ceil((size_(toks) - lit(size)) / lit(stride.toDouble)) + lit(1)).cast("int"))
    val chunks = transform(sequence(lit(0), nWin - 1), i =>
      array_join(slice(toks, i * stride + 1, lit(size)), " "))
    df.select(col(idCol).as("id"), posexplode(chunks).as(Seq("chunk_no", "chunk")))
      .withColumn("n_tokens", size_(tokens(col("chunk"))))
  }
  // scala.Predef-free alias: org.apache.spark.sql.functions.size
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Exact support-threshold n-gram mining (contamination / template
    * phrase detection): every word n-gram whose DOCUMENT frequency is
    * ≥ `minCount`, with its exact count — in two bounded-state passes,
    * never a full n-gram shuffle.
    *
    * Why not `groupBy(ngram).count` directly: distinct n-grams grow
    * with the corpus (unlike a word vocabulary), so at 100 TB that
    * plan's exchange carries roughly the corpus over again. Here
    * pass 1 reduces the scan to ONE Misra–Gries summary row
    * ([[graft.functions.expressions.MisraGriesAgg]]): partial state
    * ≤ k entries per partition, merged map-side — guaranteed to
    * contain every n-gram with frequency > N/k. The runtime guard
    * `minCount · k > N` makes that guarantee cover the requested
    * threshold, failing loudly instead of silently dropping heavy
    * hitters when k is sized too small for the corpus. Pass 2 re-scans
    * with the ≤ k candidates broadcast (an equi-join, no full-set
    * shuffle — the counted side is candidate-matching rows only) and
    * counts them exactly. The candidate SET is partition-order
    * dependent; the OUTPUT is not: it is the exact count of a
    * guaranteed superset filtered by the exact threshold, hence
    * deterministic and independently re-derivable by any engine.
    *
    * Document frequency (per-doc distinct n-grams) rather than raw
    * frequency: a phrase repeated inside one boilerplate-laden page
    * should not look corpus-frequent. Driver state is the collected
    * candidate map — ≤ k entries by construction. */
  def frequentNgrams(df: DataFrame, n: Int, k: Int, minCount: Long,
      textCol: String = "text"): DataFrame = {
    require(n >= 1 && k >= 1 && minCount >= 1,
      s"need n, k, minCount >= 1, got n=$n k=$k minCount=$minCount")
    val spark = df.sparkSession
    import spark.implicits._
    def grams = df.select(explode(array_distinct(
      shingles(tokens(col(textCol)), n))).as("shingle"))
    val row = grams.agg(
      graft.functions.SketchFunctions.mgSummary(col("shingle"), k).as("cand"),
      count(lit(1)).as("n")).head()
    val total = row.getLong(1)
    require(minCount * k > total,
      s"MG coverage needs minCount > N/k: minCount=$minCount, N=$total, k=$k — raise k")
    val cands = row.getMap[String, Long](0).keys.toSeq
    grams.join(broadcast(cands.toDF("shingle")), Seq("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minCount)
      .orderBy(col("df").desc, col("shingle"))
  }

  /** [[frequentNgrams]] over a precomputed per-doc-distinct (doc_id,
    * shingle) set — the two corpus passes (MG candidate sweep + exact
    * candidate recount) read ONE materialized tokenization instead of
    * each re-running tokenize + shingle explode (the Dedup
    * `FromShingles` convention). Semantics identical: the input rows
    * ARE `explode(array_distinct(shingles(tokens(text), n)))`. */
  def frequentNgramsFromShingles(shingleRows: DataFrame, k: Int,
      minCount: Long): DataFrame = {
    require(k >= 1 && minCount >= 1,
      s"need k, minCount >= 1, got k=$k minCount=$minCount")
    val spark = shingleRows.sparkSession
    import spark.implicits._
    val grams = shingleRows.select(col("shingle"))
    val row = grams.agg(
      graft.functions.SketchFunctions.mgSummary(col("shingle"), k).as("cand"),
      count(lit(1)).as("n")).head()
    val total = row.getLong(1)
    require(minCount * k > total,
      s"MG coverage needs minCount > N/k: minCount=$minCount, N=$total, k=$k — raise k")
    val cands = row.getMap[String, Long](0).keys.toSeq
    grams.join(broadcast(cands.toDF("shingle")), Seq("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minCount)
      .orderBy(col("df").desc, col("shingle"))
  }

  /** PMI collocation mining (q116): the top-k adjacent word pairs by
    * pointwise mutual information, `ln(p(l,r) / (p(l)·p(r)))` — the
    * classic corpus-analysis signal for multiword expressions
    * ("new york"), used to decide phrase-level vocabulary entries and
    * to audit what a tokenizer will glue together. `minCount` kills
    * the rare-pair noise PMI is notorious for.
    *
    * Scale shape: ONE tokenize+explode pass over the corpus —
    * unigrams and adjacent bigrams ride the same exploded frame
    * (bigrams carry the joining space; whitespace-split unigrams
    * cannot), so a single term-keyed partial-agg shuffle produces the
    * vocab-sized count frame every downstream leg reuses. The count
    * frame is localCheckpoint'ed (the q115/q117 rule): exchange reuse
    * alone cannot share it, because the uni/bi `contains(' ')` filters
    * push through the aggregate and fracture the legs into distinct
    * exchanges (measured: 3 separate tokenize passes). The checkpoint
    * is vocab-sized — distributed executor blocks, released by the
    * caller via [[graft.plans.Blocks.release]] on the result. The
    * totals `n_uni` / `n_bi` are sums OVER that count frame — no
    * second corpus scan.
    * The PMI join touches only bigrams past `minCount` against the
    * vocab-sized unigram frame (two term-keyed equi-joins; AQE
    * broadcasts them when small); the totals are two 1-row frames
    * cross-joined everywhere. The final top-k is a TakeOrdered over
    * the filtered-pair frame (q51 precedent), never a global sort of
    * the corpus. The PMI argument is assembled from exact integer
    * counts with a FIXED multiplication order, so both engines hand
    * `ln` bit-identical inputs. */
  def pmiCollocations(df: DataFrame, minCount: Long = 5L, k: Int = 20,
      textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val terms = df.select(explode(concat(toks, shingles(toks, 2))).as("term"))
    val counts = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val uniCounts = counts.filter(!col("term").contains(" "))
    val biAll = counts.filter(col("term").contains(" "))
    val nUni = uniCounts.agg(sum(col("c")).as("n_uni"))
    val nBi = biAll.agg(sum(col("c")).as("n_bi"))
    val biCounts = biAll.filter(col("c") >= minCount)
      .select(split(col("term"), " ").getItem(0).as("l"),
        split(col("term"), " ").getItem(1).as("r"), col("c").as("cab"))
    biCounts
      .join(uniCounts.select(col("term").as("l"), col("c").as("cl")), Seq("l"))
      .join(uniCounts.select(col("term").as("r"), col("c").as("cr")), Seq("r"))
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(col("l"), col("r"), col("cab"),
        (round(log(
          (col("cab").cast("double") * col("n_uni") * col("n_uni")) /
            (col("n_bi").cast("double") * col("cl") * col("cr"))), 4) + lit(0.0))
          .as("pmi"))
      .orderBy(col("pmi").desc, col("l"), col("r"))
      .limit(k)
  }

  /** "BPE-ish" regex token count: letter runs, digit runs, single
    * non-alphanumeric marks. */
  /** Aho–Corasick phrase-blocklist screen: distinct 1-based indices of
    * `patterns` occurring as SUBSTRINGS of `text`, ascending (empty
    * array = clean). One automaton walk per row, cost independent of
    * |patterns| — the NSFW/policy/canary wordlist shape token-level
    * blocklist joins can't express (multi-word and mid-token hits).
    * Case handling is the caller's: pass `lower(text)` with lowercase
    * patterns. SQL: `graft_multi_match(text, array('p1','p2',...))`.
    * See [[graft.functions.expressions.AhoCorasick]]. */
  def multiMatch(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(graft.functions.expressions.MultiPatternMatches(
      ExpressionUtils.expression(text), patterns))

  /** Per-pattern occurrence COUNTS (same automaton, same one-walk
    * cost as [[multiMatch]]) — canary counting for contamination
    * audits. SQL: `graft_multi_count(text, array(...))`. */
  def multiMatchCounts(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(graft.functions.expressions.MultiPatternCounts(
      ExpressionUtils.expression(text), patterns))

  /** Tokenizer-fit audit: per-source coverage of a frozen top-N
    * vocabulary — the check a pipeline runs BEFORE committing a
    * tokenizer to a corpus mix (a source whose tokens the vocabulary
    * doesn't cover trains as mostly `<unk>`/byte-fallback noise).
    * Vocabulary = the `vocabSize` most frequent tokens corpus-wide
    * (ties to the lexicographically smaller token — deterministic,
    * engine-replayable); report per source = total token occurrences,
    * fraction covered, and the count of distinct OOV types.
    *
    * Scale shape: ONE tokenize pass into the per-(source, term) count
    * aggregate; everything downstream works on that vocabulary-sized
    * frame — the corpus-wide vocab is a second partial agg OVER THE
    * COUNTS plus a bounded TakeOrdered, and coverage is a broadcast
    * left join back onto the same counts. The counts frame is
    * localCheckpoint'ed because it feeds both legs (ReuseExchange
    * won't dedupe two consumers — the q115/q117 rule). Exact integer
    * sums; one rounded division at the end. */
  def vocabCoverage(df: DataFrame, vocabSize: Int,
      textCol: String = "text", srcCol: String = "source"): DataFrame = {
    val stc = df
      .select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val vocab = stc.groupBy(col("term")).agg(sum(col("c")).as("tc"))
      .orderBy(col("tc").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(true).as("in_v"))
    val out = stc.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("in_v"), col("c")).otherwise(0L)).as("covered"),
        countDistinct(when(!coalesce(col("in_v"), lit(false)), col("term")))
          .as("oov_types"))
      .select(col("source"), col("n_tokens"),
        (round(col("covered").cast("double") / col("n_tokens"), 6) + lit(0.0))
          .as("covered_frac"),
        col("oov_types"))
      .orderBy(col("source"))
      .localCheckpoint(true)
    graft.plans.Blocks.release(stc)
    out
  }

  /** TF-IDF keyword extraction: the top-k terms per document by
    * tf·ln(N/df) — the tagging/routing signal beside [[graft.operators
    * .Retrieval]]'s BM25 (that one scores documents for a QUERY; this
    * one summarizes each document on its own). Classic raw-tf ×
    * inverse-document-frequency weighting (Spärck Jones 1972).
    *
    * Scale shape: ONE tokenize pass into the per-(doc, term) count
    * aggregate; document frequencies and the corpus size are two
    * vocabulary-sized partial aggs OVER those counts (no second
    * corpus scan — the counts frame is checkpointed for its two
    * consumers, the q115/q117 rule); df joins back vocabulary-sized
    * (broadcast), and the per-doc top-k is a window PARTITIONED by
    * doc (rows per partition = the doc's distinct terms — bounded,
    * unlike a global window). Determinism: tf and df are exact ints,
    * idf is quantized to a 1e6 fixed-point long BEFORE the tf
    * multiply, ties break by term — engine-replayable.
    *
    * @return (doc_id, rnk, term, tf, score_fp) — score_fp =
    *         tf · round(ln(N/df)·10⁶)
    */
  def tfidfKeywords(df: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dtc = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val nDocs = dtc.select(countDistinct(col("doc_id"))).head().getLong(0)
    val out = tfidfKeywordsFromCounts(dtc, nDocs, k)
    graft.plans.Blocks.release(dtc)
    out
  }

  /** [[tfidfKeywords]] over a precomputed (doc_id, term, tf) counts
    * frame plus the corpus doc count — for pipelines that tokenize
    * once and feed several term-statistics analyses from one postings
    * table (the Dedup/Retrieval `From*` convention). The tokenizer
    * never emits an empty array, so count(documents) equals the
    * distinct doc count over the postings. */
  def tfidfKeywordsFromCounts(dtc: DataFrame, nDocs: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = dtc.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
      .select(col("term"),
        round(log(lit(nDocs).cast("double") / col("df_t").cast("double")) * 1e6)
          .cast("long").as("idf_fp"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_fp").desc, col("term"))
    dtc.join(broadcast(stats), Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf") * col("idf_fp")).as("score_fp"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk").cast("int").as("rnk"),
        col("term"), col("tf"), col("score_fp"))
      .orderBy(col("doc_id"), col("rnk"))
      .localCheckpoint(true)
  }

  /** DEFLATE-compressed byte count of `text` (UTF-8) — the
    * language-agnostic compressibility quality signal; see
    * [[graft.functions.expressions.DeflateSize]]. SQL:
    * `graft_deflate_size(text)`. */
  def deflateSize(text: Column): Column =
    ExpressionUtils.column(graft.functions.expressions.DeflateSize(
      ExpressionUtils.expression(text)))

  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  private def ratio(num: Column, den: Column): Column =
    round(num.cast("double") / den.cast("double"), 4)

  /** Marker-token languages for the heuristic language ID. Priority
    * order breaks score ties deterministically. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "fr" -> Seq("le", "les", "et", "une", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq("的", "是", "在", "了", "我"))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.map(m => t === lit(m)).reduce(_ || _)))

  /** Per-document statistics block. Input column `text`; appends
    * n_chars, n_tokens, n_distinct_tokens, distinct_ratio,
    * avg_token_len, stopword_ratio, quality_score. The four token
    * counts come from ONE compiled pass over the token array
    * ([[graft.functions.expressions.TextStats]]); the ratio/quality
    * arithmetic over those exact integers is unchanged, so every
    * emitted value is bit-identical to the HOF formulation kept
    * below as the property-spec reference. */
  def withTextStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val st = col("__graft_stats")
    df.withColumn("__graft_stats",
        ExpressionUtils.column(graft.functions.expressions.TextStats(
          ExpressionUtils.expression(tokens(col(textCol))), langMarkers.head._2)))
      .withColumn("n_chars", length(col(textCol)).cast("long"))
      .withColumn("n_tokens", st.getField("n_tokens"))
      .withColumn("n_distinct_tokens", st.getField("n_distinct"))
      .withColumn("distinct_ratio", st.getField("distinct_ratio"))
      .withColumn("avg_token_len", st.getField("avg_token_len"))
      .withColumn("stopword_ratio", st.getField("stopword_ratio"))
      .withColumn("quality_score", st.getField("quality_score"))
      .drop("__graft_stats")
  }

  /** Interpreted HOF twin of [[withTextStats]], kept ONLY as the
    * reference side of the bit-identity property spec
    * (TextStatsKernelSpec). */
  private[graft] def withTextStatsHof(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = col("__graft_toks")
    val nTok = size(toks)
    val avgLen = round(
      aggregate(toks, lit(0L), (s, t) => s + length(t)).cast("double") / nTok.cast("double"), 4)
    val stopRatio = ratio(markerCount(toks, langMarkers.head._2), nTok)
    val distinctRatio = ratio(size(array_distinct(toks)), nTok)
    df.withColumn("__graft_toks", tokens(col(textCol)))
      .withColumn("n_chars", length(col(textCol)).cast("long"))
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)).cast("long"))
      .withColumn("distinct_ratio", distinctRatio)
      .withColumn("avg_token_len", avgLen)
      .withColumn("stopword_ratio", stopRatio)
      .withColumn("quality_score",
        round((when(nTok.between(20, 1000), 0.25).otherwise(0.0)
          + when(avgLen.between(3.0, 12.0), 0.25).otherwise(0.0)
          + when(distinctRatio >= 0.3, 0.25).otherwise(0.0)
          + when(stopRatio.between(0.01, 0.6), 0.25).otherwise(0.0)), 2))
      .drop("__graft_toks")
  }

  /** Heuristic language ID: marker-token count per language, argmax
    * with fixed priority-order tie-break. Appends per-lang scores and
    * `lang_pred`. */
  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = col("__graft_toks")
    val scored = langMarkers.foldLeft(df.withColumn("__graft_toks", tokens(col(textCol)))) {
      case (d, (lang, markers)) =>
        d.withColumn(s"score_$lang", markerCount(toks, markers))
    }
    val scores = langMarkers.map { case (l, _) => col(s"score_$l") }
    // argmax, ties resolved by declaration order (en,es,fr,de,zh)
    val pred = langMarkers.zipWithIndex.foldRight(lit("und"): Column) {
      case (((lang, _), i), els) =>
        when(col(s"score_$lang") === greatest(scores: _*) && col(s"score_$lang") > 0, lit(lang))
          .otherwise(els)
    }
    scored.withColumn("lang_pred", pred).drop("__graft_toks")
  }

  /** Rolling polynomial hash over token IDs:
    * h = fold(ids.tail, ids.head, (h, x) -> (h * 31 + x) mod 1e9+7) —
    * the init-with-first-element shape matches DuckDB `list_reduce` so
    * the oracle is expressible. Input: ARRAY<BIGINT> of 1-based IDs. */
  def rollingFingerprint(tokenIds: Column): Column =
    when(size(tokenIds) === 0, lit(0L)).otherwise(
      aggregate(
        slice(tokenIds, lit(2), greatest(size(tokenIds) - 1, lit(0))),
        element_at(tokenIds, 1),
        (h, x) => (h * 31L + x) % 1000000007L))

  /** Deterministic cross-engine term id: rolling polynomial hash of the
    * term's character codes (same fold contract as
    * [[rollingFingerprint]], so DuckDB `list_reduce` reproduces it).
    * Replaces ranked-vocabulary ids for MinHash/SimHash: no global
    * distinct + sort + join pass — the id is a pure per-row expression,
    * which is the only shape that scales to a 100 TB corpus (a ranked
    * vocabulary is a cross-corpus bottleneck; a content hash shards
    * freely). Collisions are harmless for sketching as long as both
    * engines hash identically. */
  def termHash(term: Column): Column =
    ExpressionUtils.column(graft.functions.expressions.StringRollingHash(
      ExpressionUtils.expression(term), 31L, 1000000007L))

  /** Interpreted HOF twin of [[termHash]], kept ONLY as the reference
    * side of the bit-identity property spec (TermHashKernelSpec). */
  private[graft] def termHashHof(term: Column): Column =
    when(length(term) === 0, lit(0L)).otherwise(
      rollingFingerprint(transform(split(term, ""), c => ascii(c).cast("long"))))

  /** Second INDEPENDENT rolling hash (multiplier 37, modulus
    * 999999937 — a different prime), same fold contract as
    * [[rollingFingerprint]]. Consumers that key DESTRUCTIVE decisions
    * on content hashes (the exact-substring cut tier) combine both
    * streams into one ~60-bit id: a false match then needs a
    * simultaneous collision in two independent recurrences (~2^-60
    * per pair) instead of one 30-bit space — while every fold still
    * fits DuckDB BIGINT arithmetic, which 64-bit wrapping
    * multiplication would not. */
  def rollingFingerprint2(tokenIds: Column): Column =
    when(size(tokenIds) === 0, lit(0L)).otherwise(
      aggregate(
        slice(tokenIds, lit(2), greatest(size(tokenIds) - 1, lit(0))),
        element_at(tokenIds, 1),
        (h, x) => (h * 37L + x) % 999999937L))

  /** [[termHash]]'s independent twin (multiplier 37, modulus
    * 999999937), same native kernel. */
  def termHash2(term: Column): Column =
    ExpressionUtils.column(graft.functions.expressions.StringRollingHash(
      ExpressionUtils.expression(term), 37L, 999999937L))

  /** Interpreted HOF twin of [[termHash2]] (property-spec reference). */
  private[graft] def termHash2Hof(term: Column): Column =
    when(length(term) === 0, lit(0L)).otherwise(
      rollingFingerprint2(transform(split(term, ""), c => ascii(c).cast("long"))))

  /** Ordered BPE merge table (rank = position). Fixed and shared with
    * the SQL oracle, the way a production tokenizer ships a frozen
    * `merges.txt`: each rule merges two existing symbols (characters
    * or earlier merges) into one. Applying rules IN RANK ORDER, each
    * exhaustively left-to-right, is exactly the classic BPE encode
    * (Sennrich et al. 2016; GPT-2's min-rank-first loop is equivalent
    * because a rule's operands can only be produced by strictly
    * earlier rules). */
  val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "h" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "r" -> "e", "o" -> "n", "a" -> "t", "e" -> "n", "e" -> "s",
    "o" -> "r", "t" -> "e", "e" -> "d", "i" -> "s", "i" -> "t",
    "a" -> "l", "a" -> "r", "s" -> "t", "t" -> "o", "n" -> "t",
    "t" -> "i", "th" -> "e", "in" -> "g", "er" -> "s", "ti" -> "on",
    "an" -> "d", "o" -> "u", "o" -> "f", "f" -> "or", "w" -> "h")

  /** One BPE rule applied exhaustively, leftmost-first, as a pure
    * fold: the accumulator is the merged-so-far symbol array; a step
    * either fuses the incoming symbol into the accumulator's last
    * element or appends it. An adjacent run like `a a a` under rule
    * (a,a) merges pairs left-to-right (first two fuse; the third
    * pairs with the fused symbol only if a LATER rule says so) —
    * byte-for-byte the reference BPE behavior. */
  private def applyBpeMerge(symbols: Column, l: String, r: String): Column = {
    val m = l + r
    // the fold seeds from an EMPTY accumulator so `symbols` is
    // referenced exactly once per rule — a seed-with-first shape
    // references the child subtree several times per level, and with
    // 30 stacked rules that's an exponentially-sized expression tree
    // (observed as a driver OOM while CONVERTING the column, before
    // any row ran). On empty acc, try_element_at(acc, -1) is null
    // (ANSI-safe), the merge predicate is null, and `otherwise`
    // appends — the same leftmost-greedy semantics as seeding with
    // the first symbol.
    aggregate(symbols, array().cast("array<string>"),
      (acc, x) => when(try_element_at(acc, lit(-1)) === l && x === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
        .otherwise(concat(acc, array(x))))
  }

  /** A word's BPE symbol sequence: character split, then every
    * [[BpeMerges]] rule in rank order. A pure per-row column
    * expression — no UDF, no vocabulary shuffle; the merge table
    * rides the plan like a broadcast literal, which is the only
    * tokenizer shape that scales to a 100 TB corpus. */
  def bpeSymbols(word: Column, merges: Seq[(String, String)] = BpeMerges): Column =
    merges.foldLeft(split(word, "")) { case (s, (l, r)) => applyBpeMerge(s, l, r) }

  /** BPE token count for one word. `merges` defaults to the frozen
    * demo table; pass a LEARNED table (e.g.
    * [[BpeArtifact.load]]`.merges`) to count under the corpus's own
    * persisted tokenizer — the learn → persist → apply lifecycle. */
  def bpeTokenCount(word: Column, merges: Seq[(String, String)] = BpeMerges): Column =
    size(bpeSymbols(word, merges))

  /** BPE merge-table LEARNING (Sennrich et al. 2016 training loop) —
    * the half of the tokenizer lifecycle [[bpeSymbols]]'s frozen table
    * assumes: learn the top-`nMerges` rules from the corpus itself.
    * Each round counts adjacent symbol pairs (weighted by word
    * frequency, overlaps counted positionally — the classic
    * definition), takes the global argmax with a deterministic
    * (count DESC, left, right) tie-break, and re-symbolizes with the
    * winning rule before the next round.
    *
    * Scale shape: training runs on the WORD-FREQUENCY table, not the
    * corpus — the token stream collapses to (word, count) in one
    * partial-agg pass (cached vocab-sized frame), and every round
    * after that touches only the vocabulary: a pair partial-agg plus
    * a 1-row argmax collect (the same driver-coordination shape as
    * the IVF fit). The re-symbolize step is the shared
    * [[applyBpeMerge]] column fold, so learned rules compose with the
    * frozen-table apply path unchanged. Returns (left, right,
    * pair_count) in rank order; stops early if the corpus runs out of
    * repeated pairs. */
  def learnBpeMerges(
      docs: DataFrame,
      nMerges: Int = 3,
      textCol: String = "text"): Seq[(String, String, Long)] = {
    val words = docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .cache()
    try {
      var syms = words.select(split(col("w"), "").as("s"), col("cnt"))
      val learned = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      var exhausted = false
      while (learned.length < nMerges && !exhausted) {
        val top = syms
          .filter(size(col("s")) >= 2)
          .select(col("cnt"), explode(transform(sequence(lit(1), size(col("s")) - 1), i =>
            struct(element_at(col("s"), i).as("l"),
              element_at(col("s"), i + 1).as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          learned += ((l, r, c))
          syms = syms.select(applyBpeMerge(col("s"), l, r).as("s"), col("cnt"))
        }
      }
      learned.toSeq
    } finally { words.unpersist(); () }
  }

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1 use
    * most-common-n-gram character fractions as quality filters; this is
    * the token-count analogue): for n = 1..maxN, the fraction of a
    * document's n-gram occurrences taken by its single most frequent
    * n-gram, plus a `repetitive` flag over fixed thresholds. The flag
    * compares the ROUNDED fractions so an oracle engine computing the
    * same rounded values flags identically.
    *
    * Scale shape: all n-gram streams ride ONE scan (each token array is
    * expanded into tagged (n, gram) structs and exploded once), then
    * two partial-aggregating shuffles keyed by (doc, n, gram) and
    * (doc, n) — no self-joins, no windows over the corpus. */
  def repetitionStats(
      docs: DataFrame,
      maxN: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxN >= 1 && maxN <= RepetitionThresholds.length,
      s"maxN must be in [1, ${RepetitionThresholds.length}] (one flag threshold per n), got $maxN")
    val toks = col("__graft_toks")
    val tagged = concat((1 to maxN).map { n =>
      val g = if (n == 1) toks else shingles(toks, n)
      transform(g, x => struct(lit(n).as("n"), x.as("gram")))
    }: _*)
    val fracs = docs
      .select(col(idCol), tokens(col(textCol)).as("__graft_toks"))
      .select(col(idCol), explode(tagged).as("g"))
      .select(col(idCol), col("g.n").as("n"), col("g.gram").as("gram"))
      .groupBy(col(idCol), col("n"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("n"))
      .agg(round(max(col("c")).cast("double") / sum(col("c")).cast("double"), 4).as("frac"))
    // pivot over the statically-known 1..maxN — no value-discovery job.
    // Left-join back onto the full doc-id set: a NULL-text doc
    // contributes no n-grams and would otherwise vanish through the
    // explode, but the operator (like its oracle) is total over the
    // input — such docs report all-zero fractions.
    val wide = docs.select(col(idCol)).join(
      fracs.groupBy(col(idCol))
        .pivot("n", (1 to maxN).map(_.toString))
        .agg(first(col("frac"))),
      Seq(idCol), "left")
    val named = (1 to maxN).foldLeft(wide) { (d, n) =>
      d.withColumnRenamed(n.toString, s"top${n}gram_frac")
        .withColumn(s"top${n}gram_frac", coalesce(col(s"top${n}gram_frac"), lit(0.0)))
    }
    named.withColumn("repetitive",
      RepetitionThresholds.take(maxN).zipWithIndex
        .map { case (thr, i) => col(s"top${i + 1}gram_frac") > thr }
        .reduce(_ || _))
  }

  /** Flag thresholds for [[repetitionStats]]: most-common 1/2/3-gram
    * fraction above which a document counts as repetitive. */
  val RepetitionThresholds: Seq[Double] = Seq(0.12, 0.06, 0.03)

  /** CCNet-style unigram language-model quality score (Wenzek et al.
    * 2020 filter corpora by LM perplexity; the unigram NLL is its
    * engine-neutral, vocabulary-free analogue): per document, the mean
    * negative log-probability of its tokens under the corpus unigram
    * distribution. High avg_nll = rare-token-heavy (noise / junk); low
    * = boilerplate-common tokens.
    *
    * Bit-identity across engines: per-token NLL sums are ORDER
    * dependent in floating point, so each term's -ln(p) is fixed-pointed
    * to 1e-4 (ROUND(x*10000) as a long) first; the per-doc sum is then
    * exact integer arithmetic, independent of aggregation order — the
    * only shape that hash-matches a single-node oracle at any
    * parallelism.
    *
    * Scale shape: one scan + (doc, term) partial agg; the corpus term
    * table is Zipf-small and broadcast, so the big side never shuffles
    * twice. */
  def unigramNllScores(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val freq = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    // n_total = Σ cf — but summed as a NARROW no-explode scan
    // (Σ size(tokens)): the former freq.agg(sum(cf)) replayed the
    // whole explode + two-level aggregation subtree a third time
    // (plan branches of an unmaterialized frame recompute; guide
    // §1.2). Null text contributes no exploded tokens, so it must
    // count 0 here too (size(NULL) is -1).
    val total = docs.agg(sum(
      when(col(textCol).isNotNull, size(tokens(col(textCol))).cast("long"))
        .otherwise(lit(0L))).as("n_total"))
    val nllFp = round(-log(col("cf").cast("double") / col("n_total").cast("double")) * 10000d, 0)
      .cast("long")
    tf.join(broadcast(freq.crossJoin(total)), Seq("term"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        sum(col("tf") * nllFp).as("nll_fp_sum"))
      // HALF_UP on the EXACT rational fpsum/n via integer division —
      // never on a double: fpsum/n lands on exact .5 halves for ~1/(2n)
      // of docs (2·fpsum ≡ n mod 2n), where Spark's BigDecimal round
      // and DuckDB's multiply-then-nearbyint ROUND can disagree on the
      // same double (measured: 9/5000 docs at sf0.1). The integer form
      // is boundary-free and both engines derive the identical double
      // from the identical integer.
      .select(col(idCol), col("n_tokens"),
        (expr("(nll_fp_sum * 2 + n_tokens) DIV (n_tokens * 2)").cast("double") / 10000.0
          + lit(0.0)).as("avg_nll"))
  }

  /** Corpus-bigram NLL quality score per document (KenLM-style, one
    * order up from [[unigramNllScores]]): exact chain-rule NLL under
    * the corpus MLE — the first token scored by the unigram
    * distribution, every following token by the conditional bigram
    * p(w | prev) = cf(prev,w) / Σ_w' cf(prev,w'). Because the corpus
    * includes the document, every probability is strictly positive —
    * no smoothing constant to pick or mirror. Low avg_nll = locally
    * predictable prose; high = token soup. This is the signal a
    * perplexity-based quality filter thresholds on.
    *
    * Identity/arithmetic contract: tokens enter as [[termHash]] /
    * [[termHash2]] ids and bigrams as the packed ~60-bit dual fold
    * (never strings — nothing non-numeric crosses a shuffle; a false
    * bigram merge needs a simultaneous collision in two independent
    * recurrences, and the oracle replays the identical fold either
    * way). Each distinct event's -ln(p) is fixed-pointed to 1e-4
    * BEFORE the per-doc sum (same trick as [[unigramNllScores]]), so
    * the sum is exact integer arithmetic, independent of aggregation
    * order and parallelism.
    *
    * Scale shape: the (doc, bigram) table partial-aggregates on the
    * map side before its one shuffle; the corpus bigram LM
    * (cf2 → per-context totals → nll) derives FROM that aggregate, so
    * the token stream is never shuffled twice. The multi-referenced
    * aggregates (the doc-pair table, the unigram table) are
    * deliberately RECOMPUTED per plan branch, not materialized: each
    * replay is a narrow scan + map-side partial agg, the independent
    * branches run as concurrent stages, and the alternative — eager
    * localCheckpoint barriers on the shared frames — measured 2-6×
    * SLOWER wall-clock at sf0.1 (10.5 s vs 1.7 s) because each
    * barrier serializes work AQE otherwise overlaps. This is
    * [[Dedup.chunkDupStats]]'s recompute-vs-materialize trade, decided
    * the same way: scan passes are cheap, barriers are not.
    * The bigram-vocabulary join back is equi on the bigram id
    * between two pre-aggregated tables (AQE broadcasts it when small;
    * at 100 TB it is a shuffle join of vocabulary-sized — not
    * corpus-sized — sides). The unigram leg for first tokens reuses
    * the Zipf-small broadcast shape of [[unigramNllScores]]. */
  def bigramNllScores(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 1)
      .select(col(idCol),
        transform(col("__toks"), t => termHash(t)).as("h"),
        transform(col("__toks"), t => termHash2(t)).as("h2"))
    // (doc, prev-token hash, packed bigram id) stream, partial-agg'd
    val pairs = base
      .filter(size(col("h")) >= 2)
      .select(col(idCol), explode(transform(sequence(lit(1), size(col("h")) - 1), i =>
        struct(
          element_at(col("h"), i).as("prev"),
          (((element_at(col("h"), i) * 31L + element_at(col("h"), i + 1)) % 1000000007L)
            * 1000000000L +
           ((element_at(col("h2"), i) * 37L + element_at(col("h2"), i + 1)) % 999999937L))
            .as("bg")))).as("p"))
      .select(col(idCol), col("p.prev").as("prev"), col("p.bg").as("bg"))
    val tf2 = pairs.groupBy(col(idCol), col("prev"), col("bg"))
      .agg(count(lit(1)).as("tf"))
    val cf2 = tf2.groupBy(col("prev"), col("bg")).agg(sum(col("tf")).as("cf"))
      .localCheckpoint(true)
    val ctx = cf2.groupBy(col("prev")).agg(sum(col("cf")).as("n_ctx"))
    val nll2 = cf2.join(ctx, "prev")
      .select(col("prev"), col("bg"),
        round(-log(col("cf").cast("double") / col("n_ctx").cast("double")) * 10000d, 0)
          .cast("long").as("nll_fp"))
    val docBig = tf2.join(nll2, Seq("prev", "bg"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"), sum(col("tf") * col("nll_fp")).as("fp2"))
    // first-token leg under the corpus unigram distribution. The
    // unigram counts are DERIVED, not re-tokenized: every token
    // position is either followed by another token — counted by the
    // per-context totals of the ALREADY-CHECKPOINTED bigram LM (ctx,
    // one vocabulary-sized aggregate over cf2) — or is its document's
    // LAST token, counted by a narrow no-explode projection (one row
    // per doc). cf(tid) = n_ctx(tid) + n_last(tid) is exact, so this
    // replaces the former third full tokenize + explode + aggregate
    // pass over the corpus with vocabulary-sized arithmetic plus one
    // narrow scan (guide §1.2: the fewest corpus passes the chain
    // rule admits — one exploded pass total).
    val lastTf = base.select(element_at(col("h"), -1).as("tid"))
      .groupBy(col("tid")).agg(count(lit(1)).as("lc"))
    val uniTf = ctx.select(col("prev").as("tid"), col("n_ctx"))
      .join(lastTf, Seq("tid"), "full_outer")
      .select(col("tid"),
        (coalesce(col("n_ctx"), lit(0L)) + coalesce(col("lc"), lit(0L))).as("cf"))
    val total = uniTf.agg(sum(col("cf")).as("n_total"))
    val nll1 = uniTf.crossJoin(total)
      .select(col("tid"),
        round(-log(col("cf").cast("double") / col("n_total").cast("double")) * 10000d, 0)
          .cast("long").as("nll_fp"))
    val first = base.select(col(idCol), element_at(col("h"), 1).as("tid"),
      size(col("h")).cast("long").as("n_tokens"))
    first.join(broadcast(nll1), "tid")
      .join(docBig, Seq(idCol), "left")
      // same exact-integer HALF_UP as unigramNllScores (see there)
      .select(col(idCol), col("n_tokens"),
        (expr("((nll_fp + COALESCE(fp2, 0L)) * 2 + n_tokens) DIV (n_tokens * 2)")
          .cast("double") / 10000.0
          + lit(0.0)).as("avg_nll"))
  }

  /** PII detection/redaction patterns. Kept to the conservative regex
    * subset Java (`java.util.regex`, Spark codegen) and RE2 (DuckDB,
    * many scan-side pushdown engines) interpret identically — character
    * classes, bounded repetition, alternation-free — so the same
    * pattern string drives both the engine and the oracle, and a
    * future scan-level pushdown can reuse it verbatim. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhonePattern = "[0-9]{3}-[0-9]{4}"

  /** Number of matches of `pattern` in `text` — codegen'd
    * `regexp_extract_all` + `size`, no UDF. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Redact PII in placement order: emails first (their local/domain
    * parts can embed digit runs that the narrower patterns would
    * otherwise half-match), then IPv4, then phone fragments. A single
    * projection — three chained codegen `regexp_replace`s — so the scan
    * stays one pass and whole-stage codegen keeps the row on-CPU. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Per-document PII census + redacted text: counts per category (on
    * the ORIGINAL text) and the cleaned column. Pure narrow
    * projection — no shuffle; at 100 TB this is scan-bound, exactly as
    * a redaction pass should be. */
  def withPiiRedaction(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_emails", piiCount(col(textCol), EmailPattern))
      .withColumn("n_ips", piiCount(col(textCol), Ipv4Pattern))
      .withColumn("n_phones", piiCount(col(textCol), PhonePattern))
      .withColumn("redacted", redactPii(col(textCol)))

  // ---------------------------------------------------------------------
  // Hashed linear quality classifier (fastText-shaped scoring)

  /** Feature-hash dimensionality of the linear scorer. */
  val HashedDim = 64

  /** Integer weight of hashed feature index `i` ∈ [0, HashedDim): a
    * deterministic multiplicative formula into [-1000, 1000] standing
    * in for trained weights (the container ships no model files; a
    * production deployment replaces this one expression with a
    * broadcast lookup of its trained vector — the surrounding plan is
    * identical). Integral weights make the per-doc score an exact
    * BIGINT sum — order-independent across partitionings and engines,
    * the same fixed-point trick as [[unigramNllScores]]. */
  def hashedWeight(idx: Column): Column =
    pmod((idx + 1L) * 48271L, lit(2001L)) - 1000L

  /** fastText-shaped hashed linear document scorer: each token hashes
    * to one of [[HashedDim]] feature buckets ([[termHash]] mod D — the
    * classic hashing trick, no vocabulary pass), the document score is
    * the mean bucket weight over its tokens, and `keep` is the
    * sign-of-score decision a quality-filter pipeline gates on.
    *
    * Scale shape: the whole scorer is one pure column expression
    * (transform + aggregate over the token array) — no explode, no
    * join, no shuffle; at 100 TB it pipelines inside the Parquet scan
    * with the rest of the per-row filters. `score_fp` is the exact
    * integer sum (fixed-point, 1000 = 1.0); `score` its rounded
    * per-token mean. */
  def withHashedLinearScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val weights = transform(toks, t => hashedWeight(pmod(termHash(t), lit(HashedDim.toLong))))
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("score_fp", coalesce(aggregate(weights, lit(0L), (a, x) => a + x), lit(0L)))
      .withColumn("score",
        round(col("score_fp").cast("double") / (col("n_tokens").cast("double") * 1000.0), 4))
      .withColumn("keep", col("score_fp") > 0L)
  }

  /** Per-token Jensen–Shannon drift between two corpus slices — the
    * distribution-shift monitor a training pipeline runs between
    * snapshots, sources, or time windows ("did the mix change, and
    * WHICH tokens moved?"). Output: one row per vocabulary term with
    * its counts and its JS contribution in 1e12 fixed point
    * (`js_fp`); `sum(js_fp)` is the total divergence as an exact
    * integer sum, and per-term rows rank the movers.
    *
    * Definition: add-one smoothing over the JOINT vocabulary
    * (p = (c+1)/(n+V)), js(t) = ½·p_a·ln(p_a/m) + ½·p_b·ln(p_b/m)
    * with m = ½(p_a+p_b) — per-term contributions are ≥ 0 by the
    * log-sum inequality, so ranking by contribution is meaningful.
    * Total ∈ [0, ln 2]. Fixed left-to-right double expression + the
    * fixed-point quantize ⇒ engine-reproducible.
    *
    * Scale shape: one partial-agg token count per side (the shuffle
    * carries Zipf-small per-partition distinct terms), a vocab-sized
    * full-outer join, scalar stats broadcast back. The joined vocab
    * frame is checkpointed: it feeds both the stats aggregate and the
    * per-term output, and ReuseExchange would otherwise recompute
    * BOTH corpus-sized count legs per consumer (the q115/q117 rule).
    * Callers release via [[graft.plans.Blocks.release]] when done. */
  /** Per-source KL drift against the whole-corpus token distribution
    * — "which SOURCE's mix moved away from the blend?" (the
    * per-supplier twin of [[tokenDistributionDrift]]'s A-vs-B view).
    * KL(source ‖ corpus) = Σ_{t ∈ source} q_t·ln(q_t/p_t) with
    * q_t = c_t/n_src unsmoothed (absent terms contribute 0, which is
    * what makes KL streamable — see
    * [[graft.streaming.StreamingOps.streamingTokenDrift]]) and the
    * baseline add-one smoothed over its own vocab, p_t =
    * (c_all+1)/(n_all+V). Per-term contributions quantize at 1e12
    * before the per-source integer sum.
    *
    * Scale shape: ONE tokenize pass — the (source, term) counts feed
    * the corpus baseline (`sum` over sources), the per-source totals,
    * AND the scoring join, so the frame is checkpointed (three
    * consumers; the q115/q117 rule; it is Zipf-bounded at
    * sources × vocab, not corpus-sized). The scoring join is
    * term-keyed (vocab-bounded), source totals broadcast back.
    * Output: (source, n_tokens, kl) — kl ≥ 0 up to quantization. */
  def sourceKlDrift(
      docs: DataFrame,
      srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val sc = docs
      .select(col(srcCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(srcCol), col("term")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val cb = sc.groupBy(col("term")).agg(sum(col("c")).as("c_all"))
    val st = cb.agg(sum(col("c_all")).as("n_all"), count(lit(1)).as("vsz"))
    val ns = sc.groupBy(col(srcCol)).agg(sum(col("c")).as("n_src"))
    val q = col("c").cast("double") / col("n_src")
    val p = (col("c_all") + lit(1.0)) / (col("n_all") + col("vsz"))
    sc.join(cb, Seq("term"))
      .join(broadcast(ns), Seq(srcCol))
      .crossJoin(broadcast(st))
      .select(col(srcCol), col("n_src"),
        round(q * log(q / p) * lit(1000000000000.0), 0).cast("long").as("fp"))
      .groupBy(col(srcCol), col("n_src"))
      .agg(sum(col("fp")).as("kl_fp"))
      .select(col(srcCol), col("n_src").as("n_tokens"),
        (col("kl_fp") / lit(1000000000000.0)).as("kl"))
  }

  /** Fold a term-counts `map_entries` array into the 1e12 fixed-point
    * KL(counts ‖ baseline) sum — the pure column expression shared by
    * the streaming drift monitor and its batch twin. `baseline` is a
    * plan-literal map (the fixed reference snapshot a production
    * monitor broadcasts); terms absent from it get the add-one floor
    * 1/(n_p+V) where V counts one extra OOV bucket. Each entry's
    * contribution quantizes independently, so the integer sum is
    * fold-order-free. */
  def klEntriesFp(entries: Column, nW: Column, baseline: Map[String, Long]): Column = {
    require(baseline.nonEmpty, "klEntriesFp needs a non-empty baseline")
    val denom = (baseline.values.sum + baseline.size + 1L).toDouble
    val b = typedLit(baseline)
    aggregate(entries, lit(0L), (a, e) => {
      val q = e.getField("value").cast("double") / nW
      val p = (coalesce(element_at(b, e.getField("key")), lit(0L)) + lit(1.0)) / lit(denom)
      a + round(q * log(q / p) * lit(1000000000000.0), 0).cast("long")
    })
  }

  def tokenDistributionDrift(
      a: DataFrame,
      b: DataFrame,
      textCol: String = "text"): DataFrame = {
    def counts(df: DataFrame, out: String) =
      df.select(explode(tokens(col(textCol))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as(out))
    val v = counts(a, "c_a").join(counts(b, "c_b"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .localCheckpoint(true)
    val st = v.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
      count(lit(1)).as("vsz"))
    val pa = (col("c_a") + lit(1.0)) / (col("n_a") + col("vsz"))
    val pb = (col("c_b") + lit(1.0)) / (col("n_b") + col("vsz"))
    val m = lit(0.5) * (pa + pb)
    v.crossJoin(broadcast(st))
      .select(col("term"), col("c_a"), col("c_b"),
        round((lit(0.5) * (pa * log(pa / m)) + lit(0.5) * (pb * log(pb / m)))
          * lit(1000000000000.0), 0).cast("long").as("js_fp"))
  }

  /** Batch-perceptron linear filter trainer — the "train a quality /
    * language / spam classifier ON the cluster, then score the
    * corpus with it" step of a curation pipeline (the fastText-style
    * filter of CCNet/RefinedWeb, reduced to its distributable core).
    *
    * Rosenblatt perceptron, BATCH variant: per epoch, sum the update
    * `y·x` over every currently-misclassified row (`y·(w·x) <= 0`)
    * and apply it once — so an epoch is ONE aggregate job whose
    * partial sums combine map-side, and the whole trainer is `epochs`
    * scans of a narrow integer projection (checkpointed once here; at
    * 100 TB that frame is tens of bytes/row and the epoch count is a
    * small constant). No learning-rate float, no RNG, no sample
    * order: weights, margins, and updates are all BIGINT, and integer
    * sums are exactly order-independent — which is what lets a SQL
    * twin replay training bit-for-bit (q186), something no
    * float-SGD trainer can offer.
    *
    * `labelCol` must be ±1. Returns one row per epoch:
    * (epoch, w_bias, w_<feature>..., n_misclassified) where the
    * weights are AFTER that epoch's update and `n_misclassified`
    * counts rows wrong UNDER THE WEIGHTS THE EPOCH STARTED WITH
    * (epoch 1 therefore reports all rows: w = 0 margins everything
    * to 0). Once an epoch reads 0 the gradient is 0 and every later
    * row repeats verbatim — fixed `epochs` keeps the two engines'
    * row sets trivially aligned. Overflow headroom: |w| grows by at
    * most Σ|feature| per epoch, so int64 covers ~10^14 rows of
    * 10^4-scale features over single-digit epochs. */
  def batchPerceptron(
      labeled: DataFrame,
      featureCols: Seq[String],
      labelCol: String = "y",
      epochs: Int = 5): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(epochs >= 1, "epochs must be >= 1")
    val sess = labeled.sparkSession
    val base = labeled.select(
      (col(labelCol).cast("long").as("y") +:
        featureCols.map(f => col(f).cast("long").as(f))): _*)
      .localCheckpoint(true)
    val k = featureCols.length
    val w = new Array[Long](k + 1) // w(0) = bias
    val rows = Vector.newBuilder[Row]
    for (epoch <- 1 to epochs) {
      val margin = featureCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
        case (acc, (f, i)) => acc + lit(w(i + 1)) * col(f)
      }
      val gradAggs =
        (sum(col("y")).as("g0") +:
          featureCols.zipWithIndex.map { case (f, i) =>
            sum(col("y") * col(f)).as(s"g${i + 1}") }) :+
          count(lit(1)).as("n_wrong")
      val g = base.filter(col("y") * margin <= 0)
        .agg(gradAggs.head, gradAggs.tail: _*).head()
      val nWrong = g.getLong(k + 1)
      var i = 0
      while (i <= k) {
        // empty misclassified set -> null sums -> gradient 0
        if (!g.isNullAt(i)) w(i) += g.getLong(i)
        i += 1
      }
      rows += Row.fromSeq(epoch.toLong +: w.toVector :+ nWrong)
    }
    graft.plans.Blocks.release(base)
    val schema = org.apache.spark.sql.types.StructType(
      (("epoch" +: "w_bias" +: featureCols.map("w_" + _)) :+ "n_misclassified")
        .map(n => org.apache.spark.sql.types.StructField(
          n, org.apache.spark.sql.types.LongType, nullable = false)))
    sess.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.result()).asJava),
      schema)
  }

  /** Score a corpus with trained [[batchPerceptron]] weights: appends
    * BIGINT `margin` (= w·x, exactly reproducible) and boolean `keep`
    * (margin > 0) — a pure per-row expression that pipelines inside
    * the scan at any scale. `weights` is (bias, per-featureCols). */
  def linearFilterScore(
      docs: DataFrame,
      featureCols: Seq[String],
      weights: Seq[Long]): DataFrame = {
    require(weights.length == featureCols.length + 1,
      s"need ${featureCols.length + 1} weights (bias first), got ${weights.length}")
    val margin = featureCols.zipWithIndex.foldLeft(lit(weights.head): Column) {
      case (acc, (f, i)) => acc + lit(weights(i + 1)) * col(f).cast("long")
    }
    docs.withColumn("margin", margin).withColumn("keep", col("margin") > 0)
  }

  /** Distinct-n lexical diversity audit (Li et al. NAACL 2016's
    * distinct-1/distinct-2, the standard mode-collapse screen for
    * synthetic/generated corpora): per group, total and DISTINCT
    * unigram/bigram counts plus the exact fixed-point ratios
    * (HALF_UP per-10000, the q70 integer-DIV template — no float
    * division anywhere, so engines agree bit-for-bit).
    *
    * N-gram identity is the ~60-bit dual-fold chunk id over per-token
    * rolling hashes ([[Dedup.chunkIdArr]] at k=1/k=2) — 8-byte ids
    * cross the shuffle, never strings, and the distinct aggregates
    * partial-agg map-side. A dual-fold collision undercounts a
    * distinct n-gram deterministically (both engines share the ids),
    * which is the right trade at 100 TB: the alternative — exact
    * distinct over n-gram STRINGS — shuffles the token stream itself.
    * Groups are corpus sources (dozens), so the result is a
    * dashboard-sized frame. */
  def distinctNgramStats(
      docs: DataFrame,
      groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val hashed = docs
      .select(col(groupCol), tokens(col(textCol)).as("__graft_toks"))
      .select(col(groupCol),
        transform(col("__graft_toks"), t => termHash(t)).as("h"),
        transform(col("__graft_toks"), t => termHash2(t)).as("h2"))
    def pass(k: Int, total: String, dist: String): DataFrame =
      hashed.filter(size(col("h")) >= k)
        .select(col(groupCol),
          explode(Dedup.chunkIdArr(col("h"), col("h2"), k)).as("nid"))
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as(total), countDistinct(col("nid")).as(dist))
    pass(1, "n_tokens", "n_distinct_1")
      .join(pass(2, "n_bigrams", "n_distinct_2"), Seq(groupCol), "left")
      .withColumn("distinct1_per_10k",
        expr("(n_distinct_1 * 20000 + n_tokens) DIV (n_tokens * 2)"))
      .withColumn("distinct2_per_10k",
        expr("(n_distinct_2 * 20000 + n_bigrams) DIV (n_bigrams * 2)"))
  }
}
