package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-curation sampling: the data-mixing operators a
  * pretraining pipeline applies after filtering/dedup — rebalance the
  * stratum mixture (downsample a dominant language or source) and cap
  * any single source's contribution (the per-domain quota of
  * web-corpus curation). Both are pure functions of the row id, so a
  * sample is reproducible across engines, partitionings, and reruns,
  * and auditable by re-running the same arithmetic in any SQL engine.
  */
object Sampling {

  /** Default bucket granularity; [[mixtureSample]]'s fixed-point rate
    * thresholds are expressed in this scale, so the two must agree. */
  val Gran: Int = 10000

  /** Deterministic per-row sampling bucket in [0, gran): the q53
    * multiplicative-hash family. The id is reduced mod p BEFORE the
    * multiply — id * A overflows int64 from id ~3.5e9 (inside the
    * billions-of-docs target); ANSI engines throw, non-ANSI wrap and
    * diverge from the oracle. (p-1) * (A mod p) stays under 2^63. */
  def bucket(id: Column, gran: Int = Gran): Column = {
    val p = 1000000007L
    val a = 2654435761L % p
    pmod(pmod(pmod(id, lit(p)) * a, lit(p)), lit(gran.toLong))
  }

  /** Mixture resampling: keep each row iff its id-bucket clears the
    * keep-rate threshold of its stratum (language, source, quality
    * band). Strata absent from `rates` are dropped — a mixture spec is
    * exhaustive by construction. Adds the decided `bucket` column so
    * the sample is auditable.
    *
    * Scale shape: one per-row comparison against a literal CASE over
    * the (small) strata map — no shuffle, no sampling state, no RNG;
    * executors never coordinate. Exact-fraction guarantees are
    * per-bucket-uniformity (multiplicative hashing), not per-run
    * randomness — which is what reproducible training mixtures need. */
  def mixtureSample(
      docs: DataFrame,
      rates: Map[String, Double],
      stratumCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    require(rates.nonEmpty && rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be a non-empty map into [0,1], got $rates")
    require(!docs.columns.contains("bucket"),
      "input already has a 'bucket' column; rename it before sampling")
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(math.round(r * Gran))).otherwise(acc)
    }
    docs.withColumn("bucket", bucket(col(idCol))).filter(col("bucket") < thr)
  }

  /** Per-group contribution cap: the ≤ `maxPerGroup` rows of each
    * group with the smallest (bucket, id) — i.e. a deterministic
    * uniform quota per source/domain. Returns the keep-list
    * (`groupCol`, `idCol`, `bucket`); callers semi-join it back when
    * they need the full rows.
    *
    * Phrased as the bounded-heap top-k aggregate, NOT a window:
    * partial aggregation caps per-group state at `maxPerGroup` on the
    * map side, so a hot group (one domain = half the crawl) shuffles
    * `maxPerGroup` rows per input partition instead of sorting every
    * row of the group under a window. Selection order matches
    * `row_number() OVER (PARTITION BY group ORDER BY bucket, id)
    * <= maxPerGroup` exactly: bucket < 10^4 is exact as a double and
    * the heap tie-breaks on the long id. */
  def quotaCap(
      docs: DataFrame,
      maxPerGroup: Int,
      groupCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup must be positive, got $maxPerGroup")
    docs
      .groupBy(col(groupCol))
      .agg(graft.functions.VectorFunctions.topKPairs(
        bucket(col(idCol)).cast("double"), col(idCol), maxPerGroup).as("tk"))
      .select(col(groupCol), explode(col("tk")).as("p"))
      .select(col(groupCol), col("p.id").as(idCol), col("p.dist").cast("long").as("bucket"))
  }

  /** Sequence packing (concat-and-chunk): documents are laid out
    * end-to-end in id order and cut into fixed `budget`-token training
    * sequences; each doc gets its global token offset, the bin (=
    * training sequence) its first token lands in, and the offset
    * within that bin. Deterministic in (id order, token counts) alone,
    * so the data loader's epoch layout is reproducible run-to-run.
    *
    * Scale shape — a distributed prefix sum, NOT a global window: a
    * global `SUM OVER (ORDER BY id)` would pull the corpus through one
    * partition. Instead: range-partition by id (so partition order =
    * id order), per-partition local prefix sums under a window KEYED
    * by partition, and stitch with per-partition totals — numPartitions
    * longs, the one driver-side collect, bounded by cluster
    * parallelism, not data. The (id, n_tokens, pid) frame is
    * checkpointed BEFORE the totals collect: the offsets map is keyed
    * by the partition layout, so the totals job and the output job
    * must read the same materialization, not two recomputations of a
    * lineage that may not replay identically (sampled range bounds
    * are seeded, but upstream operators make no such promise). The
    * checkpointed frame is 16 bytes/doc — the full text never
    * materializes. Null text counts as 0 tokens (COALESCE on both
    * engines). bin_id uses integral `div`: double division drifts one
    * bin off the oracle once offsets pass 2^53 (~9e15 tokens — a real
    * corpus size for this operator). */
  def packSequences(
      docs: DataFrame,
      budget: Long = 512L,
      idCol: String = "doc_id",
      textCol: String = "text",
      tokenCount: Option[Column] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // tokenCount plugs in any per-doc count expression (e.g. the real
    // BPE count, TextAnalysis.bpeTokenCount summed over words) so the
    // packed bins reflect the layout the TRAINING tokenizer will see —
    // whitespace counts run ~30% off a BPE layout
    val counts = docs
      .select(col(idCol),
        coalesce(
          tokenCount.getOrElse(size(TextAnalysis.tokens(col(textCol))).cast("long")),
          lit(0L)).as("n_tokens"))
      .repartitionByRange(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = counts.groupBy(col("__pid")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets: Map[Int, Long] =
      pids.zip(pids.scanLeft(0L)((acc, p) => acc + totals(p)).init).toMap
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .withColumn("tok_offset",
        coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L)) +
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"tok_offset div $budget"))
      .select(col(idCol), col("n_tokens"), col("tok_offset"), col("bin_id"),
        pmod(col("tok_offset"), lit(budget)).as("bin_offset"))
  }

  /** Temperature-scaled mixture weights (the GPT-3/Pile/mC4 recipe):
    * stratum `s` gets sampling weight ∝ count(s)^α — α < 1 flattens the
    * natural distribution toward uniform so head domains stop drowning
    * the tail — and a per-stratum keep `rate` that realizes those
    * weights inside a corpus budget of `budgetFrac` × total rows
    * (capped at 1: a stratum cannot contribute more than it has; the
    * cap is why realized mixtures deviate from the ideal weights for
    * tiny strata). Feed the rates into [[mixtureSample]] to execute
    * the plan.
    *
    * Determinism across engines: count^α is computed once per STRATUM
    * (k values), immediately fixed-pointed (×10⁶, round, BIGINT), and
    * all cross-stratum arithmetic (the normalizer Σ) runs on exact
    * integers — so no float sum-order dependence anywhere. α = 0.5
    * additionally uses `sqrt`, which IEEE 754 rounds correctly in
    * every engine (`pow` only promises ~1 ulp).
    *
    * Scale shape: one partial-agg count shuffle to k stratum rows,
    * then a broadcast of the 1-row normalizer — the per-row corpus
    * never moves. */
  def temperatureWeights(
      docs: DataFrame,
      alpha: Double,
      budgetFrac: Double,
      stratumCol: String = "source"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(budgetFrac > 0.0 && budgetFrac <= 1.0, s"budgetFrac must be in (0,1], got $budgetFrac")
    val powed =
      if (alpha == 0.5) sqrt(col("n_docs").cast("double"))
      else pow(col("n_docs").cast("double"), lit(alpha))
    val c = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("zi", round(powed * 1000000.0).cast("long"))
    val tot = c.agg(sum(col("zi")).as("z"), sum(col("n_docs")).as("total"))
    c.crossJoin(broadcast(tot))
      .select(col(stratumCol), col("n_docs"),
        round(col("zi").cast("double") / col("z").cast("double"), 6).as("weight"),
        round(least(lit(1.0),
          (col("zi").cast("double") / col("z").cast("double")) *
            (col("total") * lit(budgetFrac)) / col("n_docs").cast("double")), 6).as("rate"))
  }

  /** Weighted sampling WITHOUT replacement, m rows with inclusion
    * probability proportional to `weight` (Efraimidis & Spirtes 2006,
    * algorithm A-Res): each row gets key u^(1/w) for u uniform in
    * (0, 1]; the m largest keys are the sample. Sampling documents ∝
    * token count (a token-budget-fair subset) or ∝ quality score are
    * the training-data uses.
    *
    * Determinism: u is not an RNG draw but the row's 60-bit md5-prefix
    * hash mapped to (0, 1] — the q123/KMV hash, which any engine
    * recomputes exactly, so the SAMPLE ITSELF is oracle-checkable, not
    * just its size. Rows are ranked by ln(u)/w (monotone in u^(1/w),
    * no `pow`) descending with an id tie-break.
    *
    * Scale shape: one per-row projection (md5 + ln are codegen'd
    * built-ins), then top-m via TakeOrdered — a per-partition bounded
    * heap and an m-row driver merge; the corpus is never globally
    * sorted and never shuffled. */
  def weightedSample(
      docs: DataFrame,
      m: Int,
      weight: Column,
      idCol: String = "doc_id"): DataFrame = {
    require(m >= 1, s"sample size must be >= 1, got $m")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("bigint")
    val u = (h + lit(1L)).cast("double") / lit(1152921504606846976.0) // 2^60
    val key = log(u) / weight.cast("double")
    // weight ≤ 0 means inclusion probability 0 — and must not reach the
    // key arithmetic (w=0 with u=1 gives 0/0 = NaN, which Spark orders
    // LARGEST, i.e. a guaranteed pick).
    docs.where(weight.cast("double") > 0.0)
      .select(col(idCol), weight.cast("long").as("w"),
        (round(key, 6) + lit(0.0)).as("score"), key.as("_key"))
      .orderBy(col("_key").desc, col(idCol))
      .limit(m)
      .drop("_key")
  }

  /** Curriculum ordering: the global 1-based rank of every document
    * under (`scoreCol` DESC, id ASC) — the deterministic total order a
    * curriculum data loader feeds easy-to-hard (or clean-to-noisy)
    * batches from.
    *
    * Scale shape — [[packSequences]]'s distributed prefix rank, NOT a
    * single-partition window: `ROW_NUMBER() OVER (ORDER BY ...)` with
    * no PARTITION BY pulls the corpus through one task. Instead:
    * range-partition on the sort key (partition order = global order),
    * rank locally per partition, stitch with per-partition counts —
    * numPartitions longs through the driver, bounded by parallelism.
    * The (id, score, pid) frame is checkpointed before the counts
    * collect for the same reason as packSequences: the offsets map is
    * keyed by the sampled range bounds, so the counts job and the
    * output job must read one materialization. */
  def curriculumRank(
      docs: DataFrame,
      scoreCol: Column,
      idCol: String = "doc_id"): DataFrame = {
    val scored = docs.select(col(idCol), scoreCol.as("score"))
      .repartitionByRange(col("score").desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = scored.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = counts.keys.toSeq.sorted
    val offsets: Map[Int, Long] =
      pids.zip(pids.scanLeft(0L)((acc, p) => acc + counts(p)).init).toMap
    val w = Window.partitionBy(col("__pid")).orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank",
        coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L)) +
          row_number().over(w).cast("long"))
      .select(col(idCol), col("score"), col("rank"))
  }

  /** Stratified EXACT-proportion split: within every stratum (label,
    * language, source), rows are ranked in deterministic id-hash order
    * and the first testPct% go to `test`, the next valPct% to `val`,
    * the rest to `train`. The q53 hash-threshold split is approximate
    * per stratum (binomial scatter) — fine for train buckets, wrong
    * for a 50-row eval label where ±5 rows moves the measurement;
    * this variant cuts at exact integer boundaries, and the boundary
    * test is `rank·100 ≤ n·pct` (pure integer arithmetic — no
    * division, no float, so any engine reproduces the same split).
    *
    * Scale shape: [[curriculumRank]]'s distributed prefix rank
    * generalized to composite (stratum, hash) range partitioning —
    * per-partition windows plus a driver-side offset/total map
    * bounded by numPartitions × #strata (strata are label-sized by
    * contract: tens to thousands, never unbounded). No per-stratum
    * single-reducer window; a hot stratum spans partitions and its
    * rank stitches through the offset map. Deterministic for a fixed
    * input at ANY partitioning. */
  def stratifiedSplit(
      rows: DataFrame,
      strataCol: Column,
      testPct: Int = 10,
      valPct: Int = 10,
      idCol: String = "vec_id"): DataFrame = {
    require(testPct >= 0 && valPct >= 0 && testPct + valPct <= 100,
      s"percentages must be non-negative and sum <= 100, got $testPct/$valPct")
    val keyed = rows.select(col(idCol), strataCol.cast("string").as("stratum"))
      .withColumn("__b", bucket(col(idCol)))
      .repartitionByRange(col("stratum"), col("__b"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = keyed.groupBy(col("__pid"), col("stratum"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
    val totals: Map[String, Long] =
      counts.groupBy(_._1._2).map { case (s, xs) => s -> xs.map(_._2).sum }
    val offsets: Map[String, Long] = counts
      .groupBy(_._1._2)
      .flatMap { case (s, xs) =>
        val pids = xs.map(_._1._1).sorted
        val byPid = xs.map { case ((p, _), c) => p -> c }.toMap
        pids.zip(pids.scanLeft(0L)((acc, p) => acc + byPid(p)).init)
          .map { case (p, off) => s"$p:$s" -> off }
      }
    val w = Window.partitionBy(col("__pid"), col("stratum"))
      .orderBy(col("__b"), col(idCol))
    keyed
      .withColumn("__rank",
        coalesce(element_at(typedLit(offsets), concat_ws(":", col("__pid"), col("stratum"))),
          lit(0L)) + row_number().over(w).cast("long"))
      .withColumn("__n", coalesce(element_at(typedLit(totals), col("stratum")), lit(0L)))
      .withColumn("split",
        when(col("__rank") * 100 <= col("__n") * testPct, "test")
          .when(col("__rank") * 100 <= col("__n") * (testPct + valPct), "val")
          .otherwise("train"))
      .select(col(idCol), col("stratum"), col("split"))
  }

  /** Balanced training-shard assignment: rank documents by size
    * (descending, id tie-break) and deal them round-robin across
    * `nShards` output shards — the classic longest-processing-time
    * greedy, which bounds the heaviest shard at (1 + 1/nShards)× the
    * lightest for any size distribution, so no training worker
    * stalls on a fat shard. Assignment is a pure function of the
    * global size order: deterministic across engines, partitionings,
    * and reruns (the property a resumable 100 TB shard-writing job
    * needs — re-running assigns every doc to the same shard).
    *
    * Built on [[curriculumRank]]'s distributed prefix rank, so no
    * single-partition window; the only driver traffic is the
    * numPartitions-bounded offset map. Returns (id, size, shard) —
    * the caller hands `shard` to `partitionBy` at write time. */
  def shardAssign(
      docs: DataFrame,
      nShards: Int,
      sizeCol: Column,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    curriculumRank(docs.select(col(idCol), sizeCol.as("__graft_size")),
        col("__graft_size"), idCol)
      .select(col(idCol), col("score").as("size"),
        ((col("rank") - 1) % nShards).cast("int").as("shard"))
  }

  /** Percentile-rank signal blending — the curation step that combines
    * heterogeneous quality signals (a 0–1 rule score, a token ratio, a
    * compressibility number...) into ONE comparable per-document
    * score: each signal is mapped to its tie-aware global percentile
    * (PERCENT_RANK: fraction of rows STRICTLY below — rank-normalized,
    * so signals on wildly different scales blend without tuning;
    * higher raw value = higher percentile = better by convention, so
    * negate any lower-is-better signal at the call site), then blended
    * as the plain mean. Rank normalization is the standard fix for
    * weighting incommensurable signals (same reason RRF fuses ranked
    * lists by rank, not score).
    *
    * Scale shape — NO global window, and ONE pass for ALL signals
    * (not one leg per signal): (1) the (id, signals) row melts to a
    * (signal, value) union and one partial-agg shuffle yields the
    * per-signal DISTINCT-VALUE counts frame, (2) [[stratifiedSplit]]'s
    * composite prefix machinery over that frame (range-partition by
    * (signal, value), local running sums, numPartitions × #signals
    * longs through the driver) yields count-strictly-below per
    * (signal, value), (3) one equi-join maps percentiles back onto
    * the melted rows and a per-id pivot aggregation reassembles the
    * signal columns. Everything after step 1 is distinct-value-sized
    * except the final join + pivot. Signal values are ranked as
    * DOUBLE (the union needs one type); every signal this blends is
    * numeric by construction.
    *
    * Determinism: percentile_fp = (cnt_less · 10⁶) div (n − 1) — exact
    * integer floor arithmetic; the blend is `div` by the signal count.
    * NULL signal values are the caller's to handle (filter or coalesce
    * first); they would silently drop rows from that signal's ranking.
    *
    * @param signals (name, column) — emitted as `<name>_pct` plus the
    *                combined `blend` (both double = fp / 10⁶, exact)
    */
  def percentileBlend(
      docs: DataFrame,
      signals: Seq[(String, Column)],
      idCol: String = "doc_id"): DataFrame = {
    require(signals.nonEmpty, "percentileBlend needs at least one signal")
    // names land in column identifiers AND a SQL expr string (the
    // integer-div blend) — constrain them like custom metric names
    require(signals.map(_._1).distinct.size == signals.size &&
        signals.forall { case (n, _) => n.matches("[A-Za-z][A-Za-z0-9_]*") },
      s"signal names must be unique identifiers [A-Za-z][A-Za-z0-9_]*, " +
        s"got ${signals.map(_._1)}")
    // ONE materialization of the caller's (id, signals) projection:
    // the melted stream consumes it twice (the value-counts leg and
    // the join-back leg), so an unmaterialized upstream — q160 feeds
    // the whole withTextStats tokenize pipeline in — would recompute
    // per consumer (the q115/q117 rule; measured on q160: 2.9 s →
    // ~1.2 s).
    val base = docs
      .select(col(idCol) +: signals.map { case (n, c) =>
        c.cast("double").as(s"__sig_$n") }: _*)
      .localCheckpoint(true)
    // ONE (signal, value) union drives ONE value-counts aggregation,
    // ONE range-partitioned prefix pass (the stratifiedSplit composite
    // machinery: offsets keyed (pid, signal), totals per signal), and
    // ONE join-back + per-id pivot — the former per-signal legs each
    // paid their own checkpoint, counts collect, window and join,
    // 2× the small-job count for the standard two-signal blend (r17
    // verdict item 6). Values rank as DOUBLE (declared in the scaladoc
    // above): every existing signal is numeric, and the per-signal
    // percentile only needs equality/order within its own signal.
    val melted = base.select(col(idCol), explode(array(
        signals.zipWithIndex.map { case ((name, _), si) =>
          struct(lit(si).as("sig"), col(s"__sig_$name").as("v")) }: _*)).as("sv"))
      .select(col(idCol), col("sv.sig").as("sig"), col("sv.v").as("v"))
    val vc = melted.groupBy(col("sig"), col("v")).agg(count(lit(1)).as("c"))
      .repartitionByRange(col("sig"), col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val perPidSig = vc.groupBy(col("__pid"), col("sig")).agg(sum(col("c")).as("t"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
    val totals: Map[Int, Long] =
      perPidSig.groupBy(_._1._2).map { case (s, xs) => s -> xs.map(_._2).sum }
    val offsets: Map[String, Long] = perPidSig
      .groupBy(_._1._2)
      .flatMap { case (s, xs) =>
        val pids = xs.map(_._1._1).sorted
        val byPid = xs.map { case ((p, _), c) => p -> c }.toMap
        pids.zip(pids.scanLeft(0L)((acc, p) => acc + byPid(p)).init)
          .map { case (p, off) => s"$p:$s" -> off }
      }
    // per-signal PERCENT_RANK denominator (n_sig − 1, floored at 1 for
    // the single-row frame) — a plan literal map like the offsets
    val nm1: Map[Int, Long] =
      totals.map { case (s, n) => s -> math.max(n - 1, 1L) }
    val w = Window.partitionBy(col("__pid"), col("sig")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pcts = vc
      .withColumn("cnt_less",
        coalesce(element_at(typedLit(offsets),
          concat_ws(":", col("__pid"), col("sig"))), lit(0L)) +
          coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("__nm1", element_at(typedLit(nm1), col("sig")))
      .select(col("sig"), col("v"),
        expr("(cnt_less * 1000000) div __nm1").as("fp"))
    val joined = melted.join(pcts, Seq("sig", "v"))
      .groupBy(col(idCol))
      .agg(
        max(when(col("sig") === 0, col("fp"))).as(s"${signals.head._1}_fp"),
        signals.zipWithIndex.tail.map { case ((name, _), si) =>
          max(when(col("sig") === si, col("fp"))).as(s"${name}_fp") }: _*)
      // a NULL signal value never joins its ranking (exactly as
      // before, when the per-signal inner joins dropped the id) — the
      // pivot must not resurrect such ids with a null percentile
      .filter(signals.map { case (n, _) => col(s"${n}_fp").isNotNull }
        .reduce(_ && _))
    val blendFp = expr(
      s"(${signals.map { case (n, _) => s"${n}_fp" }.mkString(" + ")}) div ${signals.length}")
    val out = joined
      .select(Seq(col(idCol)) ++
        signals.map { case (name, _) =>
          (col(s"${name}_fp").cast("double") / 1e6).as(s"${name}_pct") } ++
        Seq((blendFp.cast("double") / 1e6).as("blend")): _*)
      .orderBy(col(idCol))
      .localCheckpoint(true)
    graft.plans.Blocks.release(vc)
    graft.plans.Blocks.release(base)
    out
  }

  /** UniMax language-budget allocation (Chung et al., TMLR 2023 —
    * "UniMax: Fairer and More Effective Language Sampling"): spread a
    * token budget as uniformly as possible across strata, capping each
    * stratum at `maxEpochs` passes over its data — the successor to
    * temperature sampling ([[temperatureWeights]]) that never
    * over-epochs a low-resource language. Exact integer water-filling:
    * sort strata by cap ascending, find the last rank j* whose cap
    * fits under the even split of what remains (cap·(n−j+1)+prefix ≤
    * budget via one window pass), fully fund ranks ≤ j*, and give the
    * rest the integer water level t = (budget − prefix_{j*}) DIV
    * (n − j*). Floor-division remainders stay unallocated
    * (deterministic; at token scale the dust is ≤ n−1 tokens).
    *
    * Scale shape: the input is the per-stratum count card (languages/
    * sources — dashboard-sized by construction), so the global sort
    * window is over dozens of rows; the corpus-sized work happened in
    * the upstream count aggregate. Emits per stratum: n (base
    * tokens), cap, allocated, and HALF_UP epochs_per_10k. */
  def unimaxAllocation(
      counts: DataFrame,
      budget: Long,
      maxEpochs: Int = 4,
      groupCol: String = "lang",
      countCol: String = "n_tokens"): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val w = Window.orderBy(col("cap"), col(groupCol))
    // checkpoint the card so the upstream corpus aggregate runs ONCE
    // (the j*/water-level scan below and the result projection both
    // read the materialized card, not the corpus)
    val ranked = counts
      .select(col(groupCol), col(countCol).cast("long").as("n"),
        (col(countCol).cast("long") * maxEpochs).as("cap"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("pfx", sum(col("cap")).over(w))
      .localCheckpoint(true)
    // j* and the water level, computed on the collected stratum card
    // (dashboard-sized by contract — the same driver-bounded pattern
    // as every fitted artifact here)
    val card = ranked.collect().sortBy(_.getAs[Long]("rnk"))
    val ng = card.length.toLong
    var jStar = 0L
    var pfxJ = 0L
    card.foreach { r =>
      val (rnk, cap, pfx) = (r.getAs[Long]("rnk"), r.getAs[Long]("cap"), r.getAs[Long]("pfx"))
      if (cap * (ng - rnk + 1) + (pfx - cap) <= budget) { jStar = rnk; pfxJ = pfx }
    }
    val t = if (ng > jStar) (budget - pfxJ) / (ng - jStar) else 0L
    ranked
      .withColumn("allocated",
        when(col("rnk") <= jStar, col("cap"))
          .otherwise(least(col("cap"), lit(t))))
      .withColumn("epochs_per_10k",
        expr("(allocated * 20000 + n) DIV (n * 2)"))
      .drop("rnk", "pfx")
  }

  /** DSIR-style hashed-unigram bucket statistics: per hash bucket, the
    * token count over the whole corpus (`cr`) and over the rows where
    * `isTarget` holds (`ct`). The distribution pair behind importance
    * resampling (Xie et al. 2023, "Data Selection for Language Models
    * via Importance Resampling" — hashed n-gram features make the
    * raw/target density ratio estimable with a fixed-size table).
    *
    * Scale shape: tokens fold map-side into `buckets` partial rows per
    * task, so the only exchange is `buckets` rows of three BIGINTs —
    * at 100 TB this is one corpus scan and a kilobyte-scale shuffle.
    * The bucket id is the cross-engine md5-prefix hash (same idiom as
    * [[bucket]]), so any SQL engine can replay the fit. */
  def dsirBucketStats(
      docs: DataFrame,
      isTarget: Column,
      buckets: Int = 1024,
      textCol: String = "text"): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    docs
      .select(isTarget.as("__graft_t"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(dsirBucket(col("tok"), buckets).as("bkt"), col("__graft_t"))
      .groupBy(col("bkt"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("__graft_t"), 1L).otherwise(0L)).as("ct"))
  }

  /** Cross-engine token -> bucket map: 60-bit md5 prefix mod `buckets`
    * (DuckDB twin: `('0x' || substr(md5(tok), 1, 15))::UBIGINT % B`). */
  private def dsirBucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % buckets

  /** DSIR importance scoring: fit the raw/target hashed-unigram bucket
    * distributions ([[dsirBucketStats]]), then score every document
    * with the EXACT-integer linearized log-likelihood-ratio surrogate
    *
    *   score(d) = Σ_tokens ( ct[b]·Nraw − cr[b]·Ntarget )
    *
    * — each term is the (cross-multiplied, denominator-free) sign and
    * magnitude of p_target[b] − p_raw[b], so `score > 0` keeps
    * documents whose hashed-unigram mass sits in buckets the target
    * domain over-represents. Exact BIGINT end to end: any SQL engine
    * replays the fit AND the scores bit-for-bit (no logs, no floats).
    *
    * Scale shape: the fit collects `buckets` rows (the model — a few
    * KB, same driver-bounded pattern as every other fitted artifact
    * here), and the scoring pass is fully NARROW: the two count
    * arrays ship as array literals in the plan (one `Literal` each —
    * no 2·B-expression codegen blowup) and each token does two O(1)
    * `element_at` lookups, so scoring 100 TB is one map-only pass
    * with zero shuffle. Overflow headroom: the DOCUMENT sum must stay
    * under 2^63, i.e. max-per-token-term × doc length — the guard in
    * [[dsirScore]] bounds the worst token term from the actual fit
    * arrays and budgets 2^20 tokens per document (Spark long
    * arithmetic wraps silently outside ANSI mode, so this must be
    * refused up front); past that, rescale the per-bucket deltas to a
    * fixed-point ratio before the scoring pass (the fit table is
    * driver-sized, so the rescale is free).
    *
    * Emits the input columns plus BIGINT `score`. */
  def dsirImportance(
      docs: DataFrame,
      isTarget: Column,
      buckets: Int = 1024,
      textCol: String = "text"): DataFrame = {
    val stats = dsirBucketStats(docs, isTarget, buckets, textCol).collect()
    val cr = new Array[Long](buckets)
    val ct = new Array[Long](buckets)
    stats.foreach { r =>
      val b = r.getLong(0).toInt
      cr(b) = r.getLong(1)
      ct(b) = r.getLong(2)
    }
    dsirScore(docs, cr, ct, textCol)
  }

  /** Apply a frozen DSIR model (the per-bucket raw/target count
    * arrays from [[dsirBucketStats]]) — the narrow scoring half of
    * [[dsirImportance]], split out so a STREAM can score arrivals
    * with zero state and zero joins (the model is a plan literal;
    * see [[graft.streaming.StreamingOps.streamingDsirScore]]). */
  def dsirScore(
      docs: DataFrame,
      cr: Array[Long],
      ct: Array[Long],
      textCol: String = "text"): DataFrame = {
    require(cr.length == ct.length && cr.length >= 2,
      s"model arrays must agree and have >= 2 buckets (got ${cr.length}/${ct.length})")
    val buckets = cr.length
    val nr = cr.sum
    val nt = ct.sum
    // The score SUMS one term per token, so the single-term bound
    // (Nt·Nr < 2^63) is not enough: a long document in skewed buckets
    // can wrap the running BIGINT sum silently (Spark long arithmetic
    // is non-ANSI modular). Bound the worst per-token term from the
    // ACTUAL fit arrays and budget MaxDocTokens tokens per document —
    // exact BigInt arithmetic so the guard itself can't overflow.
    val worstTerm =
      (BigInt(ct.max) * BigInt(nr)).max(BigInt(cr.max) * BigInt(nt))
    require(worstTerm * BigInt(MaxDocTokens) < BigInt(Long.MaxValue),
      s"worst per-token term ${worstTerm} x $MaxDocTokens-token document " +
        "budget risks BIGINT overflow in the per-document score sum; " +
        "rescale the fit table to fixed-point ratios first")
    docs
      // token-less documents are DROPPED, not scored 0: they carry no
      // evidence either way, and every unnest-shaped SQL twin of this
      // scoring pass (one row per token, grouped back) never sees them
      // — emitting a 0 row here would silently diverge from any such
      // replay the moment a corpus gains an empty/whitespace-only doc
      .filter(size(TextAnalysis.tokens(col(textCol))) >= 1)
      .withColumn("__graft_bkts",
        transform(TextAnalysis.tokens(col(textCol)),
          t => (dsirBucket(t, buckets) + 1L).cast("int")))
      // the fit-time guard above budgets MaxDocTokens per document —
      // ENFORCE it per row too (r14 advisor): a document over the
      // budget would wrap the non-ANSI BIGINT sum silently, the exact
      // corruption the guard exists to refuse, so it fails the job
      // loudly instead (callers with longer documents pre-chunk or
      // rescale the fit table; in-budget rows pay one array-length
      // compare)
      .withColumn("score",
        when(size(col("__graft_bkts")) > MaxDocTokens,
          raise_error(concat(
            lit(s"dsirScore: document with "), size(col("__graft_bkts")),
            lit(s" tokens exceeds the $MaxDocTokens-token overflow budget — " +
              "pre-chunk it or rescale the fit table to fixed-point ratios"))))
          .otherwise(
            aggregate(col("__graft_bkts"), lit(0L), (acc, b) =>
              acc + element_at(lit(ct), b) * nr - element_at(lit(cr), b) * nt)))
      .drop("__graft_bkts")
  }

  /** Per-document token budget assumed by [[dsirScore]]'s overflow
    * guard: 2^20 (~1M tokens) — generous for any real document (a
    * book is ~10^5) while keeping the guard meaningful. */
  val MaxDocTokens: Long = 1L << 20
}
