package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Fully-distributed batch ANN: beam search over the proximity graph
  * expressed as iterative DataFrame joins (Pregel-style), for query
  * sets too large to serve one-at-a-time through [[ServingIndex]].
  *
  * Per step, for every query in parallel:
  *   frontier ⋈ adjacency → candidate neighbors → ⋈ vectors → score →
  *   union with current beam → per-query top-B (bounded-heap
  *   aggregate) → next frontier.
  *
  * Scale shape: each step is two equi-joins (adjacency on node id,
  * vectors on node id — both co-partitionable by id at 100 TB via
  * bucketing) plus one partial-aggregated top-B; state per query is
  * bounded by the beam width B, so the working set is
  * O(|queries| · B) rows regardless of index size. A fixed step count
  * bounds the plan depth (no driver-side convergence loop over
  * unbounded iterations); B·steps plays the role of ef.
  *
  * This is the batch complement of the reference's sequential greedy
  * traversal (src/LMDiskANN.jl:383-431): same expansion rule, executed
  * breadth-parallel for all queries at once.
  */
object DistributedSearch {

  /** @param index    built index (vectors + adjacency snapshots)
    * @param queries  (query_id BIGINT, qvec ARRAY<FLOAT>)
    * @param topk     results per query
    * @param beamWidth frontier size per query per step (default 32)
    * @param steps    expansion rounds (default 6 — graph diameter of
    *                 the ring-backboned kNN graph is small)
    * @return (query_id, public_id, key, dist, rnk) nearest-first.
    *
    * IMPORTANT: the result is a localCheckpoint'ed DataFrame, and
    * `Dataset.unpersist` cannot release checkpoint blocks (see
    * [[graft.plans.Blocks]]). A caller that invokes beamSearch
    * repeatedly in one session MUST free each consumed result via
    * [[release]] or the pinned result blocks accumulate. */
  def beamSearch(
      index: VectorIndex,
      queries: DataFrame,
      topk: Int,
      beamWidth: Int = 32,
      steps: Int = 6,
      shared: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val spark = index.spark
    // `shared`: already-cached (vectors, adjacency) owned by the caller
    // — a session searching the same snapshot repeatedly keeps ONE
    // cached copy alive instead of paying a re-cache per call (and this
    // function then must not unpersist what it does not own)
    val vectors = shared.map(_._1).getOrElse(
      index.vectors.select(col("id"), col("key"), col("vec")).cache())
    val adjacency = shared.map(_._2).getOrElse(index.adjacency.cache())
    val ownsCaches = shared.isEmpty
    val metric = index.metric
    val dcol = Metric.distColumn(metric, col("qvec"), col("vec"))
    val q = queries.select(col("query_id"), col("qvec"))

    // seed: every query starts at the entrypoint — but only if it is
    // actually live. A stale/dead entrypoint (e.g. from an older
    // snapshot) would otherwise produce an empty seed and silently
    // return zero results for every query; fall back to the smallest
    // live id, the same re-election rule ServingIndex.finishLoad uses.
    val ep = index.meta.entrypoint.toLong
    val entry: Long =
      if (ep >= 0 && vectors.filter(col("id") === ep).limit(1).count() == 1L) ep
      else vectors.agg(min(col("id"))).head().get(0) match {
        case l: java.lang.Long => l.longValue()
        case _ =>
          if (ownsCaches) { vectors.unpersist(); adjacency.unpersist() }
          return spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("query_id", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("public_id", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("dist", org.apache.spark.sql.types.DoubleType),
              org.apache.spark.sql.types.StructField("rnk", org.apache.spark.sql.types.IntegerType))))
      }
    // The frontier state is (query_id, id, dist) ONLY: qvec — the one
    // wide column (d floats per row, × beamWidth rows per query) — is
    // re-attached per step from this one small materialized frame at
    // scoring time instead of riding the beam through every union,
    // top-B exchange, aggregate buffer and checkpoint (guide §2.3
    // "shuffle keys and metadata instead of payloads": the hop's
    // decisions need only (dist, id); the payload joins back in one
    // equi-join per step). Distances are computed from the identical
    // (qvec, vec) values, so every beam row is bit-for-bit the same.
    val qmat = q.localCheckpoint(true)
    var beam = qmat
      .join(vectors.filter(col("id") === entry).select(col("id"), col("vec")))
      .select(col("query_id"), col("id"), dcol.as("dist"))
      .localCheckpoint(true)

    var step = 0
    var lastCk = beam // most recent materialized checkpoint
    while (step < steps) {
      val topb = stepPlan(beam, qmat, vectors, adjacency, dcol, beamWidth)
      // localCheckpoint truncates lineage so each step plans against a
      // recent materialized leaf instead of the whole history
      // (driver-side planning cost would otherwise grow superlinearly
      // with steps) — but each checkpoint is also a full job barrier,
      // so do it every OTHER step: plan depth stays bounded at two
      // steps while the job count halves. (Every-THIRD-step was
      // measured this round: the deeper per-step replanning cost MORE
      // than the saved barrier — q34 1.6 → 2.4 s solo — so two is the
      // measured optimum, not a guess.) The prior checkpoint's blocks
      // are only released once the next one is materialized.
      val doCk = step % 2 == 1 || step == steps - 1
      val next = if (doCk) topb.localCheckpoint(true) else topb
      if (doCk) {
        graft.plans.Blocks.release(lastCk) // checkpoint blocks; unpersist is a no-op
        lastCk = next
      }
      beam = next
      step += 1
    }

    val winners = beam
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("id"), topk).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("id"), col("p.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rnk"))
    // materialize the result BEFORE releasing the caches: a long-lived
    // session calling beamSearch repeatedly must not accumulate cached
    // vector/adjacency blocks (or per-step checkpoint blocks)
    val result = winners.join(vectors.select(col("id"), col("key")), Seq("id"))
      .select(col("query_id"), (col("id") + 1).as("public_id"), col("key"),
        col("dist"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
      .localCheckpoint(true)
    graft.plans.Blocks.release(beam)
    graft.plans.Blocks.release(qmat)
    if (ownsCaches) {
      vectors.unpersist()
      adjacency.unpersist()
    }
    result
  }

  /** One beam-search hop as a LAZY plan — the loop body of
    * [[beamSearch]], extracted so ExplainAudit can dump the per-hop
    * join/exchange shape (the loop checkpoints each hop, so the shape
    * is only auditable pre-checkpoint). The frontier carries only
    * (query_id, id, dist); qvec joins back from `qmat` at scoring
    * time; ONE shuffle per hop (the distinct-id top-B heap dedups
    * repeated candidates inside the aggregate — distances are
    * deterministic per id, so duplicates are exact equals). */
  private[graft] def stepPlan(
      beam: DataFrame,
      qmat: DataFrame,
      vectors: DataFrame,
      adjacency: DataFrame,
      dcol: org.apache.spark.sql.Column,
      beamWidth: Int): DataFrame = {
    val expanded = beam
      .join(adjacency, Seq("id"))
      .select(col("query_id"), explode(col("nbrs")).as("id"))
    val scored = expanded
      .join(qmat, Seq("query_id"))
      .join(vectors.select(col("id"), col("vec")), Seq("id"))
      .select(col("query_id"), col("id"), dcol.as("dist"))
      .unionByName(beam)
    scored
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairsDistinct(col("dist"), col("id"), beamWidth).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.id").as("id"), col("p.dist").as("dist"))
  }

  /** Free the checkpoint blocks behind a consumed [[beamSearch]]
    * result (safe on any DataFrame — no-op when nothing is pinned). */
  def release(result: DataFrame): Unit = graft.plans.Blocks.release(result)
}
