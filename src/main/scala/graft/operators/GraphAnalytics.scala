package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph centrality over an edge list — applied to the ANN index's
  * adjacency it answers "which nodes dominate search traffic":
  * high-PageRank hubs are the nodes every greedy walk funnels through
  * (they bound cache working-set size and are the first candidates for
  * degree-cap review). Brin & Page 1998; the bounded-iteration
  * fixed-point form below.
  *
  * Scale shape, per iteration:
  *   - contributions: edges ⋈ out-degrees ⋈ current ranks — two
  *     hash-joins on the edge's source key (at 100 TB these co-locate
  *     if the edge list is bucketed by `a`), then ONE partial-agg
  *     groupBy on the destination. State between iterations is one
  *     (id, rank) frame of V rows — never materialized per-edge.
  *   - no driver-side structures: the only driver action is the
  *     one-time node count (an O(1)-result aggregate).
  *
  * Determinism (hash-oracle-able like Clustering): ranks are longs in
  * 10⁻⁹ fixed point. Per-edge contribution floor(0.85 · floor(r/d))
  * and teleport floor(0.15 · 10⁹ / n) are floors of correctly-rounded
  * IEEE doubles (operands ≤ 2⁵³, exact) — bit-identical in any engine
  * — and the per-destination sum is an integer sum, add-order free.
  * DuckDB replays the unrolled iterations from the same dumped edge
  * list (see AnnQueries q137).
  *
  * Dangling nodes (out-degree 0) keep their teleport share but their
  * rank mass is not redistributed — the standard simplification; total
  * mass then decays at dangling-mass rate per round, which is fine for
  * RANKING (the use here) and keeps the iteration one-join cheap.
  */
object GraphAnalytics {

  private val Fp = 1e9
  private val Damp = 0.85

  /** `iters` fixed-point PageRank rounds over directed `edges(a, b)`
    * restricted to `nodes(id)`; returns (id, rank_fp) for every node.
    * Edges whose endpoints are outside `nodes` still contribute mass
    * only if their source is a node (callers pass a consistent dump).
    */
  def pageRankFp(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val n = nodes.count().toDouble
    val teleport = math.floor((1.0 - Damp) * Fp / n).toLong
    val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("d"))
    val withDeg = edges.join(deg, "a")
    var r = nodes.select(col("id"), lit(math.floor(Fp / n).toLong).as("r"))
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(r.withColumnRenamed("id", "a"), "a")
        .groupBy(col("b"))
        .agg(sum(floor(lit(Damp) * floor(col("r").cast("double") / col("d").cast("double")))
          .cast("long")).as("cs"))
      r = nodes
        .join(contrib.withColumnRenamed("b", "id"), Seq("id"), "left")
        .select(col("id"), (lit(teleport) + coalesce(col("cs"), lit(0L))).as("r"))
    }
    r.select(col("id"), col("r").as("rank_fp"))
  }

  /** Top-k hubs by (rank_fp desc, id): TakeOrdered-shaped limit first
    * (scale-safe — never a global single-partition window over V),
    * then a row_number over the k surviving rows only. */
  def topHubs(ranks: DataFrame, k: Int): DataFrame = {
    val top = ranks.orderBy(col("rank_fp").desc, col("id")).limit(k)
    top.withColumn("rnk",
      row_number().over(Window.orderBy(col("rank_fp").desc, col("id"))).cast("int"))
  }

  /** BFS hop-depth histogram from `source` over directed `edges(a,b)`
    * restricted to `nodes(id)` — applied to the index graph it is the
    * SEARCH-LATENCY audit: every greedy walk starts at the entrypoint,
    * so the depth distribution bounds how many adjacency rounds a
    * query needs to reach any region, and a growing tail after heavy
    * churn says "time to re-elect the entrypoint / rebuild".
    *
    * Returns (depth, n_nodes) plus a constant depth = -1 row counting
    * unreachable live nodes (0 on a healthy index — the q114
    * reachable_frac failure mode, localized by depth here).
    *
    * Scale shape: frontier-relaxation BFS — each round is one
    * equi-join of the FRONTIER (not the full visited set) against the
    * edge list plus an anti-join to drop already-visited nodes; rounds
    * = graph diameter (small-world ANN graphs: O(log V)). Per-round
    * frames are localCheckpoint'ed and released (the
    * connectedComponents block-hygiene discipline) so lineage stays
    * flat. Throws if the frontier is still growing at `maxRounds` —
    * a silent cap would under-report depths as unreachable. */
  def hopDepths(nodes: DataFrame, edges: DataFrame, source: Long,
      maxRounds: Int = 30): DataFrame = {
    import graft.plans.Blocks
    val e = edges.localCheckpoint(true)
    var dist = nodes.filter(col("id") === source)
      .select(col("id"), lit(0).cast("int").as("d"))
      .localCheckpoint(true)
    var frontier = dist
    var round = 0
    var exhausted = false
    while (!exhausted && round < maxRounds) {
      round += 1
      val next = frontier.join(e, frontier("id") === e("a"))
        .select(col("b").as("id")).distinct()
        .join(dist.select(col("id")), Seq("id"), "left_anti")
        .join(nodes, Seq("id"), "left_semi")
        .select(col("id"), lit(round).cast("int").as("d"))
        .localCheckpoint(true)
      if (next.isEmpty) {
        exhausted = true
        Blocks.release(next)
      } else {
        val grown = dist.unionByName(next).localCheckpoint(true)
        if (frontier ne dist) Blocks.release(frontier)
        Blocks.release(dist)
        dist = grown
        frontier = next
      }
    }
    if (!exhausted)
      throw new IllegalStateException(
        s"hopDepths: frontier still growing after $maxRounds rounds — " +
          "diameter exceeds the bound; raise maxRounds")
    val out = dist.groupBy(col("d")).agg(count(lit(1)).as("n_nodes"))
      .select(col("d").as("depth"), col("n_nodes"))
      .unionByName(
        nodes.join(dist, Seq("id"), "left_anti")
          .agg(count(lit(1)).as("n_nodes"))
          .select(lit(-1).cast("int").as("depth"), col("n_nodes")))
      .orderBy(col("depth"))
      .localCheckpoint(true)
    if (frontier ne dist) Blocks.release(frontier)
    Blocks.release(dist)
    Blocks.release(e)
    out
  }

  /** Exact triangle count + global clustering coefficient over the
    * UNDIRECTED closure of `edges(a, b)` — the neighborhood-quality
    * audit for a search graph (a well-built kNN graph is locally
    * clustered; a coefficient collapse after churn means neighbors no
    * longer know each other and greedy descent loses its shortcuts).
    *
    * Degree-ordered node-iterator (Schank & Wagner 2005): every edge
    * is oriented from its (degree, id)-SMALLER endpoint toward the
    * larger, wedges are enumerated only at the smaller endpoint, and
    * each triangle is counted exactly once at its minimum vertex. The
    * orientation bounds per-vertex wedge fan-out by out-degree ≤
    * O(√|E|) regardless of hub size — the skew guard that makes the
    * wedge self-join survive power-law degree distributions at scale;
    * everything is an equi-join / partial agg, no driver loops.
    * Returns ONE row: (n_nodes, n_edges_und, n_wedges, n_triangles,
    * global_cc = 3·T / wedges, 4 dp). */
  def triangleStats(nodes: DataFrame, edges: DataFrame): DataFrame = {
    import graft.plans.Blocks
    val und = edges.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("x"), greatest(col("a"), col("b")).as("y"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("x").as("id")).unionAll(und.select(col("y").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    // orient each edge from (deg, id)-smaller u toward larger v
    val oriented = und
      .join(deg.select(col("id").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("id").as("y"), col("d").as("dy")), "y")
      .select(
        when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")), col("x"))
          .otherwise(col("y")).as("u"),
        when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")), col("y"))
          .otherwise(col("x")).as("v"))
      .localCheckpoint(true)
    // wedge (v, w) at u with ord(v) < ord(w); closing edge must be v->w
    val e1 = oriented.select(col("u"), col("v"))
    val e2 = oriented.select(col("u"), col("v").as("w"))
    val ordOf = deg.select(col("id"), struct(col("d"), col("id")).as("ord"))
    val wedges = e1.join(e2, "u").filter(col("v") =!= col("w"))
      .join(ordOf.select(col("id").as("v"), col("ord").as("ov")), "v")
      .join(ordOf.select(col("id").as("w"), col("ord").as("ow")), "w")
      .filter(col("ov") < col("ow"))
      .select(col("v").as("u"), col("w").as("v"))
    val tri = wedges.join(oriented, Seq("u", "v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val wedgeTotal = deg
      .agg(sum(col("d") * (col("d") - 1) / 2).as("n_wedges"))
    val counts = nodes.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges_und")))
      .crossJoin(wedgeTotal).crossJoin(tri)
    val out = counts.select(col("n_nodes"), col("n_edges_und"),
        col("n_wedges").cast("long").as("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0)).otherwise(
          round(lit(3.0) * col("n_triangles") / col("n_wedges").cast("double"), 4)
            + lit(0.0)).as("global_cc"))
      .localCheckpoint(true)
    Blocks.release(und)
    Blocks.release(oriented)
    out
  }

  /** Directed degree assortativity (Newman 2002, the out-in variant):
    * the Pearson correlation between the source's out-degree and the
    * target's in-degree across every directed edge — the hub-mixing
    * audit of the index graph (r ≈ 0: degree-neutral wiring, the kNN
    * default; r << 0: hubs feed leaves, the funnel shape that makes
    * entrypoint churn dangerous; r >> 0 after churn: a hub-core
    * forming, the cache-hot / delete-fragile smell).
    *
    * Emits the EXACT BIGINT co-moment sums (m, Σx, Σy, Σxx, Σyy,
    * Σxy) and the correlation's exact integer numerator/denominator
    * terms alongside the rounded r — so any engine recomputes r from
    * the same integers, and the only double ops are two correctly-
    * rounded sqrts and one division on identical inputs (the q84
    * discipline). Degenerate denominators (a degree-regular side)
    * yield NULL r rather than an engine-dependent inf/NaN.
    *
    * Scale shape: two degree aggregates + two equi-joins back onto
    * the edge list + one global co-moment aggregate — all linear in
    * edges, all partial-agged. BIGINT headroom: m·Σxx ≤ m²·maxdeg²
    * needs m ≤ ~3e7 at maxdeg 64; past that rescale to DECIMAL(38,0)
    * (the degree cap makes every term's bound explicit). */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val outd = edges.groupBy(col("a")).agg(count(lit(1)).as("ja"))
    val ind = edges.groupBy(col("b")).agg(count(lit(1)).as("jb"))
    edges.join(outd, "a").join(ind, "b")
      .agg(count(lit(1)).as("m"),
        sum(col("ja")).as("sx"), sum(col("jb")).as("sy"),
        sum(col("ja") * col("ja")).as("sxx"),
        sum(col("jb") * col("jb")).as("syy"),
        sum(col("ja") * col("jb")).as("sxy"))
      .select(col("m"), col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"),
        (col("m") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("m") * col("sxx") - col("sx") * col("sx")).as("den_x"),
        (col("m") * col("syy") - col("sy") * col("sy")).as("den_y"))
      .withColumn("assortativity",
        when(col("den_x") > 0L && col("den_y") > 0L,
          round(col("num").cast("double") /
            (sqrt(col("den_x").cast("double")) * sqrt(col("den_y").cast("double"))), 4)
            + lit(0.0)))
  }
}
