package graft.operators

import graft.SparkSpec

/** GraphAnalytics.pageRankFp contract: hand-computed fixed-point
  * ranks, dangling-node behavior, and partition independence. */
class GraphAnalyticsSpec extends SparkSpec {

  private def frames(nodeIds: Seq[Long], edges: Seq[(Long, Long)]) = {
    val ss = spark
    import ss.implicits._
    (nodeIds.toDF("id"), edges.toDF("a", "b"))
  }

  test("one round on a 3-node funnel matches the hand-computed fixed point") {
    // 1 -> 2, 3 -> 2, 2 -> 1 ; n = 3
    val (nodes, edges) = frames(Seq(1L, 2L, 3L), Seq((1L, 2L), (3L, 2L), (2L, 1L)))
    val r = GraphAnalytics.pageRankFp(nodes, edges, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // r0 = floor(1e9/3) = 333333333, teleport = floor(0.15e9/3) = 50000000
    // contribution along each out-degree-1 edge = floor(0.85 * 333333333)
    val share = math.floor(0.85 * math.floor(333333333.0)).toLong
    assert(r == Map(
      2L -> (50000000L + 2 * share), // funnel target
      1L -> (50000000L + share),
      3L -> 50000000L))              // no in-edges: teleport only
  }

  test("dangling node keeps its teleport share; hubs rank first") {
    // 4 is dangling (no out-edges); 1,2,3 all point at 4
    val (nodes, edges) = frames(Seq(1L, 2L, 3L, 4L),
      Seq((1L, 4L), (2L, 4L), (3L, 4L)))
    val top = GraphAnalytics.topHubs(
      GraphAnalytics.pageRankFp(nodes, edges, iters = 2), 2)
      .collect().map(x => (x.getAs[Int]("rnk"), x.getAs[Long]("id")))
    assert(top.toSeq == Seq((1, 4L), (2, 1L))) // hub first, then lowest id
  }

  test("hopDepths: min-hop histogram with an unreachable node") {
    // 1 -> 2 -> 3, 1 -> 3 (shortcut: 3 is depth 1, not 2), 4 isolated
    val (nodes, edges) = frames(Seq(1L, 2L, 3L, 4L),
      Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val out = GraphAnalytics.hopDepths(nodes, edges, source = 1L)
    val hist = out.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    graft.plans.Blocks.release(out)
    assert(hist == Map(0 -> 1L, 1 -> 2L, -1 -> 1L))
  }

  test("hopDepths: a cycle terminates and reports each node once") {
    val (nodes, edges) = frames(Seq(1L, 2L, 3L),
      Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val out = GraphAnalytics.hopDepths(nodes, edges, source = 1L)
    val hist = out.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    graft.plans.Blocks.release(out)
    assert(hist == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, -1 -> 0L))
  }

test("triangleStats: K4 is fully clustered, a star has none, pendant triangle is 3/5") {
    // K4: 4 triangles, 6 undirected edges, 12 wedges, cc = 1.0
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val (n4, e4) = frames(1L to 4L, k4)
    val r4 = GraphAnalytics.triangleStats(n4, e4).collect().head
    assert((r4.getLong(0), r4.getLong(1), r4.getLong(2), r4.getLong(3), r4.getDouble(4)) ==
      ((4L, 6L, 12L, 4L, 1.0)))
    // star (hub 1 -> 2..5): wedges at the hub only, zero triangles
    val (ns, es) = frames(1L to 5L, (2L to 5L).map(i => (1L, i)))
    val rs = GraphAnalytics.triangleStats(ns, es).collect().head
    assert((rs.getLong(2), rs.getLong(3), rs.getDouble(4)) == ((6L, 0L, 0.0)))
    // triangle 1-2-3 with pendant 4 on node 3 (duplicated directed
    // edges + a self-loop must not change anything)
    val (np, ep) = frames(1L to 4L,
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 1L), (3L, 3L)))
    val rp = GraphAnalytics.triangleStats(np, ep).collect().head
    assert((rp.getLong(1), rp.getLong(2), rp.getLong(3), rp.getDouble(4)) ==
      ((4L, 5L, 1L, 0.6)))
  }

  test("ranks are independent of partitioning (integer sums)") {
    val ids = (1L to 40L)
    val edges = ids.flatMap(i => Seq((i, i % 40 + 1), (i, (i * 7) % 40 + 1)))
    val (nodes, e) = frames(ids, edges)
    val a = GraphAnalytics.pageRankFp(nodes.coalesce(1), e.coalesce(1), 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val b = GraphAnalytics.pageRankFp(nodes.repartition(7), e.repartition(5), 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(a == b)
  }

  test("degreeAssortativity: hand-computed co-moments and correlation; degenerate side yields NULL") {
    val ss = spark
    import ss.implicits._
    // out-degrees 1:2, 2:1; in-degrees 2:1, 3:2
    // edge (x=outdeg a, y=indeg b): (2,1), (2,2), (1,2)
    // m=3 sx=5 sy=5 sxx=9 syy=9 sxy=8 -> num=-1 den=2/2 -> r=-0.5
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val got = GraphAnalytics.degreeAssortativity(e).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((3L, 5L, 5L)))
    assert((got.getLong(3), got.getLong(4), got.getLong(5)) == ((9L, 9L, 8L)))
    assert((got.getLong(6), got.getLong(7), got.getLong(8)) == ((-1L, 2L, 2L)))
    assert(got.getDouble(9) == -0.5)
    // a star: every target in-degree is 1, so den_y = 0 -> NULL r,
    // never an engine-dependent inf/NaN
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val deg = GraphAnalytics.degreeAssortativity(star).collect()(0)
    assert(deg.getLong(8) == 0L && deg.isNullAt(9))
  }
}
