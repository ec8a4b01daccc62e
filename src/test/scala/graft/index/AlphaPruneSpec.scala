package graft.index

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AlphaPruneSpec extends SparkSpec {

  test("pruneOne discards candidates better reached through a kept neighbor") {
    // p at origin; a = (1,0); b = (1.1, 0) sits right behind a.
    // d(p,b)=1.1, d(a,b)=0.1 -> alpha*d(a,b) <= d(p,b) -> b pruned.
    val a = Array(1f, 0f)
    val b = Array(1.1f, 0f)
    val c = Array(0f, 1.2f) // diverse direction, kept
    val cands = IndexedSeq(
      (1.0, 10L, a), (1.1, 11L, b), (1.2, 12L, c))
    val kept = AlphaPrune.pruneOne(cands, maxDegree = 3, alpha = 1.2, Metric.Euclidean)
    assert(kept.toSeq == Seq(10L, 12L))
    // truncation would have kept all three
    assert(cands.sortBy(_._1).take(3).map(_._2) == Seq(10L, 11L, 12L))
  }

  test("alpha build: degree bound holds and recall gate still met") {
    val ss = spark
    import ss.implicits._
    // clustered data: 20 tight clusters of 25 points in 16d — the case
    // truncation-prune handles worst (all nearest neighbors co-cluster)
    val rng = new Random(7)
    val centers = IndexedSeq.fill(20)(Array.fill(16)(rng.nextFloat() * 10f))
    val points = (0 until 500).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => x + rng.nextFloat() * 0.5f).toSeq)
    }
    val df = points.toDF("id", "vec")
    val path = tmpDir("idx-alpha")
    val idx = VectorIndex.build(spark, path, df, dim = 16, maxDegree = 12, alpha = 1.2)
    assert(idx.adjacency.filter(size(col("nbrs")) > 12).count() == 0)
    assert(idx.adjacency.filter(array_contains(col("nbrs"), col("id"))).count() == 0)
    val serving = idx.toServing
    val all = points.map { case (id, v) => (id + 1L, v.toArray) }
    val queries = rng.shuffle(all).take(20)
    val recalls = queries.map { case (_, q) =>
      val truth = all.sortBy { case (pid, v) => (Metric.Euclidean.dist(q, v), pid) }
        .take(10).map(_._1).toSet
      val got = serving.search(q, topk = 10).map(_._2).toSet
      truth.intersect(got).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    info(f"alpha=1.2 build recall@10 on clustered data = $avg%.3f")
    assert(avg >= 0.70)
  }

  test("resolveAlpha: scale-tier routing boundary is pinned at exactThreshold") {
    val auto = VectorIndex.AlphaAuto
    // at or below the tier boundary: reference-faithful truncation
    assert(VectorIndex.resolveAlpha(auto, n = 20000L, exactThreshold = 20000L) == 0.0)
    assert(VectorIndex.resolveAlpha(auto, n = 1L, exactThreshold = 20000L) == 0.0)
    // one row above: the DiskANN diversified prune (measured 1.00/1.00
    // at 20k×64d where truncation reads 0.50/0.00 — BENCH_SCALE sf1_ann)
    assert(VectorIndex.resolveAlpha(auto, n = 20001L, exactThreshold = 20000L)
      == VectorIndex.DefaultScaleAlpha)
    // explicit values bypass routing at ANY scale (reference semantics
    // on demand, diversification on demand)
    assert(VectorIndex.resolveAlpha(0.0, n = 5000000L, exactThreshold = 20000L) == 0.0)
    assert(VectorIndex.resolveAlpha(1.5, n = 10L, exactThreshold = 20000L) == 1.5)
  }

  test("auto-routed build above the tier equals the explicit alpha build") {
    val ss = spark
    import ss.implicits._
    val rng = new Random(11)
    val centers = IndexedSeq.fill(8)(Array.fill(8)(rng.nextFloat() * 10f))
    val points = (0 until 120).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + rng.nextFloat() * 0.4f).toSeq)
    }
    val df = points.toDF("id", "vec")
    // exactThreshold below n forces the scale tier: AUTO must resolve
    // to the α-prune and produce the identical graph to explicit 1.2
    // (every stage — seeded LSH fit, NN-descent, bounded-heap top-k,
    // pruneOne — is deterministic given the input)
    val autoIdx = VectorIndex.build(spark, tmpDir("idx-auto-route"), df,
      dim = 8, maxDegree = 10, exactThreshold = 60L)
    val explIdx = VectorIndex.build(spark, tmpDir("idx-expl-alpha"), df,
      dim = 8, maxDegree = 10, exactThreshold = 60L, alpha = 1.2)
    val a = autoIdx.adjacency.orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    val e = explIdx.adjacency.orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(a.toSeq == e.toSeq)
    // and BELOW the tier the auto build keeps reference truncation:
    // identical to an explicit alpha=0.0 build
    val autoSmall = VectorIndex.build(spark, tmpDir("idx-auto-small"), df,
      dim = 8, maxDegree = 10)
    val truncSmall = VectorIndex.build(spark, tmpDir("idx-trunc-small"), df,
      dim = 8, maxDegree = 10, alpha = 0.0)
    val as = autoSmall.adjacency.orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    val ts = truncSmall.adjacency.orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(as.toSeq == ts.toSeq)
  }

  test("ServingIndex with alpha: online inserts produce diverse, bounded adjacency") {
    val rng = new Random(3)
    val idx = new ServingIndex(dim = 8, maxDegree = 8, alpha = 1.2)
    val all = (0 until 300).map { i => ((i + 1).toLong, Array.fill(8)(rng.nextFloat())) }
    all.foreach { case (_, v) => idx.insert(v) }
    val recalls = rng.shuffle(all.toList).take(15).map { case (_, q) =>
      val truth = all.sortBy { case (id, v) => (Metric.Euclidean.dist(q, v), id) }
        .take(5).map(_._1).toSet
      val got = idx.search(q, topk = 5).map(_._2).toSet
      truth.intersect(got).size / 5.0
    }
    val avg = recalls.sum / recalls.size
    info(f"online alpha recall@5 = $avg%.3f")
    assert(avg >= 0.70)
  }
}
