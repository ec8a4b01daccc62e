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
