package graft

/** Dev tool: solo re-measure of the three in-memory serving QPS loops
  * from [[Bench]] (single-graph, PQ low-memory, 4-shard router) with
  * NO Spark session and no preceding query workload — the round bench
  * runs these after ~69 queries of GC/block pressure, which rounds 4/5
  * showed can move the numbers 1.3-1.6x. Identical seeds, workload
  * shape (10k x 100d, 1000 queries), warmup, and median protocol.
  * Usage: runMain graft.BenchQps [repeat]
  */
object BenchQps {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val repeat = math.max(1, if (args.nonEmpty) args(0).toInt else 5)
    def qpsLoops(search: Array[Float] => Unit, queries: Array[Array[Float]]): Double = {
      queries.take(200).foreach(search)
      median((0 until repeat).map { _ =>
        val t0 = System.nanoTime()
        queries.foreach(search)
        queries.length.toDouble / ((System.nanoTime() - t0) / 1e9)
      })
    }
    // single-graph serving (Bench "qps")
    locally {
      val rng = new scala.util.Random(1)
      val serving = new graft.index.ServingIndex(dim = 100, maxDegree = 64)
      val vecs = Array.fill(10000)(Array.fill(100)(rng.nextFloat()))
      vecs.foreach(v => serving.insert(v))
      val queries = Array.fill(1000)(vecs(rng.nextInt(vecs.length)))
      println(f"qps      ${qpsLoops(q => serving.search(q, topk = 10), queries)}%8.1f")
    }
    // PQ low-memory traversal (Bench "pq_qps")
    locally {
      val rng = new scala.util.Random(1)
      val serving = new graft.index.ServingIndex(dim = 100, maxDegree = 64)
      val vecs = Array.fill(10000)(Array.fill(100)(rng.nextFloat()))
      vecs.foreach(v => serving.insert(v))
      serving.enableLowMemoryTraversal(
        graft.index.Quantization.pqFitLocal(vecs.take(4096), m = 10))
      val queries = Array.fill(1000)(vecs(rng.nextInt(vecs.length)))
      println(f"pq_qps   ${qpsLoops(q => serving.search(q, topk = 10), queries)}%8.1f")
    }
    // 4-shard scatter-gather router (Bench "shard_qps")
    locally {
      val rng = new scala.util.Random(1)
      val router = new graft.index.ShardedServing(dim = 100, numShards = 4)
      val vecs = Array.fill(10000)(Array.fill(100)(rng.nextFloat()))
      vecs.foreach(v => router.insert(v))
      val queries = Array.fill(1000)(vecs(rng.nextInt(vecs.length)))
      println(f"shard_qps ${qpsLoops(q => router.search(q, topk = 10), queries)}%7.1f")
    }
  }
}
