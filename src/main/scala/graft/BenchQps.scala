package graft

/** Dev tool: solo re-measure of the three in-memory serving QPS loops
  * from [[Bench]] (single-graph, PQ low-memory, 4-shard router) with
  * NO Spark session and no preceding query workload — the round bench
  * runs these after ~69 queries of GC/block pressure, which rounds 4/5
  * showed can move the numbers 1.3-1.6x. The workloads themselves live
  * in [[QpsWorkloads]], shared with Bench, so the two tools time the
  * SAME loops by construction (seeds, 10k x 100d shape, warmup,
  * median protocol).
  * Usage: runMain graft.BenchQps [repeat]
  */
object BenchQps {
  def main(args: Array[String]): Unit = {
    val repeat = math.max(1, if (args.nonEmpty) args(0).toInt else 5)
    println(f"qps       ${QpsWorkloads.qps(QpsWorkloads.singleGraph(), repeat)}%8.1f")
    println(f"pq_qps    ${QpsWorkloads.qps(QpsWorkloads.pqLowMemory(), repeat)}%8.1f")
    println(f"shard_qps ${QpsWorkloads.qps(QpsWorkloads.shardedRouter(), repeat)}%8.1f")
  }
}
