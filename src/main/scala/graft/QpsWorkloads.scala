package graft

/** The three in-memory serving-QPS workloads, single-sourced so the
  * round bench ([[Bench]]) and the solo re-measure tool ([[BenchQps]])
  * time EXACTLY the same thing — seeds, corpus shape (10k x 100d, the
  * reference's largest documented demo workload, docs/src/index.md),
  * graph degree, query count, untimed JIT warmup, and median protocol.
  * Any future tweak to a loop lands in both tools by construction;
  * divergence here would silently invalidate solo-vs-round
  * comparisons, which is BenchQps's whole purpose. */
object QpsWorkloads {

  val Dim = 100
  val NumVectors = 10000
  val NumQueries = 1000
  val WarmupQueries = 200
  val MaxDegree = 64
  val NumShards = 4

  /** A ready-to-time serving workload: a search closure over a fully
    * built in-memory index plus its query batch. */
  final case class Workload(search: Array[Float] => Unit, queries: Array[Array[Float]])

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) -1.0
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Median QPS over `repeat` timed loops, after an untimed warmup. */
  def qps(w: Workload, repeat: Int): Double = {
    w.queries.take(WarmupQueries).foreach(w.search) // JIT warmup, untimed
    median((0 until repeat).map { _ =>
      val t0 = System.nanoTime()
      w.queries.foreach(w.search)
      w.queries.length.toDouble / ((System.nanoTime() - t0) / 1e9)
    })
  }

  private def vectorsAndQueries(): (Array[Array[Float]], Array[Array[Float]]) = {
    val rng = new scala.util.Random(1)
    val vecs = Array.fill(NumVectors)(Array.fill(Dim)(rng.nextFloat()))
    // query draw happens AFTER every vector draw, matching the original
    // loops' RNG stream position
    val queries = Array.fill(NumQueries)(vecs(rng.nextInt(vecs.length)))
    (vecs, queries)
  }

  /** Single-graph serving (summary key `qps`). */
  def singleGraph(): Workload = {
    val (vecs, queries) = vectorsAndQueries()
    val serving = new graft.index.ServingIndex(dim = Dim, maxDegree = MaxDegree)
    vecs.foreach(v => serving.insert(v))
    Workload(q => serving.search(q, topk = 10), queries)
  }

  /** PQ low-memory traversal (summary key `pq_qps`): ADC over m=10-byte
    * codes with exact re-rank on the ef pool. */
  def pqLowMemory(): Workload = {
    val (vecs, queries) = vectorsAndQueries()
    val serving = new graft.index.ServingIndex(dim = Dim, maxDegree = MaxDegree)
    vecs.foreach(v => serving.insert(v))
    serving.enableLowMemoryTraversal(
      graft.index.Quantization.pqFitLocal(vecs.take(4096), m = 10))
    Workload(q => serving.search(q, topk = 10), queries)
  }

  /** Insert-built 4-shard scatter-gather router (summary key `shard_qps`). */
  def shardedRouter(): Workload = {
    val (vecs, queries) = vectorsAndQueries()
    val router = new graft.index.ShardedServing(dim = Dim, numShards = NumShards)
    vecs.foreach(v => router.insert(v))
    Workload(q => router.search(q, topk = 10), queries)
  }
}
