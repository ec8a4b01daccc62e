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

  /** Median QPS over `repeat` timed loops, after an untimed warmup.
    * A GC settle runs first: the fromIndex workload in particular
    * starts right after a 32-task distributed build whose garbage is
    * still live-ish in the heap, and collector pauses landing inside
    * the timed loops showed up as a 4x spread across otherwise
    * identical solo runs (126-560 qps, round 9). One explicit
    * collection before the warmup makes every loop start from a
    * comparable heap state. */
  def qps(w: Workload, repeat: Int): Double = median(qpsLoops(w, repeat))

  /** The individual per-loop QPS numbers behind [[qps]] (same GC
    * settle, warmup, and loop protocol — [[qps]] is their median).
    * Exposed so the solo trend artifact (BenchQps -> BENCH_QPS.json)
    * can record the first-timed-loop ("cold") vs rest ("warm") split
    * without a second divergent timing path. */
  def qpsLoops(w: Workload, repeat: Int): Seq[Double] = {
    System.gc()
    w.queries.take(WarmupQueries).foreach(w.search) // JIT warmup, untimed
    (0 until repeat).map { _ =>
      val t0 = System.nanoTime()
      w.queries.foreach(w.search)
      w.queries.length.toDouble / ((System.nanoTime() - t0) / 1e9)
    }
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

  /** The SAME insert-built 4-shard fleet served through the
    * [[graft.index.ShardRpc]] loopback scatter (summary key
    * `rpc_qps`): every per-shard search is a genuine socket
    * round-trip through the length-framed protocol — identical graph,
    * identical merge (spec-pinned tuple identity), so rpc_qps vs
    * shard_qps IS the measured RPC fan-out tax of the multi-node
    * serving deployment. The server thread and its four client
    * connections are daemon-scoped to the JVM (bench processes exit
    * after timing; a long-lived host would own a Server of its own). */
  def rpcRouter(): Workload = {
    val (vecs, queries) = vectorsAndQueries()
    val router = new graft.index.ShardedServing(dim = Dim, numShards = NumShards)
    vecs.foreach(v => router.insert(v))
    val shards = router.shardRefs
    val server = new graft.index.ShardRpc.Server(Dim, NumShards,
      (0 until NumShards).map(i => i -> shards(i)).toMap)
    server.serveInBackground()
    val parts = (0 until NumShards).map(i =>
      new graft.index.ShardRpc.Client("127.0.0.1", server.boundPort, i))
    val rpc = new graft.index.ShardRpc.Router(NumShards, parts)
    Workload(q => rpc.search(q, topk = 10), queries)
  }

  /** Production serving path (summary keys `fi_load_sec` / `fi_qps`):
    * distributed build -> fromIndex bulk load into the 4-shard fleet
    * (never an insert loop), then the same query workload. Returns
    * (median load seconds over `repeat` independent loads, workload).
    * The only workload that needs a SparkSession — the distributed
    * build is the point. maxDegree matches the insert-built router
    * (64) so the two QPS numbers compare the LOAD PATH, not graph
    * degree — sparser graphs search slower (more hops to converge),
    * which a 32-degree build here once misread as a fromIndex
    * regression. Load is a median like every per-query number: a
    * one-shot load time on this host misreads scheduler noise as a
    * regression (loads are independent; no state carries over). */
  def fromIndexRouter(spark: org.apache.spark.sql.SparkSession,
      repeat: Int): (FromIndexLoad, Workload) = {
    val rng = new scala.util.Random(1)
    val vecs = Array.fill(NumVectors)(Array.fill(Dim)(rng.nextFloat()))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(i.toLong, v.toSeq)
      }, 32),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("vec",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    val tmp = java.nio.file.Files.createTempDirectory("bench-fromidx").toString
    val idx = graft.index.VectorIndex.build(spark, tmp, src, dim = Dim, maxDegree = MaxDegree)
    var router: graft.index.ShardedServing = null
    // COLD/WARM split (r13: a single median hid a 2.5x load jump
    // behind the pre-QPS cache drop): the FIRST load pays every
    // first-in-JVM cost alive at that point (plan compilation, parquet
    // footer/codec setup, whatever caches a preceding drop emptied);
    // the steady-state re-load is the comparable cross-round number.
    // At least 2 loads so warm always exists; `load` stays the median
    // of all (the pre-split methodology, kept for continuity).
    val times = (0 until math.max(2, repeat)).map { _ =>
      // same GC settle as qps(): each load orphans the previous
      // router (4 shards x 10k vectors) plus the collected row batch,
      // and collector pauses landing inside a later timed load read
      // as "warm slower than cold" (r15 solo run: cold 10.9 s, warm
      // median 27.9 s — pure heap pressure, not the load path)
      System.gc()
      val t0 = System.nanoTime()
      router = graft.index.ShardedServing.fromIndex(idx, numShards = NumShards)
      (System.nanoTime() - t0) / 1e9
    }
    // at repeat=1 the pre-split methodology timed exactly ONE load;
    // reporting the median of the forced two (= mean of cold+warm)
    // would silently change what the number means at that setting
    // (r14 advisor) — `times.head` IS the single-load number
    val load = if (repeat < 2) times.head else median(times)
    val loadCold = times.head
    val loadWarm = median(times.tail)
    // query draw AFTER the vector draws, matching the original loop's
    // RNG stream position (and vectorsAndQueries' protocol)
    val queries = Array.fill(NumQueries)(vecs(rng.nextInt(vecs.length)))
    (FromIndexLoad(load, loadCold, loadWarm),
      Workload(q => router.search(q, topk = 10), queries))
  }

  /** Load-time triple from [[fromIndexRouter]]: `medianSec` = median
    * of all loads (pre-r14 methodology, cross-round comparable),
    * `coldSec` = first load, `warmSec` = median of the rest. */
  final case class FromIndexLoad(medianSec: Double, coldSec: Double, warmSec: Double)
}
