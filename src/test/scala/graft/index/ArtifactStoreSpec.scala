package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves the ArtifactStore seam actually carries the index's
  * driver-side artifact I/O: a counting wrapper installed as the
  * current store sees the meta pointer swap, sidecar save/load, and
  * `_SUCCESS` probes of a full build → fit → fresh-load cycle, with
  * byte-identical behavior to the direct POSIX path. */
class ArtifactStoreSpec extends SparkSpec {

  /** Delegates to PosixStore, counting calls per operation. */
  private final class CountingStore extends ArtifactStore {
    val calls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    private def tick(op: String): Unit = calls.merge(op, 1, (a, b) => a + b)
    def exists(p: String): Boolean = { tick("exists"); PosixStore.exists(p) }
    def isDirectory(p: String): Boolean = { tick("isDirectory"); PosixStore.isDirectory(p) }
    def readBytes(p: String): Array[Byte] = { tick("readBytes"); PosixStore.readBytes(p) }
    def writeAtomic(p: String, b: Array[Byte]): Unit = { tick("writeAtomic"); PosixStore.writeAtomic(p, b) }
    def createDirs(p: String): Unit = { tick("createDirs"); PosixStore.createDirs(p) }
    def list(p: String): Seq[String] = { tick("list"); PosixStore.list(p) }
    def deleteTree(p: String): Unit = { tick("deleteTree"); PosixStore.deleteTree(p) }
  }

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("build → fit → fresh load → vacuum all flow through the installed store") {
    val store = new CountingStore
    val prev = ArtifactStore.current
    ArtifactStore.current = store
    try {
      val path = tmpDir("store-seam")
      val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
      val model = idx.fitIVF(16)
      idx.ivfAssignments(model).count()
      val pq = idx.fitPQ(8)
      idx.pqCodes(pq).count()
      // fresh handle: sidecars load through the seam, no re-fit
      val re = VectorIndex.load(spark, path)
      assert(re.loadIVF(16).exists(_.fingerprint == model.fingerprint))
      assert(re.loadPQ(8).isDefined)
      assert(re.vacuum() == 0) // nothing stale
      // the seam saw every artifact operation class
      assert(store.calls.getOrDefault("writeAtomic", 0) >= 3,
        s"meta + 2 sidecars must publish atomically, saw ${store.calls}")
      assert(store.calls.getOrDefault("readBytes", 0) >= 3)
      assert(store.calls.getOrDefault("exists", 0) >= 4)
      assert(store.calls.getOrDefault("list", 0) >= 1)
    } finally ArtifactStore.current = prev
  }

  test("PosixStore.writeAtomic leaves no temp file and replaces existing content") {
    val dir = tmpDir("store-posix")
    val f = s"$dir/x.json"
    PosixStore.writeAtomic(f, "one".getBytes)
    PosixStore.writeAtomic(f, "two".getBytes)
    assert(new String(PosixStore.readBytes(f)) == "two")
    assert(PosixStore.list(dir) == Seq("x.json"))
  }

  test("createExclusive: exactly one of N racing writers wins; content is the winner's, no temp litter") {
    val dir = tmpDir("store-excl")
    val f = s"$dir/claim.json"
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val latch = new java.util.concurrent.CountDownLatch(1)
      val tasks = (0 until 16).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            latch.await()
            if (PosixStore.createExclusive(f, s"writer-$i".getBytes)) wins.incrementAndGet()
          }
        })
      }
      latch.countDown()
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(wins.get() == 1, s"expected exactly one winner, got ${wins.get()}")
    val content = new String(PosixStore.readBytes(f))
    assert(content.startsWith("writer-"))
    assert(PosixStore.list(dir) == Seq("claim.json"), "losers' temp files must be cleaned")
    // a later claim on the published object loses without touching it
    assert(!PosixStore.createExclusive(f, "late".getBytes))
    assert(new String(PosixStore.readBytes(f)) == content)
  }

  /** OBJECT-STORE semantics (r14 verdict item 5): no rename primitive
    * exists — `writeAtomic` is a single PUT, all-or-nothing per
    * object (S3/GCS semantics), with an injectable request-failure
    * window: the next PUT whose path contains `failOn` throws and
    * publishes NOTHING. `nonAtomicFailure` instead models the BROKEN
    * bridge the ArtifactStore contract forbids — a copy+delete
    * publish dying mid-copy, leaving partial bytes at the
    * destination — so the spec can pin what the contract's
    * all-or-nothing clause is protecting. `freezeListings` injects
    * LIST-after-write staleness (eventually-consistent listings):
    * frozen paths serve their freeze-time child set — new children
    * invisible, deleted ones lingering — while per-object reads stay
    * strong, so vacuum/GC behavior is provable under the non-POSIX
    * listing semantics too. Driver-side artifacts live
    * in the in-memory object map; table data Spark writes through its
    * own Hadoop stack is visible via POSIX fallback (the two views of
    * one bucket a real deployment has: SDK for sidecars, cluster FS
    * connector for parquet). */
  private final class FakeObjectStore extends ArtifactStore {
    import scala.jdk.CollectionConverters._
    val objects = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    @volatile var failOn: String = null
    @volatile var nonAtomicFailure: Boolean = false
    // LIST-after-write staleness (eventually-consistent listings, the
    // classic S3 caveat): while frozen, list() serves the snapshot
    // captured at freeze time for the frozen paths — new children are
    // invisible, deleted children linger — while reads/writes stay
    // strongly consistent (per-object PUT/GET semantics)
    @volatile private var frozenListings: Map[String, Seq[String]] = null
    def freezeListings(paths: Seq[String]): Unit =
      frozenListings = paths.map(p => norm(p) -> listFresh(norm(p))).toMap
    def thawListings(): Unit = frozenListings = null
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    private def norm(p: String) = p.stripSuffix("/")
    private def tick(): Unit = calls.incrementAndGet()
    def exists(p: String): Boolean = { tick()
      objects.containsKey(norm(p)) || hasPrefix(norm(p)) || PosixStore.exists(p) }
    def isDirectory(p: String): Boolean = { tick()
      hasPrefix(norm(p)) || PosixStore.isDirectory(p) }
    private def hasPrefix(n: String): Boolean = {
      val pre = n + "/"
      objects.keys.asIterator().asScala.exists(_.startsWith(pre))
    }
    def readBytes(p: String): Array[Byte] = { tick()
      val hit = objects.get(norm(p))
      if (hit != null) hit else PosixStore.readBytes(p) }
    def writeAtomic(p: String, bytes: Array[Byte]): Unit = { tick()
      val n = norm(p)
      if (failOn != null && n.contains(failOn)) {
        failOn = null // one-shot window
        if (nonAtomicFailure) // died mid-copy: partial bytes published
          objects.put(n, java.util.Arrays.copyOf(bytes, bytes.length / 2))
        throw new java.io.IOException(s"injected PUT failure at $p")
      }
      objects.put(n, bytes) }
    def createDirs(p: String): Unit = tick() // object stores: no dirs
    private def listFresh(n: String): Seq[String] = {
      val pre = n + "/"
      val mem = objects.keys.asIterator().asScala.collect {
        case k if k.startsWith(pre) => k.stripPrefix(pre).split("/")(0)
      }.toSeq
      (mem ++ PosixStore.list(n)).distinct
    }
    def list(p: String): Seq[String] = { tick()
      val fl = frozenListings
      if (fl != null && fl.contains(norm(p))) fl(norm(p))
      else listFresh(norm(p)) }
    def deleteTree(p: String): Unit = { tick()
      val pre = norm(p) + "/"
      objects.keySet.removeIf(k => k == norm(p) || k.startsWith(pre))
      PosixStore.deleteTree(p) }
    // conditional PUT (If-None-Match: *) — atomic create-if-absent,
    // the real object-store primitive the trait's contract names
    override def createExclusive(p: String, bytes: Array[Byte]): Boolean = { tick()
      val n = norm(p)
      if (PosixStore.exists(n)) false
      else objects.putIfAbsent(n, bytes) == null }
  }
  private def fiveNew =
    embeddings.filter(col("id").between(40, 44))
      .select(concat(lit("n_"), col("id")).as("key"), col("vec"))
  private def probeQuery =
    embeddings.filter(col("id") === 3)
      .select(lit(3L).as("query_id"), col("vec").as("qvec"))

  test("object store: failed meta pointer swap keeps the index loadable at the previous version") {
    val store = new FakeObjectStore
    val prev = ArtifactStore.current
    ArtifactStore.current = store
    try {
      val path = tmpDir("store-objswap")
      val idx = VectorIndex.build(spark, path,
        embeddings.filter(col("id") < 40), dim = 64, maxDegree = 8)
      // inject: the NEXT meta.json PUT fails (the pointer swap — the
      // LAST write of the commit protocol; "/meta.json" does not match
      // the meta-v=N.json history sidecars, which land first)
      store.failOn = "/meta.json"
      intercept[java.io.IOException] { idx.insertBatch(fiveNew) }
      // load-time consistency: the pointer still names version 0 and
      // every segment it references is intact — the failed commit is
      // invisible (its segment data may exist, unreferenced)
      val re = VectorIndex.load(spark, path)
      assert(re.meta.version == 0L)
      assert(re.vectors.count() == 40L)
      assert(re.searchExact(probeQuery, topk = 3).count() == 3L)
    } finally ArtifactStore.current = prev
  }

  test("object store: failed history PUT aborts the commit before the pointer moves") {
    val store = new FakeObjectStore
    val prev = ArtifactStore.current
    ArtifactStore.current = store
    try {
      val path = tmpDir("store-objhist")
      val idx = VectorIndex.build(spark, path,
        embeddings.filter(col("id") < 40), dim = 64, maxDegree = 8)
      store.failOn = "meta-v=1.json" // the immutable history copy, written FIRST
      intercept[java.io.IOException] { idx.insertBatch(fiveNew) }
      val re = VectorIndex.load(spark, path)
      assert(re.meta.version == 0L && re.vectors.count() == 40L)
      // and with NOTHING of version 1 published, a reloaded handle can
      // retry the mutation cleanly (no stale meta-v=1.json to refuse on)
      val retried = re.insertBatch(fiveNew)
      assert(retried.meta.version == 1L && retried.vectors.count() == 45L)
    } finally ArtifactStore.current = prev
  }

  test("object store: a NON-atomic publish (contract violation) fails load loudly, never silently") {
    val store = new FakeObjectStore
    val prev = ArtifactStore.current
    ArtifactStore.current = store
    try {
      val path = tmpDir("store-objcorrupt")
      val idx = VectorIndex.build(spark, path,
        embeddings.filter(col("id") < 40), dim = 64, maxDegree = 8)
      store.failOn = "/meta.json"
      store.nonAtomicFailure = true // copy+delete bridge dying mid-copy
      intercept[java.io.IOException] { idx.insertBatch(fiveNew) }
      // partial meta.json bytes: load must throw a NAMED parse error
      // (SidecarJson contract) — a silently-wrong index is the one
      // outcome the protocol may never produce; this is exactly why
      // writeAtomic's contract is all-or-nothing and a rename-free
      // store must bridge it to a single PUT, never copy+delete
      val e = intercept[IllegalArgumentException] { VectorIndex.load(spark, path) }
      assert(e.getMessage.contains("meta.json"))
    } finally ArtifactStore.current = prev
  }

  test("object store: time-travel + vacuum cycle is safe under stale (list-after-write) listings") {
    val store = new FakeObjectStore
    val prev = ArtifactStore.current
    ArtifactStore.current = store
    try {
      val path = tmpDir("store-objvac")
      val v0 = VectorIndex.build(spark, path,
        embeddings.filter(col("id") < 40), dim = 64, maxDegree = 8)
      val v1 = v0.insertBatch(fiveNew)
      val v2 = v1.deleteBatch(Seq(1L, 2L))
      // time travel works on the object store: reads are per-object
      // GETs through the pointer chain, no listing involved
      assert(VectorIndex.loadVersion(spark, path, 1L).meta.numPoints == 45)
      // freeze the root listing BEFORE compaction: the segment dir the
      // compact commit writes is INVISIBLE to list() — the classic
      // eventually-consistent-listing window
      store.freezeListings(Seq(path))
      val compacted = v2.compact()
      // vacuum under the stale listing: it reaps only dead segments
      // the listing exposes and can never touch the live segment it
      // cannot even see — stale listings shrink the reap, never
      // misdirect it (the live set comes from a strong meta READ)
      val reapedStale = compacted.vacuum()
      assert(reapedStale > 0)
      val re = VectorIndex.load(spark, path)
      assert(re.meta.numPoints == 43 && re.vectors.count() == 43)
      assert(re.searchExact(probeQuery, topk = 3).count() == 3)
      // DELETE lag, same window: the frozen listing still names the
      // just-reaped dirs — a second pass must tolerate their
      // disappearance (deleteTree contract), not abort
      re.vacuum()
      assert(VectorIndex.load(spark, path).vectors.count() == 43)
      // thaw: a fresh listing shows only the live segment — nothing
      // further to reap, and the full history survives with the
      // reaped versions flagged unloadable (refusing loudly)
      store.thawListings()
      assert(re.vacuum() == 0)
      val h = VectorIndex.history(path)
      assert(h.map(_._1) == Seq(0L, 1L, 2L, 3L))
      assert(h.last._4 && h.exists(!_._4), s"got $h")
      intercept[IllegalArgumentException] {
        VectorIndex.loadVersion(spark, path, h.find(!_._4).get._1)
      }
      assert(VectorIndex.load(spark, path)
        .searchExact(probeQuery, topk = 3).count() == 3)
    } finally ArtifactStore.current = prev
  }

  test("object store: build → fit → serve does O(1) store calls per artifact, never per row") {
    val store = new FakeObjectStore
    val prev = ArtifactStore.current
    ArtifactStore.current = store
    try {
      val path = tmpDir("store-objcount")
      val n = embeddings.count() // 500 fixture rows
      val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
      val ivf = idx.fitIVF(8)
      idx.ivfAssignments(ivf).count()
      val re = VectorIndex.load(spark, path)
      assert(re.loadIVF(8).isDefined)
      val fleet = ShardedServing.fromIndex(re, numShards = 2)
      assert(fleet.search(Array.fill(64)(0.1f), topk = 3).length == 3)
      val total = store.calls.get()
      assert(total < n,
        s"$total store calls for a $n-row build→fit→serve cycle — " +
          "artifact I/O must be per-artifact, not per-row")
      assert(total < 120, s"store-call budget blown: $total (per-artifact O(1) regressed)")
    } finally ArtifactStore.current = prev
  }
}
