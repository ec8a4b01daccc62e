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
}
