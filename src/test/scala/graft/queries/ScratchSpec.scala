package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-keyed scratch stores: the cache key must move with the
  * fixture's ROWS, not its path — the staleness hazard this closes is
  * an in-place rewrite of a fixture dir silently serving a derived
  * artifact built from the old rows. */
class ScratchSpec extends SparkSpec {

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    val ss = spark
    import ss.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("in-place fixture rewrite invalidates the key; same content keeps it") {
    val dir = tmpDir("scratch-fixture")
    writeDocs(dir, Seq((1L, "alpha"), (2L, "beta")))
    val k1 = Scratch.tableFingerprint(spark, dir, "documents")

    // the per-JVM fingerprint cache would mask the rewrite within one
    // JVM — point a SECOND path at the same physical dir via symlink to
    // simulate a fresh process reading the rewritten fixture
    def relink(n: Int): String = {
      val link = java.nio.file.Paths.get(tmpDir(s"scratch-view$n"), "v")
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(dir))
      link.toString
    }
    writeDocs(dir, Seq((1L, "alpha"), (2L, "CHANGED")))
    val k2 = Scratch.tableFingerprint(spark, relink(1), "documents")
    assert(k2 !== k1, "rewritten rows must change the key")

    // rewrite back to the original rows (different parquet files, same
    // content): the checksum is order-independent and content-only, so
    // the key — and every store it names — is reused
    writeDocs(dir, Seq((2L, "beta"), (1L, "alpha")))
    val k3 = Scratch.tableFingerprint(spark, relink(2), "documents")
    assert(k3 === k1, "same rows (any order, any path) must share the key")
  }

  test("stat-keyed memo: same-path in-place rewrite invalidates WITHIN one JVM; memo persists") {
    val dir = tmpDir("scratch-statkey")
    writeDocs(dir, Seq((1L, "one"), (2L, "two")))
    val k1 = Scratch.tableFingerprint(spark, dir, "documents")
    // the round-11 per-JVM path memo would have served k1 forever on
    // this path; the stat-keyed layer re-derives on any byte change
    writeDocs(dir, Seq((1L, "one"), (2L, "CHANGED")))
    val k2 = Scratch.tableFingerprint(spark, dir, "documents")
    assert(k2 !== k1, "same-path rewrite must invalidate within the JVM")
    // persisted sidecar exists and carries the current fingerprint, so
    // a LATER JVM skips the content scan
    val memo = new java.io.File(s"target/fp-memo/${graft.index.Fingerprint
      .ofString(s"${new java.io.File(dir).getAbsolutePath}#documents")}.json")
    assert(memo.exists(), s"expected persisted memo at $memo")
    val Array(_, fp) = java.nio.file.Files.readString(memo.toPath).trim.split("\\|")
    assert(fp === k2)
  }

  test("writeOnce blocks concurrent callers until the build completes") {
    val key = s"scratch-spec-${System.nanoTime()}"
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    val sawComplete = new java.util.concurrent.atomic.AtomicBoolean(true)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val threads = (0 until 8).map { _ =>
      new Thread(() => {
        Scratch.writeOnce(key) {
          built.incrementAndGet()
          Thread.sleep(100) // a slow build the losers must WAIT for
          done.set(true)
        }
        // by the time ANY caller returns, the build must have finished
        if (!done.get()) sawComplete.set(false)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(built.get() === 1, "build must run exactly once")
    assert(sawComplete.get(), "no caller may return before the build completes")
  }

  test("a throwing build is retried by the next caller") {
    val key = s"scratch-retry-${System.nanoTime()}"
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    intercept[RuntimeException] {
      Scratch.writeOnce(key) { attempts.incrementAndGet(); sys.error("boom") }
    }
    Scratch.writeOnce(key) { attempts.incrementAndGet() }
    assert(attempts.get() === 2, "failed build must not poison the key")
  }

  test("a build that re-enters its own key fails fast, not a deadlock") {
    val key = s"scratch-reenter-${System.nanoTime()}"
    val inner = intercept[IllegalStateException] {
      Scratch.writeOnce(key) { Scratch.writeOnce(key) { () } }
    }
    assert(inner.getMessage.contains(key))
    // the failed outer build must not poison the key (entry removed)
    var ran = false
    Scratch.writeOnce(key) { ran = true }
    assert(ran, "key must be retryable after the re-entrant failure")
  }

  test("a DIFFERENT key inside a build still nests fine") {
    val outer = s"scratch-nest-a-${System.nanoTime()}"
    val innerK = s"scratch-nest-b-${System.nanoTime()}"
    var both = 0
    Scratch.writeOnce(outer) { both += 1; Scratch.writeOnce(innerK) { both += 1 } }
    assert(both === 2)
  }
}
