package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CONTENT-keyed scratch stores under `target/` — the cache keying
  * discipline for every fixture-derived artifact the query inventory
  * builds once and serves many times (BM25 inverted index, MinHash
  * signature store, oracle dump dirs).
  *
  * Two fixes over the path-md5 keys these replace:
  *
  *   1. **Keys move with CONTENT, not location.** The key is an
  *      order-independent checksum of the source table's rows (the
  *      [[graft.sources.CorpusRelease]] manifest idiom: sum of per-row
  *      60-bit md5-prefix hashes — add-order free, so any partitioning
  *      of the scan derives the same value), FNV-folded with the row
  *      count. An in-place rewrite of a fixture dir therefore
  *      invalidates every derived scratch store (a path-md5 key would
  *      keep serving the stale artifact), and the same content read
  *      from a different path shares one store instead of building a
  *      duplicate.
  *   2. **Write-once is BLOCKING.** The previous idiom (a per-JVM
  *      `Set.add` race + bare `exists()` check) let a second
  *      concurrent caller that lost the `add` race proceed straight to
  *      read while the winner was still writing the parquet drops — a
  *      flaky read under parallel test/bench execution. [[writeOnce]]
  *      runs the build inside `ConcurrentHashMap.computeIfAbsent`, so
  *      concurrent same-JVM callers WAIT for the writer to finish; the
  *      caller's own existence probe (on a `_SUCCESS`-like marker)
  *      still makes re-use across JVMs work, and a build that THROWS
  *      leaves no map entry, so the next caller retries instead of
  *      trusting a half-written store.
  *
  * Cost: one map-only scan + a 1-row agg per (dir, table) per JVM —
  * cached, and orders of magnitude cheaper than the store builds it
  * keys. At 100 TB the same role is played by the catalog's snapshot /
  * transaction id; for immutable fixture files the content checksum IS
  * that identity.
  */
object Scratch {

  private val fpCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Cheap file-stat signature of one fixture table: max mtime + total
    * bytes over the parquet dir's files. NOT an identity — the key that
    * decides whether the content scan can be skipped. Caveat: a
    * same-second, same-size in-place rewrite is invisible to it
    * (filesystem mtime granularity); fixtures are immutable by
    * convention (TESTDATA.md), so this is a non-risk there, and any
    * real rewrite changes bytes. */
  private def statSig(absDir: String, table: String): String = {
    val f = new java.io.File(s"$absDir/$table.parquet")
    val all = Option(f.listFiles()).getOrElse(Array.empty[java.io.File]) :+ f
    s"${all.map(_.lastModified()).max}#${all.map(_.length()).sum}"
  }

  /** 16-hex-char content fingerprint of one fixture table: FNV-1a over
    * `n_rows|checksum`, where checksum is the order-independent
    * DECIMAL(38,0) sum of each row's 60-bit md5-prefix hash over its
    * JSON rendering (exact and overflow-free to ~10^20 rows).
    *
    * Cache discipline (two layers, both keyed by the FILE-STAT
    * signature so an in-place rewrite invalidates even within one
    * JVM): the in-memory memo serves repeats inside a session; the
    * persisted `target/fp-memo/<key>.json` sidecar (`sig|fp`,
    * atomic-rename write) lets LATER JVMs — bench rounds, Verify runs
    * — skip the content scan entirely while the fixture's stat
    * signature is unchanged. The fingerprint itself stays pure
    * content (path-free, order-free); only the SKIP decision uses
    * stats. At 100 TB the same role is played by the catalog's
    * snapshot/transaction id. */
  def tableFingerprint(spark: SparkSession, sfDir: String, table: String): String = {
    val abs = new java.io.File(sfDir).getAbsolutePath
    val sig = statSig(abs, table)
    val key = s"$abs#$table#$sig"
    val hit = fpCache.get(key)
    if (hit != null) hit
    else {
      val memoPath = java.nio.file.Paths.get("target/fp-memo",
        graft.index.Fingerprint.ofString(s"$abs#$table") + ".json")
      val memoFp =
        try {
          val Array(s0, fp0) = java.nio.file.Files.readString(memoPath).trim.split("\\|")
          if (s0 == sig) Some(fp0) else None
        } catch { case _: Throwable => None }
      val fp = memoFp.getOrElse {
        val df = Tables.t(spark, sfDir, table)
        val rowH =
          conv(substring(md5(to_json(struct(df.columns.map(col).toSeq: _*))), 1, 15), 16, 10)
            .cast("decimal(38,0)")
        val st = df.agg(count(lit(1)).as("n"),
          coalesce(sum(rowH), lit(0).cast("decimal(38,0)")).as("cs")).head()
        val computed = graft.index.Fingerprint.ofString(
          s"$table|${st.getLong(0)}|${st.getDecimal(1).toBigInteger.toString}")
        try {
          java.nio.file.Files.createDirectories(memoPath.getParent)
          val tmp = java.nio.file.Files.createTempFile(memoPath.getParent, "fp-", ".tmp")
          java.nio.file.Files.writeString(tmp, s"$sig|$computed")
          java.nio.file.Files.move(tmp, memoPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } catch { case _: Throwable => () } // memo is an optimization only
        computed
      }
      fpCache.put(key, fp)
      fp
    }
  }

  /** Absolute scratch dir `target/<store>/<content-fp>` for an
    * artifact derived from `table` at `sfDir`. */
  def dir(spark: SparkSession, sfDir: String, store: String, table: String): String =
    new java.io.File(
      s"target/$store/${tableFingerprint(spark, sfDir, table)}").getAbsolutePath

  private val once = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[Unit]]()
  // The thread currently RUNNING each key's build — lets a build that
  // re-enters its own key fail fast (IllegalStateException) instead of
  // joining its own incomplete future, i.e. hanging forever.
  private val onceOwner =
    new java.util.concurrent.ConcurrentHashMap[String, Thread]()

  /** Run `build` at most once per JVM per `key`, BLOCKING concurrent
    * callers until it completes. `build` should itself probe the
    * store's persisted completeness marker and no-op when a previous
    * JVM already built it. A throwing build leaves no entry — the next
    * caller retries (waiters blocked on the failed attempt retry too).
    *
    * The winner runs `build` OUTSIDE any map lock (a per-key
    * CompletableFuture latch, not `computeIfAbsent`): a build that
    * transitively calls writeOnce again — or an unrelated key that
    * hash-collides into the same bin — must neither deadlock nor throw
    * `IllegalStateException("Recursive update")`, which arbitrary
    * long-running Spark builds inside a CHM mapping function can. A
    * build that RE-ENTERS its own key is a contract violation; it
    * fails fast with `IllegalStateException` (the owner thread is
    * recorded per in-flight key) rather than joining its own
    * incomplete future and hanging. */
  def writeOnce(key: String)(build: => Unit): Unit = {
    var done = false
    while (!done) {
      val mine = new java.util.concurrent.CompletableFuture[Unit]()
      val existing = once.putIfAbsent(key, mine)
      if (existing == null) {
        onceOwner.put(key, Thread.currentThread())
        try { build; mine.complete(()) }
        catch {
          case t: Throwable =>
            once.remove(key, mine)
            mine.completeExceptionally(t)
            throw t
        } finally onceOwner.remove(key)
        done = true
      } else {
        if (!existing.isDone && (onceOwner.get(key) eq Thread.currentThread()))
          throw new IllegalStateException(
            s"writeOnce build re-entered its own key '$key' — the once " +
              "latch would self-deadlock; split the inner build onto its own key")
        try { existing.join(); done = true }
        catch {
          // the winner failed: its entry is already removed — loop and
          // either become the new winner or wait on it
          case _: java.util.concurrent.CompletionException => ()
        }
      }
    }
  }
}
