package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage-block hygiene for localCheckpoint'ed Datasets.
  *
  * `Dataset.unpersist` only clears CacheManager entries; a
  * `localCheckpoint` persists its RDD directly (the Dataset becomes a
  * scan over a `LogicalRDD`), which the CacheManager never sees — so
  * `unpersist()` on a checkpointed Dataset is a silent no-op and the
  * blocks stay pinned until a GC-driven ContextCleaner pass. Iterative
  * operators (beam search, label propagation) that checkpoint per
  * round MUST release through the RDD itself or a long-lived session
  * accumulates every round's blocks. */
object Blocks {

  /** RDD ids of SHARED checkpointed artifacts (per-JVM caches like
    * DocQueries' group labels) that [[release]] must never unpersist:
    * a released localCheckpoint cannot recompute (truncated lineage),
    * so one consumer releasing a shared artifact would poison every
    * later consumer with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — the
    * round-13 bench hit exactly this through a query that embedded
    * the cached label frame in its returned plan. Pinning makes the
    * protection structural instead of a per-consumer re-checkpoint
    * discipline. */
  private val pinned = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Mark every LogicalRDD in `df`'s plan as a shared artifact that
    * [[release]] skips. Call on a frame at the moment it enters a
    * cross-query cache; returns `df` for chaining. */
  def pin(df: DataFrame): DataFrame = {
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => pinned.add(lr.rdd.id)
      case _ => ()
    }
    df
  }

  /** Release the checkpoint blocks behind `df` (no-op for plain
    * cached/uncheckpointed frames — those go through `unpersist` —
    * and for [[pin]]ned shared artifacts). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD if !pinned.contains(lr.rdd.id) =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Tear down a PINNED shared artifact at end-of-life (cache-drop
    * paths only — a consumer must never call this): unpins and frees
    * its blocks. The owning cache must also drop its reference, or
    * the next cache hit serves an unrecomputable frame. */
  def releasePinned(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD =>
        pinned.remove(lr.rdd.id)
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
