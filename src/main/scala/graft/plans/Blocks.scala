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

  /** Release the checkpoint blocks behind `df` (no-op for plain
    * cached/uncheckpointed frames — those go through `unpersist`). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
