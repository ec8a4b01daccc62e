package graft.plans

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dataset.unpersist is a silent no-op for localCheckpoint'ed frames —
  * Blocks.release must actually free the checkpoint RDD's blocks.
  * Tracks the specific checkpoint RDD id (suites share one session, so
  * global persistent-RDD counts race with concurrent specs). */
class BlocksSpec extends SparkSpec {

  test("release frees localCheckpoint blocks that unpersist leaves pinned") {
    val ss = spark
    import ss.implicits._
    val df = (1 to 1000).toDF("x").select(col("x") * 2).localCheckpoint(true)
    assert(df.count() == 1000)
    val rddId = df.queryExecution.analyzed.collectFirst {
      case lr: LogicalRDD => lr.rdd.id
    }.getOrElse(fail("checkpointed frame did not plan as LogicalRDD"))
    def pinned: Boolean = spark.sparkContext.getPersistentRDDs.contains(rddId)
    assert(pinned)
    df.unpersist(blocking = true) // documented trap: does nothing
    assert(pinned)
    Blocks.release(df)
    assert(!pinned)
  }
}
