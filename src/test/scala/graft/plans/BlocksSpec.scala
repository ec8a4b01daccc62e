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

  test("pinned shared artifacts survive a consumer's release (the q134 poison scenario)") {
    val ss = spark
    import ss.implicits._
    // a shared cached artifact, as the per-JVM caches hold it
    val artifact = (1 to 500).toDF("doc_id")
      .select(col("doc_id"), (col("doc_id") % 7).as("group_id"))
      .localCheckpoint(true)
    Blocks.pin(artifact)
    val artId = artifact.queryExecution.analyzed.collectFirst {
      case lr: LogicalRDD => lr.rdd.id
    }.getOrElse(fail("artifact did not plan as LogicalRDD"))
    // a consumer embeds the artifact in its (uncheckpointed) result
    // plan — releasing the result must NOT free the artifact
    val consumer = artifact.groupBy("group_id").count()
    consumer.count()
    Blocks.release(consumer)
    assert(spark.sparkContext.getPersistentRDDs.contains(artId),
      "release of a consumer plan freed the pinned shared artifact")
    // the artifact still computes (lineage is truncated — blocks gone
    // would throw CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND here)
    assert(artifact.count() == 500)
    // and an UNpinned checkpoint in the same plan shape still frees
    val plain = (1 to 100).toDF("x").localCheckpoint(true)
    val plainId = plain.queryExecution.analyzed.collectFirst {
      case lr: LogicalRDD => lr.rdd.id
    }.get
    Blocks.release(plain.select(col("x") + 1))
    assert(!spark.sparkContext.getPersistentRDDs.contains(plainId))
  }
}
