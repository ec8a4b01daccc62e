package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dataset.unpersist is a silent no-op for localCheckpoint'ed frames —
  * Blocks.release must actually free the checkpoint RDD's blocks. */
class BlocksSpec extends SparkSpec {

  test("release frees localCheckpoint blocks that unpersist leaves pinned") {
    val ss = spark
    import ss.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val df = (1 to 1000).toDF("x").select(col("x") * 2).localCheckpoint(true)
    assert(df.count() == 1000)
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1)
    df.unpersist(blocking = true) // documented trap: does nothing
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1)
    Blocks.release(df)
    assert(spark.sparkContext.getPersistentRDDs.size == before)
  }
}
