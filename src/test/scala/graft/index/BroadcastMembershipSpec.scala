package graft.index

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Mutation plans must not inline giant literal id lists: past
  * VectorIndex.InListMaxIds, batch membership becomes a broadcast
  * semi/anti join (a 10^6-literal In list means multi-MB plan
  * serialization and analyzer cost before InSet kicks in). Small sets
  * stay literal In/InSet — cheap and pushdown-friendly. */
class BroadcastMembershipSpec extends SparkSpec {

  private val dim = 8

  private def randomDf(n: Int, seed: Int, idBase: Long = 0L) = {
    val rng = new Random(seed)
    val rows = (0 until n).map { i =>
      Row(idBase + i, s"k${idBase + i}", Array.fill(dim)(rng.nextFloat()).toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("key", StringType, nullable = true),
        StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false))))
  }

  test("filterByIds: small sets compile to In/InSet, large sets to a broadcast join") {
    val path = tmpDir("bm-plan")
    val idx = VectorIndex.build(spark, path, randomDf(200, 1), dim = dim, maxDegree = 8)
    val small = idx.filterByIds(idx.vectors, "id", (0L until 50L), keep = true)
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(!smallPlan.contains("BroadcastHashJoin"),
      s"small id set must stay a literal predicate:\n$smallPlan")
    assert(smallPlan.toLowerCase.contains(" in ") || smallPlan.contains("INSET"),
      s"small id set must compile to In/InSet:\n$smallPlan")
    assert(small.count() == 50)

    val bigIds = (0L until (VectorIndex.InListMaxIds + 1).toLong)
    val big = idx.filterByIds(idx.vectors, "id", bigIds, keep = true)
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(bigPlan.contains("BroadcastHashJoin"),
      s"large id set must become a broadcast join:\n$bigPlan")
    assert(!bigPlan.contains("INSET") && !bigPlan.toLowerCase.contains("id#0l in ("),
      s"large id set must not inline literals:\n$bigPlan")
    assert(big.count() == 200)
    // anti variant
    val none = idx.filterByIds(idx.vectors, "id", bigIds, keep = false)
    assert(none.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(none.count() == 0)
  }

  test("insertBatch + deleteBatch beyond InListMaxIds stay correct (join-phrased membership)") {
    val path = tmpDir("bm-big")
    // low exactThreshold forces the LSH wiring tier (the scale path)
    val idx0 = VectorIndex.build(spark, path, randomDf(600, 2), dim = dim,
      maxDegree = 8, exactThreshold = 1000L)
    val nBatch = VectorIndex.InListMaxIds + 2000 // 12k > threshold
    val batch = randomDf(nBatch, 3, idBase = 10000L)
      .select(col("key"), col("vec"))
    val idx1 = idx0.insertBatch(batch)
    assert(idx1.meta.numPoints == 600 + nBatch)
    assert(idx1.vectors.count() == 600 + nBatch)

    // delete MOST of the batch: victims >> threshold exercises the
    // posexplode repair + semi-join ring-touch paths
    val victims = (601L to (600L + (nBatch - 1000)))
    val idx2 = idx1.deleteBatch(victims)
    assert(idx2.meta.numPoints == 600 + 1000)
    assert(idx2.vectors.count() == 600 + 1000)

    // no surviving graph row may reference a deleted internal id, and
    // rows whose whole neighbor list was deleted must be EMPTY (a
    // dropped row would let the stale neighbor list latest-win)
    val victimSet = victims.map(_ - 1L).toSet
    val badRefs = idx2.graphTable
      .select(col("id"), explode(col("nbrs")).as("nbr"))
      .filter(col("nbr").isInCollection(victimSet))
      .count()
    assert(badRefs == 0, s"$badRefs dangling neighbor refs to deleted ids")

    // ring stays a single cycle over the survivors
    val ring = idx2.ringTable.select(col("id"), col("succ")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ring.size == 1600)
    val start = ring.keys.min
    var cur = ring(start)
    var steps = 1
    while (cur != start && steps <= ring.size) { cur = ring(cur); steps += 1 }
    assert(steps == ring.size, s"ring cycle length $steps != ${ring.size}")

    // and search still returns sane results
    val s = idx2.toServing
    val hits = s.search(Array.fill(dim)(0.5f), topk = 5)
    assert(hits.size == 5)
  }
}
