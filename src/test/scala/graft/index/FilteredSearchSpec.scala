package graft.index

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

import graft.SparkSpec

/** Filtered + range search across the three tiers (serving graph, IVF,
  * exact): predicate-restricted top-k and radius queries against exact
  * filtered truth, at the reference's recall threshold (0.70). */
class FilteredSearchSpec extends SparkSpec {

  private val dim = 16
  private val n = 2000
  private val rng = new scala.util.Random(11)
  private val data: Array[(Long, Array[Float], Int)] =
    Array.tabulate(n)(i => (i.toLong, Array.fill(dim)(rng.nextFloat()), i % 5))

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("label", IntegerType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(data.map { case (i, v, l) => Row(i, v.toSeq, l) }: _*), schema)
  }

  private def sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  private def exactFilteredTopK(q: Array[Float], allow: Int => Boolean, k: Int): Set[Long] =
    data.filter { case (_, _, l) => allow(l) }
      .map { case (i, v, _) => (sq(q, v), i) }
      .sortBy { case (dd, i) => (dd, i) }.take(k).map(_._2).toSet

  test("serving searchFiltered: same-label top-10 recall >= 0.70") {
    val serving = new ServingIndex(dim = dim, maxDegree = 32)
    data.foreach { case (_, v, _) => serving.insert(v) }
    // internal id i = insertion order = data index; label = i % 5
    val recalls = (0 until 20).map { qi =>
      val (_, qv, ql) = data(qi)
      val got = serving.searchFiltered(qv, topk = 10,
        allow = pid => ((pid - 1) % 5).toInt == ql).map(_._2 - 1).toSet
      val truth = exactFilteredTopK(qv, _ == ql, 10)
      truth.intersect(got).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.70, s"filtered recall $avg below gate")
    // every returned hit must satisfy the predicate
    val hits = serving.searchFiltered(data(0)._2, topk = 10,
      allow = pid => ((pid - 1) % 5).toInt == data(0)._3)
    assert(hits.forall { case (_, pid, _) => ((pid - 1) % 5).toInt == data(0)._3 })
  }

  test("serving rangeSearch matches exact range results") {
    val serving = new ServingIndex(dim = dim, maxDegree = 32)
    data.foreach { case (_, v, _) => serving.insert(v) }
    // radius chosen to catch a few dozen points at dim=16
    val radius = 0.9
    val recalls = (0 until 10).map { qi =>
      val qv = data(qi)._2
      val truth = data.map { case (i, v, _) => (math.sqrt(sq(qv, v)), i) }
        .filter(_._1 <= radius).map(_._2).toSet
      val got = serving.rangeSearch(qv, radius).map(_._2 - 1).toSet
      // all returned are truly within radius
      serving.rangeSearch(qv, radius).foreach { case (_, pid, dist) =>
        assert(math.abs(dist - math.sqrt(sq(qv, data((pid - 1).toInt)._2))) < 1e-9)
        assert(dist <= radius)
      }
      if (truth.isEmpty) 1.0 else truth.intersect(got).size.toDouble / truth.size
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.70, s"range recall $avg below gate")
  }

  test("sharded router: filtered + range scatter-gather match the gates") {
    val router = new ShardedServing(dim = dim, numShards = 4)
    val gids = data.map { case (_, v, _) => router.insert(v)._2 }
    val labelOf = gids.zipWithIndex.map { case (g, i) => g -> data(i)._3 }.toMap
    // filtered: same-label top-10, predicate over GLOBAL ids
    val recalls = (0 until 10).map { qi =>
      val (_, qv, ql) = data(qi)
      val got = router.searchFiltered(qv, topk = 10,
        allow = gid => labelOf(gid) == ql).map(_._2)
      assert(got.forall(g => labelOf(g) == ql))
      val truthIdx = exactFilteredTopK(qv, _ == ql, 10)
      val truthGids = truthIdx.map(i => gids(i.toInt))
      truthGids.intersect(got.toSet).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.70, s"sharded filtered recall $avg below gate")
    // range: every hit within radius, high recall vs exact
    val radius = 0.9
    val rangeRecalls = (0 until 10).map { qi =>
      val qv = data(qi)._2
      val hits = router.rangeSearch(qv, radius)
      hits.foreach { case (_, _, dist) => assert(dist <= radius) }
      val truth = data.filter { case (_, v, _) => math.sqrt(sq(qv, v)) <= radius }
        .map { case (i, _, _) => gids(i.toInt) }.toSet
      if (truth.isEmpty) 1.0
      else truth.intersect(hits.map(_._2).toSet).size.toDouble / truth.size
    }
    val rAvg = rangeRecalls.sum / rangeRecalls.length
    assert(rAvg >= 0.70, s"sharded range recall $rAvg below gate")
  }

  test("IVF filtered: predicate prunes candidates before scoring; recall >= 0.70") {
    val (centroids, assignedRaw) = graft.operators.Similarity.ivfFit(
      df.select(col("id"), col("vec")), k = 16)
    // carry the label through for the predicate
    val assigned = assignedRaw.join(df.select(col("id"), col("label")), "id")
    val queries = df.filter(col("id") < 20)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val got = graft.operators.Similarity.ivfTopK(
        assigned, centroids, queries, topk = 10, nprobe = 8,
        filter = col("label") === 2)
      .select(col("query_id"), col("neighbor_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    // every hit has label 2
    assert(got.values.flatten.forall(i => data(i.toInt)._3 == 2))
    val recalls = (0 until 20).map { qi =>
      val truth = exactFilteredTopK(data(qi)._2, _ == 2, 10)
      truth.intersect(got.getOrElse(qi.toLong, Set.empty)).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.70, s"IVF filtered recall $avg below gate")
  }
}
