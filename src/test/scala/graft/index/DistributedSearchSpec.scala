package graft.index

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DistributedSearchSpec extends SparkSpec {

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("distributed beam search meets the recall gate vs brute force") {
    val path = tmpDir("idx-beam")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    val queries = embeddings.filter(col("id") < 20)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val res = DistributedSearch.beamSearch(idx, queries, topk = 10).cache()
    assert(res.groupBy(col("query_id")).count().filter(col("count") =!= 10).count() == 0)
    // recall vs exact brute force
    val all = embeddings.collect().map(r => (r.getLong(0) + 1L, r.getSeq[Float](1).toArray))
    val got = res.select(col("query_id"), col("public_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recalls = (0L until 20L).map { qid =>
      val qv = all(qid.toInt)._2
      val truth = all.sortBy { case (pid, v) => (Metric.Euclidean.dist(qv, v), pid) }
        .take(10).map(_._1).toSet
      truth.intersect(got(qid)).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    info(f"distributed beam search recall@10 = $avg%.3f")
    assert(avg >= 0.70)
    // self-query: nearest hit is the query itself at dist 0, rank 1
    val self = res.filter(col("query_id") === 5 && col("rnk") === 1).head()
    assert(self.getLong(1) == 6L) // public id = query_id + 1
    assert(self.getDouble(3) == 0.0)
  }
}
