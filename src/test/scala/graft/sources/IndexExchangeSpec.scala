package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.index.VectorIndex

class IndexExchangeSpec extends SparkSpec {

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
    .filter(col("id") < 100)

  test("JSON, ORC and CSV vector export/import round-trip exactly") {
    val idxPath = tmpDir("idx-exchange")
    val idx = VectorIndex.build(spark, idxPath, embeddings, dim = 64, maxDegree = 8)
    for (fmt <- Seq("json", "orc", "csv")) {
      val out = tmpDir(s"export-$fmt")
      IndexExchange.exportVectors(idx, out, fmt)
      val back = IndexExchange.readVectors(spark, out, fmt)
      assert(back.count() == 100)
      // float round-trip must be exact (both formats print shortest-
      // round-trip decimal representations)
      val diff = back.as("b").join(idx.vectors.as("o"), Seq("id"))
        .filter(col("b.vec") =!= col("o.vec") || col("b.key") =!= col("o.key"))
      assert(diff.count() == 0, s"round-trip mismatch for $fmt")
    }
  }

  test("importIndex rebuilds a searchable index from an export") {
    val idxPath = tmpDir("idx-exchange2")
    val idx = VectorIndex.build(spark, idxPath, embeddings, dim = 64, maxDegree = 8)
    val out = tmpDir("export-json2")
    IndexExchange.exportVectors(idx, out, "json")
    val rebuilt = IndexExchange.importIndex(spark, out, "json", tmpDir("idx-rebuilt"), dim = 64, maxDegree = 8)
    assert(rebuilt.meta.numPoints == 100)
    val s = rebuilt.toServing
    val q = embeddings.filter(col("id") === 42).head().getSeq[Float](1).toArray
    assert(s.search(q, topk = 1).head._2 == 43L) // finds itself, 1-based
  }
}
