package graft

import org.apache.spark.sql.functions._

import graft.index.VectorIndex
import graft.operators.{Dedup, TextAnalysis}

/** End-to-end training-data pipeline: quality-filter -> exact dedup
  * (keep canonical) -> stub embedding -> distributed index build ->
  * search. Each stage is an operator the driver checks individually;
  * this spec proves they COMPOSE — the actual shape a user of the
  * library runs. */
class PipelineSpec extends SparkSpec {

  test("filter -> dedup -> embed -> index -> search composes end-to-end") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // corpus with injected exact duplicates
    val dups = docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val corpus = docs.unionByName(dups)
    val n0 = corpus.count()

    // stage 1: quality filter
    val kept = TextAnalysis.withTextStats(corpus)
      .filter(col("quality_score") >= 0.5)
      .select(col("doc_id"), col("text"))
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0)

    // stage 2: exact dedup, keep the canonical (min doc_id) copy
    val groups = Dedup.exactDuplicates(kept)
    val losers = groups.select(explode(col("member_ids")).as("doc_id"))
      .join(groups.select(col("canonical_id").as("doc_id")), Seq("doc_id"), "left_anti")
    val deduped = kept.join(losers, Seq("doc_id"), "left_anti")
    val n2 = deduped.count()
    // every injected duplicate whose source survived the filter is gone
    assert(n2 < n1)
    assert(deduped.select(md5(col("text"))).distinct().count() == n2)

    // stage 3: deterministic stub embedding (the decode/embed step is
    // a per-row expression — at scale a mapInPandas model call)
    val h = TextAnalysis.termHash(col("text"))
    val dim = 16
    val embedded = deduped.select(
      col("doc_id").as("id"),
      transform(sequence(lit(1), lit(dim)),
        i => (pmod(h * i, lit(997L)).cast("double") / 997.0).cast("float")).as("vec"))

    // stage 4: distributed graph build + serving search
    val idx = VectorIndex.build(spark, tmpDir("pipeline-idx"), embedded,
      dim = dim, maxDegree = 12)
    assert(idx.meta.numPoints == n2)
    val serving = idx.toServing
    val sample = embedded.orderBy(col("id")).limit(5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    sample.foreach { case (id, v) =>
      val top = serving.search(v, topk = 3)
      assert(top.nonEmpty)
      // self-query: the document's own vector is its nearest neighbor
      assert(top.head._2 == id + 1L, s"doc $id not its own nearest neighbor")
    }
  }
}
