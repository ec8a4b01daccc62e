package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q56's sampled-truth tier (r16 verdict item 1): above the truth
  * cap, BOTH the exact-truth and the LSH candidate legs run on one
  * seeded [[graft.operators.Dedup.docSample]] slice — pair-level
  * recall on the sample is an unbiased estimate of corpus pair
  * recall, and no unsampled crossJoin is reachable from q56 at any
  * corpus size. At or under the cap (every shipped fixture) the
  * full corpus is used, so the gated values at both fixture decades
  * are bit-identical to the pre-sampling rounds. */
class TruthSampleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001" // embeddings: 500 rows

  test("q56Embeddings: full corpus at or under the cap, seeded slice above it") {
    // fixture-scale: no sampling, the LocalLimit probe is the only
    // action (500 <= cap)
    val (full, nFull, fracFull) = DocQueries.q56Embeddings(spark, sfDir)
    assert(nFull == 500L && fracFull == 10000L)
    assert(full.count() == 500L)
    // forced small cap: the slice samples BOTH pair endpoints through
    // the md5 predicate — deterministic, ~cap expected rows
    val (slice, n, frac) = DocQueries.q56Embeddings(spark, sfDir, cap = 100L)
    assert(n == 500L)
    assert(frac == 100L * 10000L / 500L) // 2000 per 10k
    val got = slice.count()
    assert(got > 50L && got < 160L, s"expected ~100 sampled rows, got $got")
    // deterministic: the same seeded predicate replays the same slice
    val again = DocQueries.q56Embeddings(spark, sfDir, cap = 100L)._1
    assert(slice.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      == again.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq)
    // and it is a SUBSET of the corpus (a filter, never a reshuffle of
    // identities)
    assert(slice.join(full, Seq("vec_id"), "left_anti").count() == 0L)
  }

  test("q56 card self-reports the sample shape; fixture scale is unsampled") {
    val card = DocQueries.embeddingNearDupLsh(spark, sfDir).collect().head
    assert(card.getAs[Long]("n_corpus") == 500L)
    assert(card.getAs[Long]("n_sample") == 500L)
    assert(card.getAs[Long]("sample_frac_per_10k") == 10000L)
    // the recall gate still rides the card (the artifact contract)
    assert(card.getAs[Double]("pair_recall") >= 0.70)
  }
}
