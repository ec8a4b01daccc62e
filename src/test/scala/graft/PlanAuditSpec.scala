package graft

/** Plan-shape regression net for the 100 TB claims the docs make.
  *
  * The dedup/decontamination tier's central promise is "banded
  * equi-join, never all-pairs": every pair generation goes through a
  * band/bucket/block key so the join is hash-partitioned, and the only
  * quadratic joins in the repo are deliberately-tiny broadcast probes
  * or the labeled exact-oracle twins. A refactor that silently turns
  * one of these into a non-broadcast cartesian product would still
  * pass its sf0.01 hash oracle (same rows, catastrophic plan) — THIS
  * is the spec that fails instead. Broadcast nested-loop joins are
  * allowed: the engine uses them only for frames bounded by
  * construction (1-row totals, fixed query sets), and a broadcast
  * requires the small side to fit in memory, which a runaway pair
  * explosion cannot.
  *
  * Also pins scan-level pushdown on the point-lookup path: q04's
  * filter must reach the parquet reader as PushedFilters, not run
  * post-scan (DESIGN.md's row for q04/q05).
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Scale-tier queries whose contract forbids a non-broadcast
    * cartesian anywhere in the plan. (Exact twins like q45, which ARE
    * documented all-pairs over a capped corpus, are deliberately
    * absent.) */
  private val bandedQueries = Seq(
    "q41_ngram_jaccard",
    "q43_minhash_lsh",
    "q44_simhash",
    "q52_dedup_groups",
    "q56_embedding_neardup_lsh",
    "q57_ngram_jaccard_capped",
    "q65_leakage_safe_split",
    "q69_chunk_dedup",
    "q88_winnow_dedup",
    "q97_simhash_pairs",
    "q102_span_decontam",
    "q103_srp_pairs",
    "q122_rag_retrieval",
    "q126_bloom_decontaminate",
    "q127_bm25_topk",
    "q128_hybrid_rrf",
    "q129_token_drift",
    "q135_kmeans",
    // session additions (q154/q161 are labeled exact twins — absent)
    "q152_profile",
    "q153_embed_outliers",
    "q155_knn_join_recall",
    "q156_blocklist_screen",
    "q157_vocab_coverage",
    "q158_tfidf_keywords",
    "q160_quality_blend",
    "q162_profile_drift",
    "q163_dup_rate_by_source",
    "q164_zorder_layout",
    "q165_sample_coverage")

  for (name <- bandedQueries)
    test(s"$name: no non-broadcast cartesian product in the executed plan") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count()
      val cartesians = collectPlanNodes(df) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }
      assert(cartesians.isEmpty,
        s"$name grew a CartesianProductExec — the banded equi-join contract is broken")
      graft.plans.Blocks.release(df)
    }

  test("q04 point lookup pushes its id filter into the parquet scan") {
    val df = SparkEntry.queries("q04_lookup_by_id")(spark, sfDir)
    df.count()
    val scans = collectPlanNodes(df) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a parquet file scan")
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("In"))),
      s"no pushed In-filter on the scan: ${scans.map(_.metadata.get("PushedFilters"))}")
  }
}
