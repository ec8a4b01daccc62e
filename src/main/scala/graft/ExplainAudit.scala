package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries so the
  * scan/pushdown/broadcast/codegen shape can be audited per round.
  * Usage: runMain graft.ExplainAudit [sfDir] [queryName...] */
object ExplainAudit {

  /** The beam path's per-step join shape over the BUCKETED serving
    * layout (VectorIndex.bucketedServing): the plan must show the
    * frontier side exchanged and the adjacency scan Exchange-free
    * (its bucket layout satisfies the join's distribution). */
  private def beamBucketedStep(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val tmp = java.nio.file.Files.createTempDirectory("audit-bkt").toString
    val idx = graft.index.VectorIndex.build(spark, tmp, emb, dim = 64, maxDegree = 16)
    val (_, ba) = idx.bucketedServing(numBuckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.range(0, 50).select(col("id")).join(ba, Seq("id"))
        .select(col("id"), explode(col("nbrs")).as("nbr"))
        .explain("formatted")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else
      Seq("q04_lookup_by_id", "q02_knn_exact_l2", "q11_revenue_by_nation",
        "q41_ngram_jaccard", "q60_event_window_agg", "q62_asof_join",
        "q63_interval_join", "q20_price_quantiles", "q52_dedup_groups",
        "q22_filtered_knn", "q58_tfidf", "q59_decontaminate",
        "q32_ivf_search", "q66_ivfpq_search", "beam_bucketed_step",
        "q87_int8_quantize", "q89_source_overlap", "q90_event_anomaly",
        "q95_bigram_nll", "q96_semantic_decon", "q97_simhash_pairs",
        "q105_funnel", "q106_retention", "q107_line_dedup_keepfirst",
        "q108_corpus_card", "q109_parent_doc_search", "q111_jsonl_ingest",
        "q115_mmr_rerank", "q116_pmi_collocations", "q117_pipeline_yield",
        "q127_bm25_topk", "q128_hybrid_rrf", "q129_token_drift",
        "q130_hard_negatives", "q135_kmeans", "q136_embed_cov",
        "q137_graph_pagerank", "q138_incremental_dedup", "q139_csv_ingest",
        "q140_entry_depths", "q141_pca_whiten", "q142_cluster_mix",
        "q144_pca_search", "q122_rag_retrieval", "q124_frequent_ngrams",
        "q146_audio_neardup")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      if (n == "beam_bucketed_step") beamBucketedStep(spark, sfDir)
      else if (n == "shingle_pair_kernel") {
        // the q41/q57/q194 posting-list pair kernel, pre-checkpoint
        // (the public APIs materialize the aggregated pairs, so the
        // kernel's Exchange/Generate shape is only auditable lazily)
        import org.apache.spark.sql.functions.col
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        graft.operators.Dedup.shinglePairCounts(
          graft.operators.Dedup.docShingles(docs, 3), 6).explain("formatted")
      }
      else if (n == "beam_step_kernel") {
        // ONE beam-search hop's lazy join/exchange shape (q34/q35 —
        // the loop checkpoints each hop, so the per-hop plan is only
        // auditable through DistributedSearch.stepPlan)
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val tmp = java.nio.file.Files.createTempDirectory("audit-beam").toString
        val idx = graft.index.VectorIndex.build(spark, tmp, emb, dim = 64, maxDegree = 16)
        val vectors = idx.vectors.select(col("id"), col("key"), col("vec"))
        val qmat = emb.filter(col("id") < 10)
          .select(col("id").as("query_id"), col("vec").as("qvec"))
        val dcol = graft.index.Metric.distColumn(idx.metric, col("qvec"), col("vec"))
        val beam = qmat
          .join(vectors.filter(col("id") === 0).select(col("id"), col("vec")))
          .select(col("query_id"), col("id"), dcol.as("dist"))
        graft.index.DistributedSearch.stepPlan(
          beam, qmat, vectors, idx.adjacency, dcol, beamWidth = 32)
          .explain("formatted")
      }
      else if (n == "percentile_blend_kernel") {
        // q160's FOLDED value-counts leg (lazy — percentileBlend
        // executes eagerly around driver-side offset maps, so the
        // one-aggregation (signal, value) union shape is only
        // auditable here; mirrors Sampling.percentileBlend step 1)
        import org.apache.spark.sql.functions._
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val base = graft.operators.TextAnalysis.withTextStats(docs)
          .select(col("doc_id"),
            col("quality_score").cast("double").as("__sig_quality"),
            col("distinct_ratio").cast("double").as("__sig_distinct"))
        val melted = base.select(col("doc_id"), explode(array(
            struct(lit(0).as("sig"), col("__sig_quality").as("v")),
            struct(lit(1).as("sig"), col("__sig_distinct").as("v")))).as("sv"))
          .select(col("doc_id"), col("sv.sig").as("sig"), col("sv.v").as("v"))
        melted.groupBy(col("sig"), col("v")).agg(count(lit(1)).as("c"))
          .repartitionByRange(col("sig"), col("v"))
          .explain("formatted")
      }
      else if (n == "lsh_knn_kernel") {
        // the q56 / bulk-graph-build LSH candidate kernel (lazy — the
        // consumers collect/checkpoint, so the join shape is only
        // auditable here)
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        graft.index.GraphBuilder.lshKnnEdges(emb, k = 10,
          metric = graft.index.Metric.Cosine).explain("formatted")
      }
      else SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query $n")
      }
    }
    spark.stop()
  }
}
