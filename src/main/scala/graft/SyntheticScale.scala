package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× synthetic expansion of the largest shipped
  * fixtures (`/root/testdata` tops out at sf0.1) — the input for the
  * bench's sf0.1 → "sf1" super-linearity probe. The 0.01 → 0.1 probe's
  * per-query ratios sit near 1.2 (the fixtures are small enough that
  * fixed costs dominate), so a quadratic term hiding in a default path
  * is invisible there; at 50k docs / 20k vectors it is not.
  *
  * Construction (all pure column expressions — deterministic, no RNG,
  * so the expansion is content-addressed and reusable across rounds):
  *
  *  - `documents`: 10 tiles, `doc_id' = doc_id + tile·n_docs` (ids stay
  *    dense and below the 100000 boundary the dup-probe queries
  *    synthesize above). Tile 0 is verbatim; tiles ≥ 1 suffix every
  *    3rd token with a tile marker, so EVERY word-trigram shingle
  *    contains a mutated token — cross-tile shingle sets are disjoint
  *    and each tile carries exactly the fixture's own dup structure.
  *    That is the honest "10× more independent data" scaling: dedup
  *    work grows linearly, not by manufactured cross-tile near-dups.
  *  - `embeddings`: 10 tiles, `vec_id' = vec_id + tile·n_vecs`,
  *    components perturbed ±2% by a (vec_id, tile, position)-keyed
  *    sine — distribution-preserving, no exact duplicates across
  *    tiles.
  *
  * The output dir is content-keyed under `target/sf1-synth/<fp>`
  * (the Scratch discipline), with a completion marker so bench runs
  * across rounds reuse one expansion. Only the two expanded tables are
  * written — probe queries are restricted to documents/embeddings
  * consumers. */
object SyntheticScale {

  val Tiles = 10

  /** Build (once) and return the synthetic sf1 dir derived from
    * `sfDir`'s documents+embeddings. */
  def ensure(spark: SparkSession, sfDir: String): String = {
    val fp = graft.queries.Scratch.tableFingerprint(spark, sfDir, "documents")
    val out = new java.io.File(s"target/sf1-synth/$fp").getAbsolutePath
    val marker = new java.io.File(s"$out/_SYNTH_OK")
    graft.queries.Scratch.writeOnce(s"sf1-synth#$out") {
      if (!marker.exists()) {
        writeDocs(spark, sfDir, out)
        writeEmbeddings(spark, sfDir, out)
        java.nio.file.Files.createDirectories(marker.toPath.getParent)
        java.nio.file.Files.writeString(marker.toPath, "ok")
      }
    }
    out
  }

  private def tiles(spark: SparkSession): DataFrame =
    spark.range(0, Tiles).select(col("id").cast("int").as("tile"))

  private def writeDocs(spark: SparkSession, sfDir: String, out: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val mutated = docs.crossJoin(tiles(spark))
      .withColumn("text",
        when(col("tile") === 0, col("text")).otherwise(
          array_join(
            zip_with(
              split(col("text"), " "),
              sequence(lit(0), size(split(col("text"), " ")) - 1),
              (t, i) => when(i % 3 === 2,
                concat(t, lit("_t"), col("tile"))).otherwise(t)),
            " ")))
      .select(
        (col("doc_id") + col("tile") * n).as("doc_id"),
        col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    mutated
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  private def writeEmbeddings(spark: SparkSession, sfDir: String, out: String): Unit = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    emb.crossJoin(tiles(spark))
      .select(
        (col("vec_id") + col("tile") * n).as("vec_id"),
        when(col("tile") === 0, col("embedding")).otherwise(
          zip_with(
            col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => (x * (lit(1.0) + lit(0.02) *
              sin(col("vec_id") * 13 + col("tile") * 7 + i))).cast("float")))
          .as("embedding"),
        col("label"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** The probe's query list: the most expensive registered queries
    * whose inputs are ONLY documents/embeddings (the two expanded
    * tables). ANN-index queries are excluded deliberately — a 20k-
    * vector graph build per round is its own benchmark, not a scan-
    * shape probe — as is q56, whose exact-truth side is O(n²) BY
    * CONTRACT (the labeled oracle); q45 covers the near-dup scale
    * story here by routing through its default SRP tier above
    * [[graft.operators.Dedup.EmbeddingExactThreshold]]. q124 is also
    * out: its Misra–Gries coverage guarantee `minCount > N/k` is
    * fixture-calibrated and the operator REFUSES (by design) at 10×
    * the shingle count — the first probe run measured 24 s of
    * aggregate followed by the loud require, not a completed query. */
  val ProbeQueries: Seq[String] = Seq(
    "q122_rag_retrieval",
    "q89_source_overlap",
    "q41_ngram_jaccard",
    "q45_embedding_neardup",
    "q57_ngram_jaccard_capped",
    "q127_bm25_topk",
    "q173_tokenizer_fertility",
    "q58_tfidf",
    "q115_mmr_rerank",
    "q128_hybrid_rrf",
    // the r14 eval cards — the most expensive doc queries of the
    // round, and the direct evidence for the gated-sample claim:
    // measured at sf1 6.2 s / 2.1 s solo (2.3× / 1.7× their sf0.1
    // times for 10× the documents — sub-linear, sample-bounded)
    "q198_dedup_tier_eval",
    "q199_lsh_threshold_sweep")
}
