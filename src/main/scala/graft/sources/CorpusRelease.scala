package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{ArtifactStore, Fingerprint, SidecarJson}

/** Corpus RELEASE artifact — the integrity-verified publish at the end
  * of a curation pipeline (ingest → filter → dedup → decontaminate →
  * **release**). A training run that reads a raw directory trusts
  * whatever is there; a release is self-describing and self-checking:
  *
  *   - `data/` — parquet sharded by `pmod(doc_id, shards)` (a
  *     partition column, so per-shard reads/pruning work and a
  *     downstream loader can schedule shard-parallel without listing)
  *   - `release.json` — row count, shard count, and an
  *     ORDER-INDEPENDENT content checksum (sum of each row's 60-bit
  *     md5-prefix over `id|text` — add-order free, so ANY engine, at
  *     any partitioning, re-derives it; the same hash family as the
  *     sampling/KMV tiers), written LAST from the WRITTEN files
  *     (content first, pointer last — the crash-safe publish idiom)
  *
  * [[open]] re-derives count + checksum from the data and REFUSES on
  * mismatch — torn writes, post-publish edits, and bit-rot surface at
  * read time instead of as silent training-data corruption. Cost: one
  * map-only scan + a 1-row agg, once per open (callers cache).
  */
object CorpusRelease {

  private def manifest(path: String) = s"$path/release.json"

  /** 60-bit md5-prefix content hash of one row — mirrors the
    * Sampling.weightedSample / KmvDistinctAgg hash family (DuckDB:
    * `CAST(CONV(SUBSTR(md5(...),1,15),16,10) AS BIGINT)`). Summed as
    * DECIMAL(38,0): exact and overflow-free to ~10^20 rows, where a
    * BIGINT sum of 2^60-scale hashes trips ANSI overflow within a few
    * thousand rows. */
  private def rowHash(id: org.apache.spark.sql.Column, text: org.apache.spark.sql.Column) =
    conv(substring(md5(concat_ws("|", id.cast("string"), text)), 1, 15), 16, 10)
      .cast("decimal(38,0)")

  /** Publish `docs` (idCol, textCol) as a release under `path`. */
  def write(docs: DataFrame, path: String, shards: Int,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = docs.sparkSession
    docs.select(col(idCol), col(textCol),
        pmod(col(idCol), lit(shards.toLong)).as("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$path/data")
    // derive the manifest from what was WRITTEN, not what we meant to
    // write — a lost task or partial overwrite shows up as a checksum
    // the open() verification then recomputes identically
    val st = spark.read.parquet(s"$path/data")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(rowHash(col(idCol), col(textCol))),
          lit(0).cast("decimal(38,0)")).as("cs"))
      .head()
    val (n, cs) = (st.getLong(0), st.getDecimal(1).toBigInteger.toString)
    val fp = Fingerprint.ofString(s"$n|$cs|$shards")
    ArtifactStore.current.writeAtomic(manifest(path),
      (s"""{"fingerprint":"$fp","n_rows":$n,"checksum":"$cs",""" +
        s""""shards":$shards,"id_col":"$idCol","text_col":"$textCol"}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Open a release: verify the manifest's own fingerprint, then
    * re-derive row count + content checksum from the data and refuse
    * on any mismatch. Returns the (idCol, textCol, shard) frame. */
  def open(spark: SparkSession, path: String): DataFrame = {
    val file = manifest(path)
    if (!ArtifactStore.current.exists(file))
      throw new IllegalStateException(s"not a corpus release: $file missing")
    val j = SidecarJson.read(file)
    val (n, cs, shards) = (j.long("n_rows"), j.str("checksum"), j.long("shards"))
    val fp = Fingerprint.ofString(s"$n|$cs|$shards")
    if (fp != j.str("fingerprint"))
      throw new IllegalArgumentException(
        s"$file: manifest fingerprint mismatch (corrupted or tampered manifest)")
    val (idCol, textCol) = (j.str("id_col"), j.str("text_col"))
    val df = spark.read.parquet(s"$path/data")
    val st = df.agg(count(lit(1)).as("n"),
      coalesce(sum(rowHash(col(idCol), col(textCol))),
        lit(0).cast("decimal(38,0)")).as("cs")).head()
    val gotCs = st.getDecimal(1).toBigInteger.toString
    if (st.getLong(0) != n || gotCs != cs)
      throw new IllegalArgumentException(
        s"$path: release content does not match its manifest " +
          s"(rows ${st.getLong(0)} vs $n, checksum $gotCs vs $cs) — " +
          "torn write, post-publish edit, or bit-rot; refusing to serve")
    df
  }
}
