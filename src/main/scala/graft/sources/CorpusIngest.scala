package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingest with quarantine discipline — the missing front
  * door of the pipeline: real training corpora arrive as JSON-lines
  * dumps (Common-Crawl-style), a fraction of every dump is malformed
  * (truncated records, encoding damage), and a curation engine must
  * neither crash on those rows nor silently drop them. The reference
  * has no connectors at all (SURVEY §2.2: raw mmap + LevelDB only);
  * [[IndexExchange]] covers index-table interchange, this covers the
  * DOCUMENT side.
  *
  * Split rule: the reader runs PERMISSIVE with an explicit schema (no
  * inference jobs at scale — inference is itself a full scan), so a
  * malformed line parses to an all-null row. Rows where `idCol` is
  * null are quarantined; everything else is good. Filtering on a
  * non-null id avoids Spark's corrupt-record-column restriction (a
  * plan referencing ONLY `_corrupt_record` off an unparsed file is
  * disallowed without caching — caching the raw corpus at 100 TB is
  * not an option).
  *
  * Scale shape: both frames are narrow filters over ONE line-splittable
  * text scan — no shuffle, no cache; Spark splits JSONL by line
  * boundaries, so a 100 TB dump parallelizes by input split exactly
  * like Parquet. Count the quarantine FRACTION before dropping it: a
  * jump is how you detect an upstream dump regression. */
object CorpusIngest {

  /** Good rows (schema columns, `idCol` non-null). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      idCol: String = "doc_id"): DataFrame =
    raw(spark, path, schema).filter(col(idCol).isNotNull)

  /** Quarantined rows: the line failed to parse (or parsed without the
    * required id). Kept as the RAW line text for forensics. */
  def quarantineJsonl(spark: SparkSession, path: String, schema: StructType,
      idCol: String = "doc_id"): DataFrame =
    splitLines(spark.read.text(path), schema, idCol)._2

  private def raw(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Stateless line-level split — (good, quarantined) — over a frame
    * of raw lines (`value` STRING). Because it is one `from_json`
    * expression per row (no join, no state), the SAME call runs on a
    * STREAMING frame: point it at `readStream.text(dir)` (or a message
    * bus source) and ingest-time quarantine happens at arrival, before
    * anything lands in the durable corpus. `from_json` nulls exactly
    * the lines the batch PERMISSIVE reader nulls, so stream and batch
    * split identically (CorpusIngestSpec pins this). */
  def splitLines(lines: DataFrame, schema: StructType,
      idCol: String = "doc_id"): (DataFrame, DataFrame) = {
    val parsed = lines.withColumn("__parsed", from_json(col("value"), schema))
    val bad = col("__parsed").isNull || col(s"__parsed.$idCol").isNull
    (parsed.filter(!bad).select(col("__parsed.*")),
      parsed.filter(bad).select(col("value").as("raw_line")))
  }

  /** JSONL sink (one self-describing JSON object per line). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** CSV front door — same quarantine discipline as JSONL, for the
    * other line-splittable dump format corpora actually arrive in
    * (metadata exports, tabular crawls). Headerless by contract: a
    * header row is a per-FILE artifact that breaks split-parallel
    * reading semantics (every split but the first has no header), and
    * at scale the schema travels with the pipeline, not the dump.
    * Dialect: Spark's default (quote `"`, escape `\`) — what
    * [[writeCsv]] and `to_csv` emit; RFC-4180 quote-doubling dumps
    * need `from_csv` options threaded through [[splitCsvLines]]. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      idCol: String = "doc_id"): DataFrame =
    splitCsvLines(spark.read.text(path), schema, idCol)._1

  /** Quarantined CSV rows, kept as the raw line for forensics. */
  def quarantineCsv(spark: SparkSession, path: String, schema: StructType,
      idCol: String = "doc_id"): DataFrame =
    splitCsvLines(spark.read.text(path), schema, idCol)._2

  /** Stateless CSV line split — (good, quarantined) — the
    * [[splitLines]] contract over `from_csv`: one per-row expression,
    * no join/state, so the SAME call quarantines a STREAMING text
    * source at arrival. PERMISSIVE parse nulls unparseable fields; a
    * row is quarantined when the whole parse or its required id comes
    * back null (a non-numeric id cell, a truncated line). */
  def splitCsvLines(lines: DataFrame, schema: StructType,
      idCol: String = "doc_id"): (DataFrame, DataFrame) = {
    val parsed = lines.withColumn("__parsed",
      from_csv(col("value"), schema, Map("mode" -> "PERMISSIVE")))
    val bad = col("__parsed").isNull || col(s"__parsed.$idCol").isNull
    (parsed.filter(!bad).select(col("__parsed.*")),
      parsed.filter(bad).select(col("value").as("raw_line")))
  }

  /** CSV sink (headerless, to match [[readCsv]]'s contract). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "false").csv(path)
}
