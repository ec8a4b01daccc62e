package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexMeta, Metric, VectorIndex}

/** Interchange sources/sinks for index data beyond the native Parquet
  * snapshots: JSON-lines (self-describing, arrays native), ORC
  * (columnar with native arrays — the other warehouse-standard
  * container), and CSV (flat interchange; the vector column is encoded
  * as a semicolon-joined string since CSV has no array type).
  *
  * The reference's only "formats" are raw mmap bytes + LevelDB
  * (SURVEY §2.2 scans/sources: no connectors); these exist so engine
  * users can get data in and out of ordinary pipeline tooling. All
  * readers enforce the engine schema explicitly — no sampling-based
  * inference jobs at scale. */
object IndexExchange {

  /** Export a snapshot's vectors table. Format: "json", "orc" or "csv". */
  def exportVectors(index: VectorIndex, path: String, format: String): Unit = format match {
    case "json" =>
      index.vectors.write.mode("overwrite").json(path)
    case "orc" =>
      index.vectors.write.mode("overwrite").orc(path)
    case "csv" =>
      index.vectors
        .select(col("id"), col("key"),
          concat_ws(";", transform(col("vec"), v => v.cast("string"))).as("vec"))
        .write.mode("overwrite").option("header", "true").csv(path)
    case other => throw new IllegalArgumentException(s"unsupported format $other")
  }

  /** Read an exported vectors table back to the engine schema
    * (id BIGINT, key STRING, vec ARRAY<FLOAT>). */
  def readVectors(spark: SparkSession, path: String, format: String): DataFrame = format match {
    case "json" =>
      spark.read
        .schema("id BIGINT, key STRING, vec ARRAY<FLOAT>")
        .json(path)
    case "orc" =>
      spark.read
        .schema("id BIGINT, key STRING, vec ARRAY<FLOAT>")
        .orc(path)
    case "csv" =>
      spark.read
        .schema("id BIGINT, key STRING, vec STRING")
        .option("header", "true").csv(path)
        .select(col("id"), col("key"),
          transform(split(col("vec"), ";"), s => s.cast("float")).as("vec"))
    case other => throw new IllegalArgumentException(s"unsupported format $other")
  }

  /** Rebuild a full index from an exported vectors table (graph is
    * reconstructed — adjacency is derived state, not interchange). */
  def importIndex(
      spark: SparkSession,
      exportPath: String,
      format: String,
      indexPath: String,
      dim: Int,
      maxDegree: Int = 64,
      metric: Metric = Metric.Euclidean): VectorIndex = {
    val vecs = readVectors(spark, exportPath, format)
    VectorIndex.build(spark, indexPath, vecs, dim = dim, maxDegree = maxDegree, metric = metric)
  }
}
