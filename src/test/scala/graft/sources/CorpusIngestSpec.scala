package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** Quarantine-discipline contract of the JSONL front door: malformed
  * lines and records missing the required id land in quarantine with
  * their raw bytes; good rows round-trip exactly; nothing is silently
  * dropped (good + quarantined == input lines). */
class CorpusIngestSpec extends SparkSpec {

  private val schema = StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING")

  test("readJsonl/quarantineJsonl split malformed and id-less lines; nothing lost") {
    val ss = spark
    import ss.implicits._
    val dir = tmpDir("jsonl-in")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """garbage not json at all""",
      """{"text": "no id here", "lang": "de"}""",          // parses, id null
      """{"doc_id": 4, "text": "quote \" inside", "lang": "fr"}""",
      """trunc{"doc_id": 5, "text": "broken""")
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)

    val good = CorpusIngest.readJsonl(spark, dir, schema).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(good == Map(
      1L -> (("hello world", "en")),
      4L -> (("quote \" inside", "fr"))), s"got $good")

    val quarantined = CorpusIngest.quarantineJsonl(spark, dir, schema)
      .collect().map(_.getString(0)).toSet
    assert(quarantined == Set(lines(1), lines(2), lines(4)), s"got $quarantined")
    assert(good.size + quarantined.size == lines.size)
  }

  test("readCsv/quarantineCsv: same quarantine discipline over headerless CSV") {
    val ss = spark
    import ss.implicits._
    val dir = tmpDir("csv-in")
    val lines = Seq(
      "1,hello world,en",
      "x2,truncated",                      // non-numeric id -> quarantined
      ",no id here,de",                    // empty id cell -> quarantined
      "4,\"comma, inside\",fr",            // quoted comma survives
      "5,\"he said \\\"hi\\\"\",pt")       // Spark-dialect escaped quote survives
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)

    val good = CorpusIngest.readCsv(spark, dir, schema).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(good == Map(
      1L -> (("hello world", "en")),
      4L -> (("comma, inside", "fr")),
      5L -> (("he said \"hi\"", "pt"))), s"got $good")

    val quarantined = CorpusIngest.quarantineCsv(spark, dir, schema)
      .collect().map(_.getString(0)).toSet
    assert(quarantined == Set(lines(1), lines(2)), s"got $quarantined")
    assert(good.size + quarantined.size == lines.size)
  }

  test("to_csv lines -> readCsv round-trips, matching the JSONL split rule") {
    val ss = spark
    import ss.implicits._
    val rows = Seq((1L, "plain text", "en"), (2L, "with, comma", "de"),
      (3L, "with \"quotes\"", "fr"))
    val dir = tmpDir("csv-rt")
    rows.toDF("doc_id", "text", "lang")
      .select(to_csv(struct(col("doc_id"), col("text"), col("lang"))).as("value"))
      .coalesce(1).write.mode("overwrite").text(dir)
    val back = CorpusIngest.readCsv(spark, dir, schema).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(back == rows)
    assert(CorpusIngest.quarantineCsv(spark, dir, schema).count() == 0)
  }

  test("splitLines on a STREAM == the batch readers' split (stateless per-line rule)") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lines = Seq(
      """{"doc_id": 1, "text": "hello", "lang": "en"}""",
      """broken {""",
      """{"text": "idless", "lang": "de"}""",
      """{"doc_id": 2, "text": "world", "lang": "fr"}""")
    val mem = MemoryStream[String]
    val (goodS, quarS) = CorpusIngest.splitLines(mem.toDF(), schema)
    val q1 = goodS.writeStream.format("memory").queryName("ingest_good")
      .outputMode("append").start()
    val q2 = quarS.writeStream.format("memory").queryName("ingest_quar")
      .outputMode("append").start()
    mem.addData(lines: _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    val streamedGood = spark.table("ingest_good").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val streamedQuar = spark.table("ingest_quar").collect().map(_.getString(0)).toSet
    q1.stop(); q2.stop()
    // batch twin over the same lines written as a file
    val dir = tmpDir("jsonl-stream-twin")
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val batchGood = CorpusIngest.readJsonl(spark, dir, schema).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val batchQuar = CorpusIngest.quarantineJsonl(spark, dir, schema)
      .collect().map(_.getString(0)).toSet
    assert(streamedGood == batchGood && streamedGood ==
      Set((1L, "hello", "en"), (2L, "world", "fr")))
    assert(streamedQuar == batchQuar && streamedQuar == Set(lines(1), lines(2)))
  }

  test("writeJsonl -> readJsonl round-trips the engine document schema") {
    val ss = spark
    import ss.implicits._
    val dir = tmpDir("jsonl-rt")
    val docs = Seq((10L, "alpha beta", "en"), (11L, "gamma", "de"))
      .toDF("doc_id", "text", "lang")
    CorpusIngest.writeJsonl(docs, dir)
    val back = CorpusIngest.readJsonl(spark, dir, schema)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(back == Seq((10L, "alpha beta", "en"), (11L, "gamma", "de")))
  }
}
