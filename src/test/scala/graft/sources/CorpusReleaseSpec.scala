package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus release artifact: write → open round-trip, shard layout,
  * and every refusal path (missing manifest, tampered manifest,
  * post-publish content edits). */
class CorpusReleaseSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"document number $i body")).toDF("doc_id", "text")

  test("write -> open round-trips the corpus; shard column partitions the layout") {
    val dir = tmpDir("release")
    CorpusRelease.write(docs(40), dir, shards = 4)
    val back = CorpusRelease.open(spark, dir)
    assert(back.count() == 40L)
    assert(back.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      docs(40).as[(Long, String)].collect().sortBy(_._1).toSeq)
    // physical layout: one shard=K directory per shard
    val shardDirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq == (0 until 4).map(i => s"shard=$i"))
    // pruning: a shard filter reads one partition directory
    assert(back.filter(col("shard") === 2).count() == 10L)
  }

  test("open refuses: missing manifest, tampered manifest, edited content") {
    val dir = tmpDir("release-bad")
    intercept[IllegalStateException] { CorpusRelease.open(spark, tmpDir("empty")) }
    CorpusRelease.write(docs(10), dir, shards = 2)
    // tamper the manifest stats -> fingerprint check trips
    val mf = java.nio.file.Paths.get(s"$dir/release.json")
    val json = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
    java.nio.file.Files.write(mf,
      json.replace("\"n_rows\":10", "\"n_rows\":11").getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException] { CorpusRelease.open(spark, dir) }
    assert(e1.getMessage.contains("fingerprint"))
    java.nio.file.Files.write(mf, json.getBytes("UTF-8")) // restore
    CorpusRelease.open(spark, dir) // sanity: verifies again
    // post-publish content edit -> checksum mismatch refuses
    docs(10).withColumn("text", concat(col("text"), lit(" EDITED")))
      .select(col("doc_id"), col("text"),
        pmod(col("doc_id"), lit(2L)).as("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/data")
    val e2 = intercept[IllegalArgumentException] { CorpusRelease.open(spark, dir) }
    assert(e2.getMessage.contains("checksum") || e2.getMessage.contains("does not match"))
  }

  test("checksum is order- and partitioning-independent") {
    val (d1, d2) = (tmpDir("rel-a"), tmpDir("rel-b"))
    CorpusRelease.write(docs(30), d1, shards = 3)
    CorpusRelease.write(docs(30).repartition(7).orderBy(desc("doc_id")), d2, shards = 3)
    def cs(p: String) = graft.index.SidecarJson.read(s"$p/release.json").str("checksum")
    assert(cs(d1) == cs(d2))
  }
}
