package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The tokenizer-lifecycle contract: learned BPE merges persist as a
  * content-fingerprinted ArtifactStore sidecar (the IVF/PQ idiom) and
  * the apply path counts identically under the loaded table. */
class BpeArtifactSpec extends SparkSpec {

  private def corpus = {
    val ss = spark
    import ss.implicits._
    Seq(
      (1L, "the theme the thesis then"),
      (2L, "there the other another then"),
      (3L, "the then thesis theme there")).toDF("doc_id", "text")
  }

  test("learn -> save -> load round-trips the table; apply counts are identical under the loaded table") {
    val learned = TextAnalysis.learnBpeMerges(corpus, nMerges = 3)
    assert(learned.length == 3)
    val model = BpeModel(learned.map(t => (t._1, t._2)))
    val dir = tmpDir("bpe-artifact")
    BpeArtifact.save(model, dir)
    // "fresh session": nothing cached — load resolves pointer ->
    // content from disk alone
    val loaded = BpeArtifact.load(dir)
    assert(loaded == model)
    assert(loaded.fingerprint == model.fingerprint)
    // q78-shape counts under learned vs loaded tables are identical
    val words = corpus.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    def counts(m: Seq[(String, String)]) = words
      .select(col("doc_id"), TextAnalysis.bpeTokenCount(col("w"), m).as("c"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
      .orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = counts(model.merges)
    assert(a == counts(loaded.merges))
    // and the learned table actually compresses vs raw characters
    val rawChars = words.select(sum(length(col("w")))).head().getLong(0)
    assert(a.map(_._2).sum < rawChars)
  }

  test("a tampered content file refuses at load with the file named (fingerprint verify)") {
    val dir = tmpDir("bpe-tamper")
    val model = BpeModel(Seq(("t", "h"), ("th", "e")))
    BpeArtifact.save(model, dir)
    val content = new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("bpe-") && f.getName != "bpe.json").get
    java.nio.file.Files.writeString(content.toPath,
      """{"fingerprint":"deadbeefdeadbeef","left":["x"],"right":["y"]}""")
    val e = intercept[IllegalArgumentException] { BpeArtifact.load(dir) }
    assert(e.getMessage.contains(content.getName), e.getMessage)
  }

  test("vacuum reaps superseded tables, keeps the current pointer target") {
    val dir = tmpDir("bpe-vacuum")
    val a = BpeModel(Seq(("t", "h")))
    val b = BpeModel(Seq(("t", "h"), ("th", "e")))
    BpeArtifact.save(a, dir)
    BpeArtifact.save(b, dir)
    assert(a.fingerprint != b.fingerprint)
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(files.contains(s"bpe-${a.fingerprint}.json"))
    assert(BpeArtifact.vacuum(dir) == 1)
    val after = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!after.contains(s"bpe-${a.fingerprint}.json"))
    assert(BpeArtifact.load(dir) == b)
    // idempotent
    assert(BpeArtifact.vacuum(dir) == 0)
  }
}
