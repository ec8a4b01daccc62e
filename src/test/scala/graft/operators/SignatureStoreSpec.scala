package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.index.ArtifactStore

/** SignatureStore lifecycle: crash-safe publish, cross-session probe
  * equivalence, and the unpublished/mismatched guards. */
class SignatureStoreSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val ss = spark
    import ss.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpusRows = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three four five six seven eight nine"),
    (3L, "the quick brown fox jumps over the lazy dog"))

  test("build -> load -> probe finds a planted near-dup without corpus text") {
    val dir = tmpDir("sigstore")
    SignatureStore.build(docsDf(corpusRows), dir)
    assert(SignatureStore.exists(dir))
    // batch: one near-copy of doc 1 (tail token changed), one novel doc
    val batch = docsDf(Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta iota"),
      (102L, "completely different content with no shared trigrams at all")))
    val batchSigs = Dedup.minhashSignatures(
      Dedup.contentShingleIds(Dedup.docShingles(batch, 3)))
    val hits = SignatureStore.probe(batchSigs, SignatureStore.load(spark, dir), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq == Seq((101L, 1L)))
  }

  test("probe of an identical doc reports est_jaccard 1.0") {
    val dir = tmpDir("sigstore-exact")
    SignatureStore.build(docsDf(corpusRows), dir)
    val batchSigs = Dedup.minhashSignatures(Dedup.contentShingleIds(
      Dedup.docShingles(docsDf(Seq((201L, corpusRows.head._2))), 3)))
    val row = SignatureStore.probe(batchSigs, SignatureStore.load(spark, dir), 0.5).head()
    assert(row.getLong(1) == 1L && row.getDouble(2) == 1.0)
  }

  test("merge(build(A), build(B)) == build(A ∪ B); overlap and k-drift refused") {
    val a = corpusRows.take(2); val b = corpusRows.drop(2)
    val (dirA, dirB, dirM, dirAll) =
      (tmpDir("sig-a"), tmpDir("sig-b"), tmpDir("sig-m"), tmpDir("sig-all"))
    SignatureStore.build(docsDf(a), dirA)
    SignatureStore.build(docsDf(b), dirB)
    SignatureStore.merge(spark, dirA, dirB, dirM)
    SignatureStore.build(docsDf(corpusRows), dirAll)
    def sigs(d: String) = SignatureStore.load(spark, d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(dirM) == sigs(dirAll))
    // identical sidecars (fingerprint derives from content, not history)
    assert(new String(ArtifactStore.current.readBytes(s"$dirM/store.json"), "UTF-8") ==
      new String(ArtifactStore.current.readBytes(s"$dirAll/store.json"), "UTF-8"))
    // overlapping doc ids refuse
    val err = intercept[IllegalArgumentException] {
      SignatureStore.merge(spark, dirA, dirAll, tmpDir("sig-x"))
    }
    assert(err.getMessage.contains("share doc ids"))
    // shingle-size drift refuses
    val dirK4 = tmpDir("sig-k4")
    SignatureStore.build(docsDf(b), dirK4, shingleK = 4)
    val err2 = intercept[IllegalArgumentException] {
      SignatureStore.merge(spark, dirA, dirK4, tmpDir("sig-y"))
    }
    assert(err2.getMessage.contains("shingle sizes"))
  }

  test("unpublished store (no sidecar) refuses to load") {
    val dir = tmpDir("sigstore-unpub")
    // data without the sidecar pointer = a crashed build
    Dedup.minhashSignatures(Dedup.contentShingleIds(
        Dedup.docShingles(docsDf(corpusRows), 3)))
      .write.mode("overwrite").parquet(s"$dir/sigs")
    val e = intercept[IllegalStateException] { SignatureStore.load(spark, dir) }
    assert(e.getMessage.contains("store.json"))
  }

  test("banding-param drift is rejected, naming the sidecar") {
    val dir = tmpDir("sigstore-drift")
    SignatureStore.build(docsDf(corpusRows), dir)
    val raw = new String(ArtifactStore.current.readBytes(s"$dir/store.json"), "UTF-8")
    ArtifactStore.current.writeAtomic(s"$dir/store.json",
      raw.replace(""""num_hashes":16""", """"num_hashes":8""").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] { SignatureStore.load(spark, dir) }
    assert(e.getMessage.contains("store.json"))
  }
}
