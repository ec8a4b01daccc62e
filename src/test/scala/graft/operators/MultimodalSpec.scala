package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("packText produces the binary media schema") {
    val media = Multimodal.packText(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "modality", "content", "source"))
    assert(media.schema("content").dataType.typeName == "binary")
    assert(media.count() == 500)
  }

  test("extractFeatures: per-partition stub decode, deterministic features") {
    val media = Multimodal.packText(docs, "doc_id", "text").repartition(4)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == 500)
    assert(feats.schema("feature").dataType.typeName == "array")
    // n_bytes matches the source text byte length, checksum is the
    // additive mod-65521 sum (same contract as q50_multimodal_meta)
    val expected = docs.select(col("doc_id").as("d_id"),
      octet_length(col("text")).cast("long").as("expected_bytes"))
    val joined = feats.join(expected, feats("media_id") === expected("d_id"))
      .filter(col("n_bytes") =!= col("expected_bytes"))
    assert(joined.count() == 0)
    val row = feats.filter(col("media_id") === 0).head()
    val f = row.getSeq[Float](4)
    assert(f.length == Multimodal.StubDecoder.FeatureDim)
    assert(f.head == row.getLong(2).toFloat) // feature[0] = n_bytes
    // deterministic across runs
    val again = Multimodal.extractFeatures(media).filter(col("media_id") === 0).head()
    assert(again.getSeq[Float](4) == f)
  }

  test("null payloads flow through with null features") {
    val media = Multimodal.packText(docs.limit(3), "doc_id", "text")
      .withColumn("content", when(col("media_id") === 1, col("content")))
    val feats = Multimodal.extractFeatures(media)
    assert(feats.filter(col("feature").isNull).count() == 2)
    assert(feats.filter(col("feature").isNotNull).count() == 1)
  }

  test("resize: byte-budget transform with original-size header") {
    val media = Multimodal.packText(docs.limit(10), "doc_id", "text")
    val resized = Multimodal.resize(media, maxBytes = 32)
    assert(resized.count() == 10)
    // every payload capped at header + budget
    assert(resized.filter(col("n_bytes") > 36).count() == 0)
    val row = resized.filter(col("media_id") === 0).head()
    val bytes = row.getAs[Array[Byte]](2)
    val orig = java.nio.ByteBuffer.wrap(bytes).getInt
    val origLen = docs.filter(col("doc_id") === 0).head().getString(1)
      .getBytes("UTF-8").length
    assert(orig == origLen)
  }

  test("frameSample: n evenly-spaced frames per payload") {
    val media = Multimodal.packText(docs.limit(5), "doc_id", "text")
    val frames = Multimodal.frameSample(media, n = 4, frameBytes = 8)
    assert(frames.count() == 20) // 5 payloads x 4 frames
    val f0 = frames.filter(col("media_id") === 0).orderBy(col("frame_idx")).collect()
    assert(f0.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    // offsets strictly increase and frames are non-empty
    assert(f0.map(_.getLong(2)).toSeq == f0.map(_.getLong(2)).toSeq.sorted)
    assert(f0.forall(_.getAs[Array[Byte]](3).nonEmpty))
  }
}
