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

  /** Expected ImageIoDecoder features for the synthetic image of `id`,
    * derived from the pixel formula alone — decoded pixels must match
    * because PNG/BMP are lossless. */
  private def expectedImageFeatures(id: Long): Array[Float] = {
    val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
    val n = w.toLong * h
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
    val hist = new Array[Long](8)
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
      val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
      val b = ((id * 23 + x * 5 + y * 19) % 256).toInt
      sr += r; sg += g; sb += b
      val luma = (r * 299 + g * 587 + b * 114) / 1000
      sl += luma; hist(luma / 32) += 1
    }
    Array(w.toFloat, h.toFloat, (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
      (sb.toDouble / n).toFloat, (sl.toDouble / n).toFloat) ++
      hist.map(c => (c.toDouble / n).toFloat)
  }

  test("ImageIoDecoder decodes REAL encoded PNG bytes to exact pixel statistics") {
    val ss = spark
    import ss.implicits._
    val ids = Seq(0L, 1L, 7L, 42L, 123L).toDF("doc_id")
    val media = Multimodal.packSyntheticImages(ids, "doc_id")
    // payloads are genuine PNG files (magic bytes), not passthroughs
    val first = media.orderBy("media_id").head()
    val bytes = first.getAs[Array[Byte]](2)
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val feats = Multimodal.extractFeatures(media.repartition(3), Multimodal.ImageIoDecoder)
      .select(col("media_id"), col("feature")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for (id <- Seq(0L, 1L, 7L, 42L, 123L)) {
      assert(feats(id).length == Multimodal.ImageIoDecoder.FeatureDim)
      assert(feats(id).toSeq == expectedImageFeatures(id).toSeq,
        s"decoded features for id=$id diverge from the pixel formula")
    }
  }

  test("ImageIoDecoder handles BMP payloads identically (second pure-JVM codec)") {
    val ss = spark
    import ss.implicits._
    val media = Multimodal.packSyntheticImages(Seq(5L, 9L).toDF("doc_id"), "doc_id", format = "bmp")
    val first = media.orderBy("media_id").head()
    val bytes = first.getAs[Array[Byte]](2)
    assert(bytes(0) == 'B' && bytes(1) == 'M') // BMP magic
    val feats = Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
      .select(col("media_id"), col("feature")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(feats(5L).toSeq == expectedImageFeatures(5L).toSeq)
    assert(feats(9L).toSeq == expectedImageFeatures(9L).toSeq)
  }

  test("ImageIoDecoder rejects undecodable payloads instead of fabricating features") {
    assertThrows[IllegalArgumentException](
      Multimodal.ImageIoDecoder.decode("image", Array[Byte](1, 2, 3, 4)))
  }

  /** The (id, t) sample formula of packSyntheticWavs, independently
    * re-implemented for the expectation. */
  private def wavSamples(id: Long): Array[Int] = {
    val n = (256 + id % 97).toInt
    Array.tabulate(n)(t =>
      ((id * 37 + t.toLong * 101 + ((t.toLong * t) % 9973) * 29) % 65536 - 32768).toInt)
  }

  test("WavPcmDecoder decodes REAL RIFF/PCM bytes (with a junk LIST chunk) to exact sample statistics") {
    val ss = spark
    import ss.implicits._
    val ids = Seq(0L, 1L, 13L, 96L, 150L)
    val media = Multimodal.packSyntheticWavs(ids.toDF("doc_id"), "doc_id")
    // payloads are genuine RIFF/WAVE files, not passthroughs
    val first = media.orderBy("media_id").head()
    val bytes = first.getAs[Array[Byte]](2)
    assert(bytes.slice(0, 4).map(_.toChar).mkString == "RIFF")
    assert(bytes.slice(8, 12).map(_.toChar).mkString == "WAVE")
    val feats = Multimodal.extractFeatures(media.repartition(3), Multimodal.WavPcmDecoder)
      .select(col("media_id"), col("feature")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for (id <- ids) {
      val s = wavSamples(id)
      val n = s.length
      val zc = (1 until n).count(t => (s(t) >= 0) != (s(t - 1) >= 0))
      val hist = new Array[Long](4)
      s.foreach(v => hist((v + 32768) / 16384) += 1)
      val expect = Array(1f, 8000f, 16f, n.toFloat, s.min.toFloat, s.max.toFloat,
        (s.map(_.toLong).sum.toDouble / n).toFloat,
        (s.map(v => math.abs(v).toLong).sum.toDouble / n).toFloat,
        zc.toFloat,
        (s.map(v => v.toLong * v).sum.toDouble / n).toFloat) ++
        hist.map(c => (c.toDouble / n).toFloat)
      assert(feats(id).length == Multimodal.WavPcmDecoder.FeatureDim)
      assert(feats(id).toSeq == expect.toSeq,
        s"decoded audio features for id=$id diverge from the sample formula")
    }
  }

  /** Minimal headerless-extras WAV around arbitrary samples — for
    * invariance cases the synthetic packers don't generate. */
  private def rawWav(samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + dataLen)
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0x46464952).putInt(riffLen).putInt(0x45564157)
    buf.putInt(0x20746d66).putInt(16)
    buf.putShort(1).putShort(1)
    buf.putInt(8000).putInt(16000)
    buf.putShort(2).putShort(16)
    buf.putInt(0x61746164).putInt(dataLen)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  private def hashOf(payloads: Seq[(Long, Array[Byte])]): Map[Long, Long] = {
    val ss = spark
    import ss.implicits._
    Multimodal.audioMeanHash(
        payloads.map { case (id, b) => (id, "audio", b, null: String) }
          .toDF("media_id", "modality", "content", "source"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("audioMeanHash: gain- and DC-invariant, discriminates distinct clips") {
    val base = wavSamples(7L)
    val hs = hashOf(Seq(
      (1L, rawWav(base)),
      (2L, rawWav(base.map(s => Math.floorDiv(s, 2)))),      // -6 dB gain
      (3L, rawWav(base.map(s => Math.floorDiv(s, 2) + 1000))), // -6 dB + DC offset
      (4L, rawWav(wavSamples(40L)))))                        // different clip
    assert(hs(1L) == hs(2L), "uniform gain must not change the hash")
    assert(hs(1L) == hs(3L), "DC offset must not change the hash")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(4L)) > 3,
      "distinct clips must not co-report as near-dups")
  }

  test("audioMeanHash pairs: planted -6dB republish found, exact at hamming <= 3") {
    val ss = spark
    import ss.implicits._
    val ids = (0L until 30L).toDF("doc_id")
    val media = Multimodal.packSyntheticWavs(ids, "doc_id")
      .unionByName(Multimodal.packSyntheticWavsMutated(
        ids.filter(col("doc_id") < 5), "doc_id"))
    val pairs = graft.operators.Dedup.simhashNearDupPairs(
        Multimodal.audioMeanHash(media), maxHamming = 3, nBands = 4,
        idCol = "media_id", hashCol = "ahash", bits = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach(i =>
      assert(pairs.contains((i, i + 100000L)), s"planted gain-twin $i not found"))
  }

  test("WavPcmDecoder rejects non-WAV and truncated payloads") {
    assertThrows[IllegalArgumentException](
      Multimodal.WavPcmDecoder.decode("audio", Array[Byte](1, 2, 3, 4)))
    // corrupt a real payload's data-chunk length so it overruns the file
    val ss = spark
    import ss.implicits._
    val good = Multimodal.packSyntheticWavs(Seq(3L).toDF("doc_id"), "doc_id")
      .head().getAs[Array[Byte]](2)
    val bad = good.clone()
    val dataSizeOff = 12 + 8 + 16 + 8 + 4 + 4 // RIFF hdr + fmt + LIST + "data"
    bad(dataSizeOff) = -1; bad(dataSizeOff + 1) = -1 // data len -> huge
    assertThrows[IllegalArgumentException](
      Multimodal.WavPcmDecoder.decode("audio", bad))
  }

  /** Expected GifVideoDecoder features for the synthetic GIF of `id`,
    * derived from the frame/pixel/palette formulas alone — decoded
    * frames must match because palette-indexed GIF is lossless. */
  private def expectedVideoFeatures(id: Long): Array[Float] = {
    val nFrames = (2 + id % 4).toInt
    val w = (8 + id % 6).toInt; val h = (8 + id % 5).toInt
    val nPix = nFrames.toLong * w * h
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
    var firstL = 0L; var lastL = 0L
    val hist = new Array[Long](6)
    for (f <- 0 until nFrames) {
      var fl = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val i = ((id * 13 + f * 101 + x * 7 + y * 29) % 256).toInt
        val r = (i * 37 + 11) % 256; val g = (i * 59 + 3) % 256; val b = (i * 83 + 7) % 256
        sr += r; sg += g; sb += b
        val luma = (r * 299 + g * 587 + b * 114) / 1000
        sl += luma; fl += luma
        hist(math.min(5, luma / 43)) += 1
      }
      if (f == 0) firstL = fl
      if (f == nFrames - 1) lastL = fl
    }
    val nFrame = w.toLong * h
    Array(nFrames.toFloat, w.toFloat, h.toFloat, nPix.toFloat,
      (sr.toDouble / nPix).toFloat, (sg.toDouble / nPix).toFloat,
      (sb.toDouble / nPix).toFloat, (sl.toDouble / nPix).toFloat,
      (firstL.toDouble / nFrame).toFloat, (lastL.toDouble / nFrame).toFloat) ++
      hist.map(c => (c.toDouble / nPix).toFloat)
  }

  test("GifVideoDecoder decodes REAL multi-frame GIF bytes to exact per-frame pixel statistics") {
    val ss = spark
    import ss.implicits._
    val ids = Seq(0L, 1L, 5L, 42L, 149L)
    val media = Multimodal.packSyntheticGifs(ids.toDF("doc_id"), "doc_id")
    // payloads are genuine GIF containers (magic bytes), not passthroughs
    val first = media.orderBy("media_id").head()
    val bytes = first.getAs[Array[Byte]](2)
    assert(bytes.slice(0, 3).map(_.toChar).mkString == "GIF")
    val feats = Multimodal.extractFeatures(media.repartition(3), Multimodal.GifVideoDecoder)
      .select(col("media_id"), col("feature")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for (id <- ids) {
      assert(feats(id).length == Multimodal.GifVideoDecoder.FeatureDim)
      assert(feats(id).toSeq == expectedVideoFeatures(id).toSeq,
        s"decoded video features for id=$id diverge from the frame formula")
      // the temporal signal is real: frame count > 1 for every id here
      assert(feats(id)(0) >= 2f)
    }
  }

  test("GifVideoDecoder rejects undecodable payloads") {
    assertThrows[IllegalArgumentException](
      Multimodal.GifVideoDecoder.decode("video", Array[Byte](1, 2, 3, 4)))
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

  test("imageDHash: codec-independent, brightness-invariant, mutation stays within hamming 3") {
    val ss = spark
    import ss.implicits._
    def pngOf(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, baos); baos.toByteArray
    }
    def gradient(shift: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(12, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 10; x <- 0 until 12) {
        val v = (x * 13 + y * 7) % 200 + shift // <= 239: no clamp under +40
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def hashOf(bytes: Array[Byte]): Long = {
      val media = Seq((1L, "image", bytes, null: String))
        .toDF("media_id", "modality", "content", "source")
      Multimodal.imageDHash(media).head.getLong(1)
    }
    val base = hashOf(pngOf(gradient(0), "png"))
    // lossless re-encode in another container: same pixels, same hash
    assert(hashOf(pngOf(gradient(0), "bmp")) == base)
    // uniform brightness shift: every comparison unchanged
    assert(hashOf(pngOf(gradient(40), "png")) == base)

    // planted one-pixel mutation lands within the banded-join radius
    val ids = Seq(3L, 4L).toDF("doc_id")
    val media = Multimodal.packSyntheticImages(ids, "doc_id")
      .unionByName(Multimodal.packSyntheticImagesMutated(ids, "doc_id"))
    val pairs = Dedup.simhashNearDupPairs(Multimodal.imageDHash(media),
        maxHamming = 3, nBands = 4, idCol = "media_id", hashCol = "dhash", bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 100003L)) && pairs.contains((4L, 100004L)), s"got $pairs")
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
