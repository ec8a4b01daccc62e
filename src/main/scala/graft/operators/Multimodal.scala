package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video payloads as
  * opaque `BINARY` columns with typed metadata, and run decode /
  * feature-extraction as partition-local batch operations.
  *
  * IMAGE decode is REAL: [[ImageIoDecoder]] decodes PNG/BMP payloads
  * through `javax.imageio` (pure-JVM codecs, no native libs) to pixels
  * and emits deterministic features (dims, per-channel means, luminance
  * histogram). AUDIO decode is REAL: [[WavPcmDecoder]] parses
  * RIFF/WAVE 16-bit PCM (chunk walk, fmt, data) to samples and emits
  * deterministic amplitude features. VIDEO decode is REAL:
  * [[GifVideoDecoder]] walks a multi-frame animated-GIF container
  * through `javax.imageio` (LZW + palette, pure JVM) and emits
  * per-corpus and per-frame (first/last) features. `StubDecoder`
  * remains as the byte-statistics fallback for codecs genuinely absent
  * from the JVM (e.g. H.264); the per-partition decoder lifecycle is
  * shared, so swapping in an FFI codec stays a one-class change.
  *
  * Scale design: `mapPartitions` is the right boundary for this work —
  * the decoder is initialized once per partition (the expensive part
  * for real codecs: model load, codec context), rows stream through
  * without materializing the partition, and the operation is a narrow
  * transformation (no shuffle). Partition sizing is controlled upstream
  * via spark.sql.files.maxPartitionBytes so a partition of binary
  * payloads fits executor memory.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("source", StringType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** A per-partition decoder. Real implementations hold codec/model
    * state; the contract is: construct once per partition, `decode`
    * per row. */
  trait Decoder extends Serializable {
    def decode(modality: String, content: Array[Byte]): Array[Float]
  }

  /** Deterministic fake decode: 8-dim byte-statistics vector.
    * ??? -> swap in an FFI codec for formats the JVM lacks (H.264,
    * MP3, JPEG-lossy); every JVM-decodable modality already decodes
    * for real via [[ImageIoDecoder]]/[[WavPcmDecoder]]/
    * [[GifVideoDecoder]], and the surrounding plumbing is shared. */
  object StubDecoder extends Decoder {
    val FeatureDim = 8
    def decode(modality: String, content: Array[Byte]): Array[Float] = {
      val n = content.length
      if (n == 0) return Array.fill(FeatureDim)(0f)
      var sum = 0L; var min = 255; var max = 0; var zeros = 0
      var i = 0
      while (i < n) {
        val b = content(i) & 0xff
        sum += b; if (b < min) min = b; if (b > max) max = b; if (b == 0) zeros += 1
        i += 1
      }
      val mean = sum.toDouble / n
      Array(
        n.toFloat,
        mean.toFloat,
        min.toFloat,
        max.toFloat,
        zeros.toFloat,
        (content(0) & 0xff).toFloat,
        (content(n - 1) & 0xff).toFloat,
        modality.length.toFloat)
    }
  }

  /** REAL image decode via `javax.imageio` (PNG and BMP ship with the
    * JVM — lossless RGB, so decoded pixels are exact). Features
    * (14 floats): width, height, mean R/G/B, mean integer luminance
    * (BT.601 fixed-point: (299r + 587g + 114b) / 1000), and an 8-bin
    * luminance-histogram fraction vector. All statistics are computed
    * in integer/long arithmetic and widened once at the end, so the
    * result is bit-deterministic across JVMs and cluster sizes. */
  object ImageIoDecoder extends Decoder {
    val FeatureDim = 14
    def decode(modality: String, content: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      require(img != null, s"undecodable $modality payload (${content.length} bytes)")
      val w = img.getWidth; val h = img.getHeight
      val n = w.toLong * h
      var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
      val hist = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sr += r; sg += g; sb += b
          val luma = (r * 299 + g * 587 + b * 114) / 1000
          sl += luma
          hist(luma / 32) += 1
          x += 1
        }
        y += 1
      }
      val out = new Array[Float](FeatureDim)
      out(0) = w.toFloat; out(1) = h.toFloat
      out(2) = (sr.toDouble / n).toFloat
      out(3) = (sg.toDouble / n).toFloat
      out(4) = (sb.toDouble / n).toFloat
      out(5) = (sl.toDouble / n).toFloat
      var i = 0
      while (i < 8) { out(6 + i) = (hist(i).toDouble / n).toFloat; i += 1 }
      out
    }
  }

  /** REAL audio decode: a pure-JVM RIFF/WAVE parser for PCM payloads
    * (16-bit signed little-endian, any channel count) — no native
    * codec needed, which makes WAV the honest audio baseline the way
    * PNG/BMP are for images. The parser walks the chunk list (skipping
    * unknown chunks word-aligned, as the RIFF spec requires — real
    * files carry LIST/INFO metadata before `data`), reads `fmt `, and
    * decodes the `data` chunk. Features (14 floats): channels,
    * sample rate, bits/sample, sample count, min, max, mean, mean
    * absolute amplitude, zero-crossing count, mean energy (sum s²/n),
    * and a 4-bin amplitude-histogram fraction vector. All statistics
    * accumulate in integer/long arithmetic and widen once at the end —
    * bit-deterministic across JVMs and cluster sizes, and re-derivable
    * by a SQL oracle from a sample formula alone. */
  /** Parsed RIFF/WAVE PCM view: (buffer, dataOff, nSamples, channels,
    * sampleRate, bits) — the chunk walk shared by the feature decoder
    * and the perceptual hash. */
  private[operators] def parseRiffPcm(content: Array[Byte])
      : (java.nio.ByteBuffer, Int, Int, Int, Int, Int) = {
    val buf = java.nio.ByteBuffer.wrap(content)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(content.length >= 44 && buf.getInt(0) == 0x46464952 /* "RIFF" */ &&
      buf.getInt(8) == 0x45564157 /* "WAVE" */,
      s"not a RIFF/WAVE payload (${content.length} bytes)")
    var channels = -1; var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    var off = 12
    while (off + 8 <= content.length && (channels < 0 || dataOff < 0)) {
      val ckId = buf.getInt(off)
      val ckSize = buf.getInt(off + 4)
      ckId match {
        case 0x20746d66 /* "fmt " */ =>
          require(buf.getShort(off + 8) == 1, "only PCM (format 1) supported")
          channels = buf.getShort(off + 10)
          sampleRate = buf.getInt(off + 12)
          bits = buf.getShort(off + 22)
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
        case 0x61746164 /* "data" */ =>
          dataOff = off + 8; dataLen = ckSize
        case _ => () // LIST, fact, cue ... skip
      }
      off += 8 + ckSize + (ckSize & 1) // chunks are word-aligned
    }
    require(channels > 0 && dataOff >= 0 && dataOff + dataLen <= content.length,
      "missing or truncated fmt/data chunk")
    val n = dataLen / 2
    require(n > 0, "empty data chunk")
    (buf, dataOff, n, channels, sampleRate, bits)
  }

  object WavPcmDecoder extends Decoder {
    val FeatureDim = 14
    def decode(modality: String, content: Array[Byte]): Array[Float] = {
      val (buf, dataOff, n, channels, sampleRate, bits) = parseRiffPcm(content)
      var mn = Int.MaxValue; var mx = Int.MinValue
      var sum = 0L; var sabs = 0L; var senergy = 0L; var zc = 0L
      val hist = new Array[Long](4)
      var prevNonNeg = false
      var i = 0
      while (i < n) {
        val s: Int = buf.getShort(dataOff + 2 * i)
        if (s < mn) mn = s
        if (s > mx) mx = s
        sum += s; sabs += math.abs(s); senergy += s.toLong * s
        val nonNeg = s >= 0
        if (i > 0 && nonNeg != prevNonNeg) zc += 1
        prevNonNeg = nonNeg
        hist((s + 32768) / 16384) += 1
        i += 1
      }
      val out = new Array[Float](FeatureDim)
      out(0) = channels.toFloat; out(1) = sampleRate.toFloat; out(2) = bits.toFloat
      out(3) = n.toFloat; out(4) = mn.toFloat; out(5) = mx.toFloat
      out(6) = (sum.toDouble / n).toFloat
      out(7) = (sabs.toDouble / n).toFloat
      out(8) = zc.toFloat
      out(9) = (senergy.toDouble / n).toFloat
      var b = 0
      while (b < 4) { out(10 + b) = (hist(b).toDouble / n).toFloat; b += 1 }
      out
    }
  }

  /** REAL video decode: multi-frame animated-GIF parsing through
    * `javax.imageio` (the GIF codec ships with the JVM — LZW decode,
    * frame sequence walk, palette lookup; no native libs). GIF is the
    * honest video baseline the way PNG/BMP are for images and WAV is
    * for audio: a true container with N full frames, losslessly
    * round-trippable because frames are palette-indexed (≤256 colors).
    * Features (16 floats): frame count, width, height, total pixels,
    * mean R/G/B over all frames, mean integer luminance (BT.601
    * fixed-point), first- and last-frame mean luminance (a real
    * temporal signal — scene change detection reads exactly this), and
    * a 6-bin luminance-histogram fraction vector. All statistics
    * accumulate in long arithmetic and widen once at the end —
    * bit-deterministic across JVMs and cluster sizes. */
  object GifVideoDecoder extends Decoder {
    val FeatureDim = 16
    def decode(modality: String, content: Array[Byte]): Array[Float] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"undecodable $modality payload (${content.length} bytes)")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val nFrames = reader.getNumImages(true)
        require(nFrames > 0, "container holds no frames")
        var w = 0; var h = 0
        var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
        var firstL = 0L; var lastL = 0L
        val hist = new Array[Long](6)
        var f = 0
        while (f < nFrames) {
          val img = reader.read(f)
          if (f == 0) { w = img.getWidth; h = img.getHeight }
          require(img.getWidth == w && img.getHeight == h,
            "variable-size frames not supported")
          var fl = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              sr += r; sg += g; sb += b
              val luma = (r * 299 + g * 587 + b * 114) / 1000
              sl += luma; fl += luma
              hist(math.min(5, luma / 43)) += 1
              x += 1
            }
            y += 1
          }
          if (f == 0) firstL = fl
          if (f == nFrames - 1) lastL = fl
          f += 1
        }
        val nPix = nFrames.toLong * w * h
        val nFrame = w.toLong * h
        val out = new Array[Float](FeatureDim)
        out(0) = nFrames.toFloat; out(1) = w.toFloat; out(2) = h.toFloat
        out(3) = nPix.toFloat
        out(4) = (sr.toDouble / nPix).toFloat
        out(5) = (sg.toDouble / nPix).toFloat
        out(6) = (sb.toDouble / nPix).toFloat
        out(7) = (sl.toDouble / nPix).toFloat
        out(8) = (firstL.toDouble / nFrame).toFloat
        out(9) = (lastL.toDouble / nFrame).toFloat
        var i = 0
        while (i < 6) { out(10 + i) = (hist(i).toDouble / nPix).toFloat; i += 1 }
        out
      } finally { reader.dispose(); iis.close() }
    }
  }

  /** The fixed 256-entry palette shared by every synthetic GIF frame:
    * channel values are pure functions of the palette index, so a SQL
    * oracle maps pixel index → RGB with arithmetic alone. */
  private def gifPalette(): java.awt.image.IndexColorModel = {
    val rs = new Array[Byte](256); val gs = new Array[Byte](256); val bs = new Array[Byte](256)
    var i = 0
    while (i < 256) {
      rs(i) = ((i * 37 + 11) % 256).toByte
      gs(i) = ((i * 59 + 3) % 256).toByte
      bs(i) = ((i * 83 + 7) % 256).toByte
      i += 1
    }
    new java.awt.image.IndexColorModel(8, 256, rs, gs, bs)
  }

  /** Deterministic synthetic animated-GIF corpus: one multi-frame GIF
    * per input id — frame count, dimensions, and every pixel's palette
    * index are pure functions of (id, frame, x, y), and the palette
    * maps index → RGB by formula — so a SQL oracle re-derives the
    * DECODED features from arithmetic alone. Frames are full-size and
    * palette-indexed (TYPE_BYTE_INDEXED over [[gifPalette]]), which is
    * what makes the GIF round trip lossless: the writer stores raster
    * indices + the palette verbatim; LZW is lossless. Encoding runs
    * partition-local through the same mapPartitions seam as decode. */
  def packSyntheticGifs(ids: DataFrame, idCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val palette = gifPalette()
        rows.map { r =>
          val id = r.getLong(0)
          val nFrames = (2 + id % 4).toInt
          val w = (8 + id % 6).toInt; val h = (8 + id % 5).toInt
          val baos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            var f = 0
            while (f < nFrames) {
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
              val raster = img.getRaster
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  raster.setSample(x, y, 0,
                    ((id * 13 + f * 101 + x * 7 + y * 29) % 256).toInt)
                  x += 1
                }
                y += 1
              }
              writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
              f += 1
            }
            writer.endWriteSequence()
          } finally { writer.dispose(); ios.close() }
          Row(id, "video", baos.toByteArray, null)
        }
      }(enc)
  }

  /** Deterministic synthetic WAV corpus: one 16-bit mono PCM file per
    * input id, sample values a pure function of (id, t) — so a SQL
    * oracle re-derives the DECODED features from arithmetic alone,
    * proving the real encode → chunk-walk → decode path end-to-end
    * (PCM is lossless; the formula round-trips exactly). A junk LIST
    * chunk sits between `fmt ` and `data` so the oracle also covers
    * the unknown-chunk skip every real-world WAV exercises. */
  private def synthWavBytes(id: Long, halved: Boolean): Array[Byte] = {
    val n = (256 + id % 97).toInt
    val sampleRate = 8000
    val dataLen = n * 2
    val listLen = 4 // "INFO", no sub-chunks
    val riffLen = 4 + (8 + 16) + (8 + listLen) + (8 + dataLen)
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0x46464952).putInt(riffLen).putInt(0x45564157) // RIFF/len/WAVE
    buf.putInt(0x20746d66).putInt(16) // "fmt ", size
    buf.putShort(1).putShort(1)       // PCM, mono
    buf.putInt(sampleRate).putInt(sampleRate * 2) // rate, byte rate
    buf.putShort(2).putShort(16)      // block align, bits
    buf.putInt(0x5453494c).putInt(listLen).putInt(0x4f464e49) // LIST/4/INFO
    buf.putInt(0x61746164).putInt(dataLen) // "data", size
    var t = 0L
    while (t < n) {
      val base = ((id * 37 + t * 101 + ((t * t) % 9973) * 29) % 65536 - 32768).toInt
      // floor-halving = a real -6 dB gain cut in integer PCM (mirrors
      // SQL `s // 2`, which floors — NOT Scala's truncating `/`)
      val s = (if (halved) Math.floorDiv(base, 2) else base).toShort
      buf.putShort(s)
      t += 1
    }
    buf.array()
  }

  def packSyntheticWavs(ids: DataFrame, idCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, "audio", synthWavBytes(id, halved = false), null)
        }
      }(enc)
  }

  /** Gain-mutated twin corpus: ids republished at `+offset` with every
    * sample floor-halved (a -6 dB volume cut) — byte-level dedup is
    * blind to it, the mean-delta hash is invariant to it. */
  def packSyntheticWavsMutated(
      ids: DataFrame, idCol: String, offset: Long = 100000L): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id + offset, "audio", synthWavBytes(id, halved = true), null)
        }
      }(enc)
  }

  /** Perceptual audio hash of DECODED PCM: the waveform is cut into 65
    * equal time windows, per-window integer sample sums + counts are
    * accumulated, and bit k is set iff window k+1's MEAN exceeds
    * window k's — compared by exact integer cross-multiplication
    * (e₂·c₁ > e₁·c₂), so no float ever enters the hash. The audio twin
    * of [[imageDHash]]: only NEIGHBOR COMPARISONS survive, so the hash
    * is invariant to uniform gain (positive scaling preserves mean
    * order), DC offset (shifts every window mean equally), and
    * lossless re-encode — the "same clip, different mastering" case a
    * multimodal dedup tier exists to catch. 8 bytes per clip
    * regardless of duration; feeds the same banded-hamming pair join
    * as the image tier ([[graft.operators.Dedup.simhashNearDupPairs]],
    * bits = 64). Runs the REAL RIFF parse per row (mapPartitions — the
    * Multimodal codec seam). */
  def audioMeanHash(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false))))
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (buf, dataOff, n, _, _, _) = parseRiffPcm(r.getAs[Array[Byte]](1))
          val e = new Array[Long](65)
          val c = new Array[Long](65)
          var t = 0
          while (t < n) {
            val w = ((t.toLong * 65L) / n).toInt
            e(w) += buf.getShort(dataOff + 2 * t)
            c(w) += 1L
            t += 1
          }
          var hash = 0L
          var k = 0
          while (k < 64) {
            if (e(k + 1) * c(k) > e(k) * c(k + 1)) hash |= 1L << k
            k += 1
          }
          Row(id, hash)
        }
      }(enc)
  }

  /** Deterministic synthetic image corpus: one PNG/BMP per input id,
    * dimensions and RGB values pure functions of (id, x, y) — so a SQL
    * oracle can derive the DECODED features from arithmetic alone,
    * which makes the real encode → decode → feature path hash-checkable
    * end-to-end (lossless codecs round-trip the formula exactly).
    * Encoding runs partition-local through the same mapPartitions seam
    * as decode. */
  private def synthImageBytes(id: Long, format: String, whiteOrigin: Boolean): Array[Byte] = {
    val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rr = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val gg = ((id * 17 + x * 11 + y * 3) % 256).toInt
        val bb = ((id * 23 + x * 5 + y * 19) % 256).toInt
        img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
        x += 1
      }
      y += 1
    }
    if (whiteOrigin) img.setRGB(0, 0, 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  def packSyntheticImages(ids: DataFrame, idCol: String, format: String = "png"): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no disk-backed streams
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, "image", synthImageBytes(id, format, whiteOrigin = false), null)
        }
      }(enc)
  }

  /** Near-duplicate plants for the perceptual-hash tier: the SAME
    * synthetic image as `id` (same dims, same pixels) with ONE pixel
    * (the origin) blown to white, published under `id + offset` — the
    * "re-encoded with a watermark/logo tweak" case an image dedup
    * pass must catch that exact byte hashing never will. */
  def packSyntheticImagesMutated(
      ids: DataFrame, idCol: String, offset: Long = 100000L,
      format: String = "png"): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          Row(id + offset, "image", synthImageBytes(id, format, whiteOrigin = true), null)
        }
      }(enc)
  }

  /** Perceptual difference-hash (dHash) of DECODED images: 9×8
    * nearest-neighbor downsample of the integer luma (299R+587G+114B,
    * ×1000 scale — no float anywhere), bit k = gy·8+gx set iff
    * gray(gx, gy) > gray(gx+1, gy); 64 bits out. Robust to uniform
    * brightness shifts and re-encoding by construction (only
    * NEIGHBOR COMPARISONS survive into the hash) — the image twin of
    * the text SimHash tier, and feeds the same banded-hamming pair
    * join ([[Dedup.simhashNearDupPairs]] with bits = 64).
    *
    * Runs through the real codec path (ImageIO decode) per row inside
    * mapPartitions — the Multimodal exception to the zero-UDF rule:
    * codecs are JVM library calls, not expressible as Catalyst
    * expressions. Map-only; the hash is 8 bytes per image no matter
    * the source resolution, which is the whole scale story. */
  def imageDHash(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false))))
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val w = img.getWidth; val h = img.getHeight
          def gray(gx: Int, gy: Int): Long = {
            val px = img.getRGB(gx * w / 9, gy * h / 8)
            299L * ((px >> 16) & 0xFF) + 587L * ((px >> 8) & 0xFF) + 114L * (px & 0xFF)
          }
          var hash = 0L
          var gy = 0
          while (gy < 8) {
            var gx = 0
            while (gx < 8) {
              if (gray(gx, gy) > gray(gx + 1, gy)) hash |= 1L << (gy * 8 + gx)
              gx += 1
            }
            gy += 1
          }
          Row(id, hash)
        }
      }(enc)
  }

  /** Pack a text column as a UTF-8 binary payload — stand-in for real
    * media bytes in the fixtures. */
  def packText(df: DataFrame, idCol: String, textCol: String, modality: String = "text"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      encode(col(textCol), "UTF-8").cast("binary").as("content"),
      lit(null).cast("string").as("source"))

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  /** Resize/transcode a payload to a byte budget. STUB transform:
    * deterministic truncation + 4-byte length header (a real codec
    * would decode, scale, re-encode); partition-local like decode. */
  def resize(media: DataFrame, maxBytes: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(resizedSchema)
    media.select(col("media_id"), col("modality"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val content = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          if (content == null) Row(r.getLong(0), r.getString(1), null, 0L)
          else {
            val out = java.nio.ByteBuffer.allocate(4 + math.min(content.length, maxBytes))
            out.putInt(content.length) // original size header
            out.put(content, 0, math.min(content.length, maxBytes))
            val bytes = out.array()
            Row(r.getLong(0), r.getString(1), bytes, bytes.length.toLong)
          }
        }
      }(enc)
  }

  /** Sample `n` evenly-spaced "frames" from a payload. STUB: fixed-size
    * byte windows at even offsets (a real impl seeks keyframes); the
    * exploded one-row-per-frame shape and frame indices are real. */
  def frameSample(media: DataFrame, n: Int, frameBytes: Int = 16): DataFrame = {
    val frameSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select(col("media_id"), col("content"))
      .filter(col("content").isNotNull)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val content = r.getAs[Array[Byte]](1)
          val step = math.max(1, content.length / math.max(1, n))
          (0 until n).iterator
            .map(i => (i, math.min(i.toLong * step, math.max(0, content.length - 1))))
            .map { case (i, off) =>
              val end = math.min(content.length, off.toInt + frameBytes)
              Row(r.getLong(0), i, off, java.util.Arrays.copyOfRange(content, off.toInt, end))
            }
        }
      }(enc)
  }

  /** Decode + feature-extract every payload. Decoder is initialized
    * once per partition; null payloads pass through with null features. */
  def extractFeatures(media: DataFrame, decoder: Decoder = StubDecoder): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("modality"), col("content"))
      .mapPartitions { rows =>
        // per-partition decoder init happens here (once), not per row
        val d = decoder
        rows.map { r =>
          val id = r.getLong(0)
          val modality = r.getString(1)
          val content = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          if (content == null) Row(id, modality, 0L, 0L, null)
          else {
            var sum = 0L; var i = 0
            while (i < content.length) { sum += (content(i) & 0xff); i += 1 }
            Row(id, modality, content.length.toLong, sum % 65521L,
              d.decode(modality, content).toSeq)
          }
        }
      }(enc)
  }
}
