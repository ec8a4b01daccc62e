package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video payloads as
  * opaque `BINARY` columns with typed metadata, and run decode /
  * feature-extraction as partition-local batch operations.
  *
  * The decode step is a STUB (this container has no image/audio
  * codecs): `StubDecoder` produces deterministic byte-statistics
  * "features". Everything AROUND the stub — schema, binary packing,
  * per-partition decoder lifecycle, batch shape, and the declarative
  * metadata path — is real and tested. Swapping `StubDecoder` for a
  * JNI/FFI codec is a one-class change.
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
    * ??? -> replace with a real image/audio codec (not available in
    * this environment); the surrounding plumbing is production-shaped. */
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
