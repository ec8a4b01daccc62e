package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Int8 scales as a persistent fingerprinted artifact (the IVF/PQ/BPE
  * lifecycle): fit → save → fresh load serves identical codes; tamper
  * refuses naming the file; vacuum reaps superseded models. */
class Int8ArtifactSpec extends SparkSpec {

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("fit -> save -> load round-trips bit-exact scales; codes identical under the loaded model") {
    val scales = graft.operators.Similarity.int8Scales(embeddings, "vec")
    val model = Int8Model(scales.toArray)
    val dir = tmpDir("int8-artifact")
    Int8.save(model, dir)
    val loaded = Int8.load(dir)
    assert(loaded.scales.toSeq == scales)
    assert(loaded.fingerprint == model.fingerprint)
    val a = embeddings.select(
      graft.operators.Similarity.int8Codes(col("vec"), scales).as("c")).collect()
    val b = embeddings.select(
      graft.operators.Similarity.int8Codes(col("vec"), loaded.scales.toSeq).as("c")).collect()
    assert(a.map(_.getSeq[Int](0)).toSeq == b.map(_.getSeq[Int](0)).toSeq)
  }

  test("tampered content refuses at load with the file named") {
    val dir = tmpDir("int8-tamper")
    val model = Int8Model(Array(1.0, 2.5, 0.0))
    Int8.save(model, dir)
    val content = new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("int8-") && f.getName != "int8.json").get
    val buf = java.nio.ByteBuffer.allocate(3 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(9.0, 9.0, 9.0).foreach(buf.putDouble)
    val b64 = java.util.Base64.getEncoder.encodeToString(buf.array())
    java.nio.file.Files.writeString(content.toPath,
      s"""{"fingerprint":"${model.fingerprint}","dim":3,"scales":"$b64"}""")
    val e = intercept[IllegalArgumentException] { Int8.load(dir) }
    assert(e.getMessage.contains(content.getName), e.getMessage)
  }

  test("vacuum reaps superseded models, keeps the pointer target; empty dir is a no-op") {
    val dir = tmpDir("int8-vacuum")
    assert(Int8.vacuum(dir) == 0)
    val a = Int8Model(Array(1.0))
    val b = Int8Model(Array(2.0))
    Int8.save(a, dir); Int8.save(b, dir)
    assert(Int8.vacuum(dir) == 1)
    assert(Int8.load(dir).scales.toSeq == Seq(2.0))
    assert(Int8.vacuum(dir) == 0)
  }
}
