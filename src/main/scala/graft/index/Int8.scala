package graft.index

import java.nio.charset.StandardCharsets

/** Persisted int8 quantization model — the per-dimension max-abs
  * scales [[graft.operators.Similarity.int8Scales]] fits in one corpus
  * pass. Completes the fitted-model lifecycle parity with the IVF/PQ
  * sidecars ([[Ivf]], [[Quantization.save]]) and the BPE merge table
  * ([[graft.operators.BpeArtifact]]): a serving deployment fits ONCE
  * per corpus generation, persists, and every later session loads —
  * re-fitting per process is a full corpus scan per cold start, and a
  * silently re-fit scale set after an append changes every code.
  *
  * Layout under `path/`: immutable content-addressed
  * `int8-<fingerprint>.json` + atomic `int8.json` pointer (content
  * first, then the pointer swap); [[vacuum]] reaps superseded tables.
  * Payload is base64 little-endian doubles, parsed with the real JSON
  * reader ([[SidecarJson]]).
  */
final case class Int8Model(scales: Array[Double]) {
  require(scales.nonEmpty, "int8 model needs at least one dimension")
  def dim: Int = scales.length
  def fingerprint: String = Fingerprint.ofDoubles(scales)
}

object Int8 {

  private def contentFile(fp: String) = s"int8-$fp.json"

  def save(model: Int8Model, path: String): Unit = {
    val store = ArtifactStore.current
    store.createDirs(path)
    val buf = java.nio.ByteBuffer.allocate(model.scales.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    model.scales.foreach(buf.putDouble)
    val b64 = java.util.Base64.getEncoder.encodeToString(buf.array())
    val fp = model.fingerprint
    val json = s"""{"fingerprint":"$fp","dim":${model.dim},"scales":"$b64"}"""
    store.writeAtomic(s"$path/${contentFile(fp)}",
      json.getBytes(StandardCharsets.UTF_8))
    store.writeAtomic(s"$path/int8.json",
      s"""{"fingerprint":"$fp"}""".getBytes(StandardCharsets.UTF_8))
  }

  /** Load the CURRENT model (pointer → content), verifying the decoded
    * scales re-hash to the pointer's fingerprint — a corrupted or
    * hand-edited sidecar can never serve silently. */
  def load(path: String): Int8Model = {
    val fp = SidecarJson.read(s"$path/int8.json").str("fingerprint")
    val file = s"$path/${contentFile(fp)}"
    val j = SidecarJson.read(file)
    val bytes = java.util.Base64.getDecoder.decode(j.str("scales"))
    val dim = j.int("dim")
    if (bytes.length != dim * 8)
      throw new IllegalArgumentException(
        s"$file: payload ${bytes.length} bytes != dim $dim * 8")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val scales = Array.fill(dim)(buf.getDouble())
    val model = Int8Model(scales)
    if (model.fingerprint != fp)
      throw new IllegalArgumentException(
        s"$file: content fingerprint ${model.fingerprint} != pointer $fp " +
          "(corrupted or tampered scales)")
    model
  }

  /** Remove content files the pointer no longer references. */
  def vacuum(path: String): Int = {
    val store = ArtifactStore.current
    if (!store.exists(s"$path/int8.json")) return 0
    val live = contentFile(SidecarJson.read(s"$path/int8.json").str("fingerprint"))
    val stale = store.list(path)
      .filter(f => f.startsWith("int8-") && f.endsWith(".json") && f != live)
    stale.foreach(f => store.deleteTree(s"$path/$f"))
    stale.size
  }
}
