package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Persisted coarse-quantizer (IVF) model — the index-lifecycle twin of
  * [[Quantization.PQModel]]. The reference's create/save/load contract
  * (`/root/reference/src/LMDiskANN.jl:239-306`) covers the whole search
  * artifact; at cluster scale the acceleration tiers (IVF centroids,
  * their per-row assignments, PQ codebooks and codes) are part of that
  * artifact too: they are fit ONCE per corpus generation, served many
  * times, and must survive a process restart without a re-fit — a
  * session-level cache silently refits (new fingerprints, reaped code
  * dirs) on every cold start.
  *
  * `centroids` is flat row-major: centroid `c` occupies
  * `[c*dim, (c+1)*dim)`. `metricName` records the geometry the fit used
  * (cosine fits on L2-normalized vectors); assignment and probe must
  * use the same metric, so it travels with the model.
  */
final case class IvfModel(k: Int, dim: Int, metricName: String, centroids: Array[Float]) {
  require(centroids.length == k * dim,
    s"centroid payload ${centroids.length} != k*dim (${k * dim})")
  Metric.fromName(metricName) // validate eagerly (whitelist, SURVEY Q8)

  def metric: Metric = Metric.fromName(metricName)

  /** (cluster id, centroid) pairs — the driver-side probe input shape
    * ([[Quantization.ivfPqTopK]]). */
  def centroidPairs: Array[(Int, Array[Float])] =
    Array.tabulate(k)(c =>
      c -> java.util.Arrays.copyOfRange(centroids, c * dim, (c + 1) * dim))

  /** Content fingerprint — keys derived per-segment artifacts (the
    * assignment and composite-code dirs) to THIS model, so a re-fit
    * can never serve stale assignments against new centroids (the same
    * scheme as the PQ code dirs). 64-bit ([[Fingerprint]]): identity
    * and staleness decisions ride on this key, so 32 bits of
    * collision resistance was not enough. */
  def fingerprint: String = Fingerprint.ofFloats(centroids)

  /** Directory-name suffix carrying shape + metric + content hash. */
  def suffix: String = s"k$k-$metricName-$fingerprint"
}

/** Sidecar I/O for [[IvfModel]] — same atomic-publish JSON + base64
  * little-endian float payload idiom as [[Quantization.save]], routed
  * through the [[ArtifactStore]] seam. */
object Ivf {

  def save(model: IvfModel, path: String, file: String): Unit = {
    val store = ArtifactStore.current
    store.createDirs(path)
    val buf = java.nio.ByteBuffer.allocate(model.centroids.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    model.centroids.foreach(buf.putFloat)
    val b64 = java.util.Base64.getEncoder.encodeToString(buf.array())
    val json =
      s"""{"k":${model.k},"dim":${model.dim},"metric":"${model.metricName}","centroids":"$b64"}"""
    store.writeAtomic(s"$path/$file", json.getBytes(StandardCharsets.UTF_8))
  }

  /** Load a model saved by [[save]]. Any parse/shape failure — a
    * truncated file, mangled base64, k*dim mismatch — surfaces as one
    * IllegalArgumentException naming the sidecar, not whatever the
    * decoder happened to throw. */
  def load(path: String, file: String): IvfModel =
    try loadUnsafe(path, file)
    catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.startsWith(s"$path/$file") => throw e
      case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"$path/$file: unparseable IVF sidecar (${e.getMessage})", e)
    }

  private def loadUnsafe(path: String, file: String): IvfModel = {
    val j = SidecarJson.read(s"$path/$file")
    val metricName = j.str("metric")
    val bytes = java.util.Base64.getDecoder.decode(j.str("centroids"))
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val cs = new Array[Float](bytes.length / 4)
    var i = 0
    while (i < cs.length) { cs(i) = buf.getFloat(); i += 1 }
    IvfModel(j.int("k"), j.int("dim"), metricName, cs)
  }
}
