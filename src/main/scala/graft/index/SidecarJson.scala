package graft.index

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal shared reader for the engine's JSON sidecars (meta.json,
  * the IVF/PQ/int8 model sidecars): a REAL JSON parse — Jackson, which
  * Spark already ships — instead of per-field regex extraction.
  * Regexes silently mis-extract when a later string field happens to
  * contain a `"key":123`-shaped substring, when keys are reordered, or
  * when a value is quoted vs bare; parsing the document ends that bug
  * class. Every failure is an IllegalArgumentException that NAMES the
  * sidecar (the contract the mangled-sidecar specs pin): callers pass
  * the path they read from as `file`.
  */
final class SidecarJson private (val file: String, root: JsonNode) {

  private[index] def rootNode(k: String): JsonNode = node(k)

  private def node(k: String): JsonNode = {
    val n = root.get(k)
    if (n == null || n.isNull)
      throw new IllegalArgumentException(s"$file missing $k")
    n
  }

  def long(k: String): Long = {
    val n = node(k)
    if (!n.canConvertToLong)
      throw new IllegalArgumentException(s"$file field $k is not an integer")
    n.asLong()
  }

  def int(k: String): Int = {
    val v = long(k)
    if (v < Int.MinValue || v > Int.MaxValue)
      throw new IllegalArgumentException(s"$file field $k overflows Int: $v")
    v.toInt
  }

  def str(k: String): String = {
    val n = node(k)
    if (!n.isTextual)
      throw new IllegalArgumentException(s"$file field $k is not a string")
    n.asText()
  }

  def longOpt(k: String, default: Long): Long = {
    val n = root.get(k)
    if (n == null || n.isNull) default
    else if (!n.canConvertToLong)
      throw new IllegalArgumentException(s"$file field $k is not an integer")
    else n.asLong()
  }

  def strList(k: String): Seq[String] = {
    val n = node(k)
    if (!n.isArray)
      throw new IllegalArgumentException(s"$file field $k is not an array")
    (0 until n.size).map { i =>
      val e = n.get(i)
      if (!e.isTextual)
        throw new IllegalArgumentException(s"$file field $k[$i] is not a string")
      e.asText()
    }
  }

  def doubleList(k: String): Seq[Double] = {
    val n = node(k)
    if (!n.isArray)
      throw new IllegalArgumentException(s"$file field $k is not an array")
    (0 until n.size).map { i =>
      val e = n.get(i)
      if (!e.isNumber)
        throw new IllegalArgumentException(s"$file field $k[$i] is not a number")
      e.asDouble()
    }
  }

  /** None when the key is absent; a present non-array throws. */
  def longListOpt(k: String): Option[Seq[Long]] = {
    val n = root.get(k)
    if (n == null || n.isNull) None
    else if (!n.isArray)
      throw new IllegalArgumentException(s"$file field $k is not an array")
    else Some((0 until n.size).map { i =>
      val e = n.get(i)
      if (!e.canConvertToLong)
        throw new IllegalArgumentException(
          s"$file field $k[$i] is not an integer")
      e.asLong()
    })
  }
}

object SidecarJson {
  private val mapper = new ObjectMapper()

  def parse(file: String, json: String): SidecarJson = {
    val root =
      try mapper.readTree(json)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(
            s"$file: invalid JSON (${e.getOriginalMessage})", e)
      }
    if (root == null || !root.isObject)
      throw new IllegalArgumentException(s"$file: not a JSON object")
    new SidecarJson(file, root)
  }

  /** Read + parse via the active [[ArtifactStore]]. */
  def read(path: String): SidecarJson =
    parse(path, new String(ArtifactStore.current.readBytes(path),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Read a rectangular ARRAY-of-ARRAY-of-number field (model
    * matrices: PCA components). Shape validation is the caller's —
    * this only guarantees every cell is numeric. */
  def readMatrix(path: String, k: String): Array[Array[Double]] = {
    val j = read(path)
    val n = j.rootNode(k)
    if (!n.isArray)
      throw new IllegalArgumentException(s"$path field $k is not an array")
    Array.tabulate(n.size) { i =>
      val row = n.get(i)
      if (!row.isArray)
        throw new IllegalArgumentException(s"$path field $k[$i] is not an array")
      Array.tabulate(row.size) { c =>
        val e = row.get(c)
        if (!e.isNumber)
          throw new IllegalArgumentException(s"$path field $k[$i][$c] is not a number")
        e.asDouble()
      }
    }
  }

  /** JSON string literal (quotes + escapes) for sidecar WRITERS whose
    * values come from data (e.g. learned BPE symbols) rather than
    * engine-controlled enums — a corpus symbol containing `"` or `\`
    * must not corrupt the sidecar. */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
