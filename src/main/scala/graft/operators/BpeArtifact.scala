package graft.operators

import graft.index.{ArtifactStore, Fingerprint, SidecarJson}

/** A learned BPE merge table as a persistent, content-fingerprinted
  * artifact — the tokenizer-lifecycle twin of the IVF/PQ model
  * sidecars ([[graft.index.Ivf]], [[graft.index.Quantization]]).
  *
  * [[TextAnalysis.learnBpeMerges]] fits merges from a corpus
  * generation; a training pipeline then applies that SAME table for
  * the corpus's whole serving life (token counting, sequence packing),
  * across process restarts — a merge table that lives only in a
  * driver-side Seq silently refits (different corpus sample, different
  * table, incompatible token counts) on every cold start, exactly the
  * failure mode the index-model sidecars exist to prevent.
  *
  * Layout under `path/`:
  *   - `bpe-<fingerprint>.json` — immutable content-addressed table
  *   - `bpe.json` — atomic pointer to the current fingerprint
  * Same publish order as VectorIndex meta (content first, then the
  * pointer swap), so the pointer never references a missing table.
  * [[vacuum]] reaps content files the pointer no longer references.
  */
final case class BpeModel(merges: Seq[(String, String)]) {
  /** 64-bit FNV-1a over the rank-ordered rules with unambiguous
    * separators (a rule boundary can never be confused with symbol
    * content). Identity + staleness decisions ride on this. */
  def fingerprint: String =
    Fingerprint.ofString(merges.map { case (l, r) => l + "\u0000" + r }
      .mkString("\u0001"))
}

object BpeArtifact {

  private def contentFile(fp: String) = s"bpe-$fp.json"

  def save(model: BpeModel, path: String): Unit = {
    val store = ArtifactStore.current
    store.createDirs(path)
    val fp = model.fingerprint
    val json =
      s"""{"fingerprint":"$fp",""" +
        s""""left":[${model.merges.map(m => SidecarJson.quote(m._1)).mkString(",")}],""" +
        s""""right":[${model.merges.map(m => SidecarJson.quote(m._2)).mkString(",")}]}"""
    val bytes = json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    store.writeAtomic(s"$path/${contentFile(fp)}", bytes)
    store.writeAtomic(s"$path/bpe.json",
      s"""{"fingerprint":"$fp"}""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Load the CURRENT table (pointer → content). Verifies the loaded
    * rules re-hash to the pointer's fingerprint, so a corrupted or
    * hand-edited content file can never serve silently. */
  def load(path: String): BpeModel = {
    val fp = SidecarJson.read(s"$path/bpe.json").str("fingerprint")
    val file = s"$path/${contentFile(fp)}"
    val j = SidecarJson.read(file)
    val left = j.strList("left"); val right = j.strList("right")
    if (left.length != right.length)
      throw new IllegalArgumentException(
        s"$file: left/right rule arrays disagree (${left.length} vs ${right.length})")
    val model = BpeModel(left.zip(right))
    if (model.fingerprint != fp)
      throw new IllegalArgumentException(
        s"$file: content fingerprint ${model.fingerprint} != pointer $fp " +
          "(corrupted or tampered merge table)")
    model
  }

  /** Remove content-addressed tables the current pointer no longer
    * references; returns the reap count. Safe alongside readers of the
    * CURRENT table (never touches the pointed-at file). */
  def vacuum(path: String): Int = {
    val store = ArtifactStore.current
    if (!store.exists(s"$path/bpe.json")) return 0
    val live = contentFile(SidecarJson.read(s"$path/bpe.json").str("fingerprint"))
    val stale = store.list(path)
      .filter(f => f.startsWith("bpe-") && f.endsWith(".json") && f != live)
    stale.foreach(f => store.deleteTree(s"$path/$f"))
    stale.size
  }
}
