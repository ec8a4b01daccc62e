package graft.index

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persistence + distributed-build coverage: create/load round-trip
  * (reference create_index/load_index/save_index), bulk graph build
  * (north-star path), snapshot-versioned insert/delete batches, and
  * the serving engine materialized from a snapshot. */
class VectorIndexSpec extends SparkSpec {

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("create / load round-trip preserves metadata incl. metric (Q6 fix)") {
    val path = tmpDir("idx-create")
    val idx = VectorIndex.create(spark, path, dim = 8, maxDegree = 16, metric = Metric.Cosine)
    assert(idx.meta.numPoints == 0)
    val re = VectorIndex.load(spark, path)
    assert(re.meta.dim == 8)
    assert(re.meta.maxDegree == 16)
    assert(re.meta.metric == "cosine")
    assert(re.meta.entrypoint == -1)
    assert(re.vectors.count() == 0)
  }

  test("eltype whitelist rejects junk (Q8 fix)") {
    assertThrows[IllegalArgumentException](
      IndexMeta(0, 0, 4, 16, -1, "System.exit(1)", "euclidean", Nil))
    assertThrows[IllegalArgumentException](
      IndexMeta(0, 0, 4, 16, -1, "Float32", "no-such-metric", Nil))
  }

  test("searchExact filter + rangeSearchExact on the distributed exact tier") {
    val path = tmpDir("idx-exact-fr")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    val all = embeddings.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val byId = all.toMap
    val queries = embeddings.filter(col("id") === 0L)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    // filtered: even internal ids only
    val got = idx.searchExact(queries, topk = 5, filter = col("id") % 2 === 0)
      .select(col("public_id")).collect().map(_.getLong(0))
    assert(got.forall(pid => (pid - 1) % 2 == 0))
    val truth = all.filter(_._1 % 2 == 0)
      .map { case (i, v) => (Metric.Euclidean.dist(byId(0L), v), i + 1) }
      .sortBy { case (dd, pid) => (dd, pid) }.take(5).map(_._2)
    assert(got.toSeq == truth.toSeq)
    // range: exactly the within-radius set, nearest first
    val radius = 1.3
    val hits = idx.rangeSearchExact(queries, radius)
      .select(col("public_id"), col("dist")).collect()
    val expect = all.map { case (i, v) => (Metric.Euclidean.dist(byId(0L), v), i + 1) }
      .filter(_._1 <= radius).sortBy { case (dd, pid) => (dd, pid) }.map(_._2)
    assert(hits.map(_.getLong(0)).toSeq == expect.toSeq)
    assert(hits.forall(_.getDouble(1) <= radius))
  }

  test("bulk build over embeddings fixture: graph invariants + serving recall") {
    val path = tmpDir("idx-build")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    assert(idx.meta.numPoints == 500)
    val adj = idx.adjacency
    assert(adj.count() == 500)
    // degree bound holds everywhere
    assert(adj.filter(size(col("nbrs")) > 16).count() == 0)
    // no self-loops
    assert(adj.filter(array_contains(col("nbrs"), col("id"))).count() == 0)
    // serving search: recall vs exact brute force
    val serving = idx.toServing
    val all = embeddings.collect().map(r => (r.getLong(0) + 1L, r.getSeq[Float](1).toArray))
    val rng = new Random(1)
    val queries = rng.shuffle(all.toList).take(20)
    val recalls = queries.map { case (_, q) =>
      val truth = all.sortBy { case (id, v) => (Metric.Euclidean.dist(q, v), id) }
        .take(10).map(_._1).toSet
      val got = serving.search(q, topk = 10).map(_._2).toSet
      truth.intersect(got).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    info(f"bulk-built graph serving recall@10 = $avg%.3f")
    assert(avg >= 0.70)
  }

  test("searchExact returns recall-1.0 results with keys and 1-based ids") {
    val path = tmpDir("idx-exact")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 8)
    val q = embeddings.filter(col("id") === 0)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val res = idx.searchExact(q, topk = 5).orderBy(col("rnk")).collect()
    assert(res.length == 5)
    assert(res.head.getLong(1) == 1L) // nearest to itself, public id = 1
    assert(res.head.getString(2) == "1") // auto key
    assert(res.head.getDouble(3) == 0.0)
  }

  test("insertBatch and deleteBatch commit new snapshot versions") {
    val path = tmpDir("idx-mut")
    val small = embeddings.filter(col("id") < 50)
    val idx = VectorIndex.build(spark, path, small, dim = 64, maxDegree = 8)
    assert(idx.meta.version == 0)

    val newVecs = embeddings.filter(col("id").between(50, 54))
      .select(concat(lit("new_"), col("id")).as("key"), col("vec"))
    val v1 = idx.insertBatch(newVecs)
    assert(v1.meta.version == 1)
    assert(v1.meta.numPoints == 55)
    assert(v1.vectors.count() == 55)
    // inserted vector findable at dist 0 with its key
    val qv = embeddings.filter(col("id") === 52)
      .select(lit(52L).as("query_id"), col("vec").as("qvec"))
    val hit = v1.searchExact(qv, topk = 1).collect().head
    assert(hit.getString(2).startsWith("new_"))
    assert(hit.getDouble(3) == 0.0)

    val v2 = v1.deleteBatch(Seq(1L, 2L))
    assert(v2.meta.version == 2)
    assert(v2.meta.numPoints == 53)
    assert(v2.vectors.filter(col("id").isin(0L, 1L)).count() == 0)
    // victims stripped from every adjacency list
    assert(v2.adjacency.filter(
      array_contains(col("nbrs"), 0L) || array_contains(col("nbrs"), 1L)).count() == 0)
    // old snapshot still on disk (versioned, never disturbed)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/v=0/vectors")))
    // reload sees latest version
    assert(VectorIndex.load(spark, path).meta.version == 2)
  }

  test("time travel: loadVersion serves historical snapshots; history tracks loadability past vacuum") {
    val path = tmpDir("idx-tt")
    val v0 = VectorIndex.build(spark, path,
      embeddings.filter(col("id") < 30), dim = 64, maxDegree = 8)
    val v1 = v0.insertBatch(embeddings.filter(col("id").between(30, 34))
      .select(concat(lit("n_"), col("id")).as("key"), col("vec")))
    val v2 = v1.deleteBatch(Seq(1L, 2L))
    assert(v2.meta.numPoints == 33)
    // full timeline recorded, all loadable
    val h = VectorIndex.history(path)
    assert(h.map(e => (e._1, e._2, e._4)) ==
      Seq((0L, 30L, true), (1L, 35L, true), (2L, 33L, true)), s"got $h")
    // a historical load serves the OLD state: counts and search
    val old = VectorIndex.loadVersion(spark, path, 1L)
    assert(old.meta.numPoints == 35 && old.vectors.count() == 35)
    val q = embeddings.filter(col("id") === 0)
      .select(lit(0L).as("query_id"), col("vec").as("qvec"))
    // ids 1,2 (public) deleted in v2 still resolve in the v1 snapshot
    assert(old.vectors.filter(col("id").isin(0L, 1L)).count() == 2)
    assert(old.searchExact(q, topk = 1).collect().head.getDouble(3) == 0.0)
    // diff across time-travel handles: v2 vs v1 shows exactly the
    // deletes, as the public ids deleteBatch consumed
    val d = v2.diff(old).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d == Set((1L, "deleted"), (2L, "deleted")), s"got $d")
    // unknown version refuses with a clear message
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.loadVersion(spark, path, 99L)
    }
    assert(ex.getMessage.contains("meta-v=99"))
    // compaction + vacuum reap old segments: history flags versions
    // whose segments are gone, and loading one fails at load time
    val compacted = v2.compact()
    assert(compacted.vacuum() > 0)
    val h2 = VectorIndex.history(path)
    assert(h2.exists(e => !e._4) && h2.last._4, s"got $h2")
    intercept[IllegalArgumentException] {
      VectorIndex.loadVersion(spark, path, h2.find(!_._4).get._1)
    }
  }

  test("rollback restores historical content as a NEW commit; reload and diff agree") {
    val path = tmpDir("idx-rb")
    val v0 = VectorIndex.build(spark, path,
      embeddings.filter(col("id") < 25), dim = 64, maxDegree = 8)
    val v1 = v0.deleteBatch(Seq(5L, 6L, 7L))
    assert(v1.meta.numPoints == 22)
    val rb = v1.rollback(0L)
    // append-only timeline: the restore is version 2 with v0's content
    assert(rb.meta.version == 2 && rb.meta.numPoints == 25)
    assert(rb.vectors.count() == 25)
    assert(rb.diff(v0).isEmpty) // content-identical to the target
    // the deletes reappear relative to v1
    val d = rb.diff(v1).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d == Set((5L, "inserted"), (6L, "inserted"), (7L, "inserted")), s"got $d")
    // a fresh load sees the restored state; history records all three
    assert(VectorIndex.load(spark, path).meta.numPoints == 25)
    assert(VectorIndex.history(path).map(e => (e._1, e._2)) ==
      Seq((0L, 25L), (1L, 22L), (2L, 25L)))
    // can't roll forward (checked from the live head — a genuine
    // forward target refuses as an argument error)
    intercept[IllegalArgumentException] { rb.rollback(5L) }
    // a STALE handle refuses before even validating the target:
    // committing from v0 would rewrite version-1 history
    intercept[IllegalStateException] { v0.rollback(2L) }
  }

  test("healthReport: fresh build is one fully-reachable component; survives deletes") {
    val path = tmpDir("idx-health")
    val idx = VectorIndex.build(spark, path,
      embeddings.filter(col("id") < 40), dim = 64, maxDegree = 8)
    val h = idx.healthReport().head()
    assert(h.getAs[Long]("n_live") == 40L)
    assert(h.getAs[Long]("n_components") == 1L, s"got $h")
    assert(h.getAs[Double]("reachable_frac") == 1.0, s"got $h")
    assert(h.getAs[Long]("max_degree") <= 8L, s"got $h")
    assert(h.getAs[Long]("min_degree") >= 1L, s"got $h")
    assert(h.getAs[Long]("n_dangling") == 0L, s"got $h")
    // ring repair keeps the survivors one component after deletes
    val h2 = idx.deleteBatch(Seq(1L, 5L, 9L)).healthReport().head()
    assert(h2.getAs[Long]("n_live") == 37L)
    assert(h2.getAs[Long]("n_components") == 1L, s"got $h2")
    assert(h2.getAs[Double]("reachable_frac") == 1.0, s"got $h2")
    // Q3: kNN edges to deleted slots are deliberately NOT repaired
    // (only the ring is) — the deleted ids may linger as dangling
    // endpoints, and the report must surface rather than fold them
    assert(h2.getAs[Long]("n_dangling") <= 3L, s"got $h2")
  }

  test("diff tags inserted/deleted/rekeyed between snapshots; slot reuse reports rekeyed") {
    val path = tmpDir("idx-diff")
    val v0 = VectorIndex.build(spark, path,
      embeddings.filter(col("id") < 20), dim = 64, maxDegree = 8)
    // delete public ids 3,4 then insert two rows: LIFO freelist reuses
    // the freed slots under NEW keys
    val v1 = v0.deleteBatch(Seq(3L, 4L))
    val v2 = v1.insertBatch(embeddings.filter(col("id").between(20, 21))
      .select(concat(lit("fresh_"), col("id")).as("key"), col("vec")))
    val d = v2.diff(v0).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    // slots 2,3 (public 3,4) freed then refilled -> rekeyed, not insert+delete
    assert(d.keySet == Set(3L, 4L), s"got $d")
    assert(d.values.forall(_._1 == "rekeyed"), s"got $d")
    assert(d.values.map(_._3).forall(_.startsWith("fresh_")), s"got $d")
    // versus the intermediate snapshot the same slots are pure inserts
    val d10 = v1.diff(v0).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d10 == Set((3L, "deleted"), (4L, "deleted")), s"got $d10")
    val d21 = v2.diff(v1).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d21 == Set((3L, "inserted"), (4L, "inserted")), s"got $d21")
    // no-op diff is empty
    assert(v2.diff(v2).isEmpty)
  }

  test("merge folds another index's live vectors in; guards dims/metric/key collisions") {
    val pa = tmpDir("idx-merge-a"); val pb = tmpDir("idx-merge-b")
    val a = VectorIndex.build(spark, pa,
      embeddings.filter(col("id") < 30)
        .select(col("id"), concat(lit("a_"), col("id")).as("key"), col("vec")),
      dim = 64, maxDegree = 8)
    val bSrc = embeddings.filter(col("id").between(30, 49))
    val b0 = VectorIndex.build(spark, pb,
      bSrc.select((col("id") - 30L).as("id"),
        concat(lit("b_"), col("id")).as("key"), col("vec")),
      dim = 64, maxDegree = 8)
    // a deleted row in `other` must NOT cross the merge (public id 1 =
    // internal 0 = embedding 30)
    val b = b0.deleteBatch(Seq(1L))
    val merged = a.merge(b)
    assert(merged.meta.numPoints == 49 && merged.vectors.count() == 49)
    // a vector from each side is findable at dist 0 under its own key
    val q = embeddings.filter(col("id").isin(5L, 40L))
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val hits = merged.searchExact(q, topk = 1).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(hits(5L) == "a_5" && hits(40L) == "b_40", s"got $hits")
    // reload serves the merged snapshot
    assert(VectorIndex.load(spark, pa).vectors.count() == 49)
    // colliding key sets refuse (merged still holds b_* keys)
    intercept[IllegalArgumentException] { merged.merge(b) }
    // dim mismatch refuses
    val p4 = tmpDir("idx-merge-4d")
    val tiny = VectorIndex.build(spark, p4,
      embeddings.filter(col("id") < 3).select(col("id"),
        concat(lit("t_"), col("id")).as("key"), slice(col("vec"), 1, 4).as("vec")),
      dim = 4, maxDegree = 4)
    intercept[IllegalArgumentException] { merged.merge(tiny) }
  }

  test("merge: null keys never reach the disjointness guard (Q2 auto-key invariant); colliding auto-keys refuse") {
    val pa = tmpDir("idx-merge-null-a"); val pb = tmpDir("idx-merge-null-b")
    // every other row unkeyed in the SOURCE on both sides — the engine
    // auto-keys them at build (Q2), so the NULL-blind equi-join guard
    // can never be bypassed by anonymous rows
    def src(lo: Long, hi: Long, tag: String) =
      embeddings.filter(col("id").between(lo, hi))
        .select((col("id") - lo).as("id"),
          when(col("id") % 2 === 0, concat(lit(tag), col("id"))).as("key"),
          col("vec"))
    val a = VectorIndex.build(spark, pa, src(0, 19, "a_"), dim = 64, maxDegree = 8)
    val b = VectorIndex.build(spark, pb, src(20, 39, "b_"), dim = 64, maxDegree = 8)
    assert(a.vectors.filter(col("key").isNull).count() == 0)
    assert(b.vectors.filter(col("key").isNull).count() == 0)
    // the auto-keyed halves carry the SAME synthetic keys on both
    // sides ("2", "4", ...) — index-local identities must refuse to
    // merge, not silently double-ingest
    val ex = intercept[IllegalArgumentException] { a.merge(b) }
    assert(ex.getMessage.contains("disjoint"), ex.getMessage)
  }

  test("stale-handle commit refuses instead of rewriting immutable history (append-only meta-v=N)") {
    val path = tmpDir("idx-stale")
    val v0 = VectorIndex.build(spark, path,
      embeddings.filter(col("id") < 20), dim = 64, maxDegree = 8)
    val batch = embeddings.filter(col("id").between(20, 24))
      .select(concat(lit("n_"), col("id")).as("key"), col("vec"))
    val v1 = v0.insertBatch(batch)
    assert(v1.meta.version == 1)
    // committing again from the STALE v0 handle would recompute
    // version 1 and silently rewrite meta-v=1.json — must refuse
    val ex = intercept[IllegalStateException] { v0.insertBatch(batch) }
    assert(ex.getMessage.contains("stale"), ex.getMessage)
    val ex2 = intercept[IllegalStateException] { v0.deleteBatch(Seq(1L)) }
    assert(ex2.getMessage.contains("stale"), ex2.getMessage)
    // the live head is untouched and still serves
    val reloaded = VectorIndex.load(spark, path)
    assert(reloaded.meta.version == 1 && reloaded.vectors.count() == 25)
    // history remains exactly the two real commits
    assert(VectorIndex.history(path).map(_._1) == Seq(0L, 1L))
  }

  test("commitServing persists an online-mutated index (streaming analog)") {
    val path = tmpDir("idx-serve")
    val idx = VectorIndex.build(spark, path, embeddings.filter(col("id") < 20), dim = 64, maxDegree = 8)
    val s = idx.toServing
    assert(s.numPoints == 20)
    val v = Array.fill(64)(0.5f)
    val (k, id) = s.insert(v, Some("online_1"))
    assert(k == "online_1" && id == 21L)
    s.delete(1L)
    val idx2 = idx.commitServing(s)
    assert(idx2.meta.numPoints == 20)
    val s2 = idx2.toServing
    assert(s2.embeddingByKey("online_1").sameElements(v))
    assertThrows[IllegalArgumentException](s2.embeddingById(1L))
    // freed slot recycles on next online insert (freelist round-trip)
    val (_, reused) = s2.insert(Array.fill(64)(0.1f))
    assert(reused == 1L)
  }

  test("LSH-bucketed graph build meets the recall gate (scale path)") {
    val path = tmpDir("idx-lsh")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64,
      maxDegree = 16, exactThreshold = 10L) // force LSH path
    val serving = idx.toServing
    val all = embeddings.collect().map(r => (r.getLong(0) + 1L, r.getSeq[Float](1).toArray))
    val rng = new Random(1)
    val queries = rng.shuffle(all.toList).take(10)
    val recalls = queries.map { case (_, q) =>
      val truth = all.sortBy { case (id, v) => (Metric.Euclidean.dist(q, v), id) }
        .take(10).map(_._1).toSet
      val got = serving.search(q, topk = 10).map(_._2).toSet
      truth.intersect(got).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    info(f"LSH-built graph serving recall@10 = $avg%.3f")
    assert(avg >= 0.70)
  }

  test("eltype parametrization: Float64/Float16 accepted, stored widened, " +
      "round-trip within reference tolerances (runtests.jl:552-638)") {
    val ss = spark
    import ss.implicits._
    // Float64 source: doubles narrow to Float32 storage; the reference's
    // own Float64 round-trip asserts atol 1e-7 — Float32 gives ~1e-7
    // relative precision, the documented narrowing divergence.
    val doubles = Seq((0L, Seq(0.123456789012345, 0.987654321098765, 0.5, 0.25)))
      .toDF("id", "dvec")
    val src = doubles.select(col("id"), col("dvec").cast("array<float>").as("vec"))
    val path = tmpDir("idx-eltype")
    val idx = VectorIndex.build(spark, path, src, dim = 4, maxDegree = 4, eltype = "Float64")
    assert(VectorIndex.load(spark, path).meta.eltype == "Float64")
    val got = idx.toServing.embeddingById(1L)
    val want = Seq(0.123456789012345, 0.987654321098765, 0.5, 0.25)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 1e-7 * math.max(1.0, math.abs(w)))
    }
    // Float16-representable inputs round-trip exactly through the
    // binary16-packed storage
    val idx16 = VectorIndex.build(spark, tmpDir("idx-f16"),
      Seq((0L, Seq(1.5f, -0.25f, 0f, 2f))).toDF("id", "vec"),
      dim = 4, maxDegree = 4, eltype = "Float16")
    assert(idx16.meta.eltype == "Float16")
    assert(idx16.toServing.embeddingById(1L).sameElements(Array(1.5f, -0.25f, 0f, 2f)))
  }

  test("Float16 indexes store binary16-packed vectors: half the bytes, " +
      "reference tolerance round-trip (runtests.jl:611-638), mutations compose") {
    import graft.functions.expressions.Half
    val subset = embeddings.filter(col("id") < 200)
    val p16 = tmpDir("idx-half")
    val p32 = tmpDir("idx-full")
    val idx16 = VectorIndex.build(spark, p16, subset, dim = 64, maxDegree = 8, eltype = "Float16")
    VectorIndex.build(spark, p32, subset, dim = 64, maxDegree = 8)
    // storage parity: the packed vectors table is substantially smaller
    // (2 vs 4 bytes per component; parquet framing overhead is shared)
    val b16 = dirBytes(s"$p16/v=0/vectors")
    val b32 = dirBytes(s"$p32/v=0/vectors")
    info(s"vectors table: Float16=$b16 bytes vs Float32=$b32 bytes")
    assert(b16 < (b32 * 3) / 4, s"binary16 packing not smaller: $b16 vs $b32")
    // round-trip within half precision (reference atol 1e-2 on [0,1)
    // data; binary16 is far tighter: rel 2^-11), and exactly the
    // scalar quantization
    val want = subset.filter(col("id") === 7).head().getSeq[Float](1).toArray
    val got = idx16.toServing.embeddingById(8L)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 1e-2)
      assert(g == Half.halfBitsToFloat(Half.floatToHalfBits(w)))
    }
    // search serves the quantized values with intact recall on self-query
    val hit = idx16.toServing.search(want, topk = 1).head
    assert(hit._2 == 8L)
    // delta mutations keep the packed form end-to-end
    val batch = embeddings.filter(col("id").between(300, 304))
      .select(concat(lit("h_"), col("id")).as("key"), col("vec"))
    val v1 = idx16.insertBatch(batch)
    assert(v1.meta.numPoints == 205)
    val probe = embeddings.filter(col("id") === 302).head().getSeq[Float](1).toArray
    val found = v1.toServing.search(probe, topk = 3).flatMap(_._1)
    assert(found.contains("h_302"), s"half-packed insert not found: $found")
    assert(v1.deleteBatch(Seq(8L)).vectors.count() == 204)
  }

  test("regression: delete highest id, then serving insert reuses its slot (no crash)") {
    val path = tmpDir("idx-highdel")
    val idx = VectorIndex.build(spark, path, embeddings.filter(col("id") < 10), dim = 64, maxDegree = 4)
    val v1 = idx.deleteBatch(Seq(10L)) // highest public id -> freelist slot 9
    val s = v1.toServing
    assert(s.numPoints == 9)
    val (_, reused) = s.insert(Array.fill(64)(0.25f)) // must not throw
    assert(reused == 10L) // recycled the freed slot
  }

  test("regression: double delete does not duplicate freelist entries") {
    val path = tmpDir("idx-dbldel")
    val idx = VectorIndex.build(spark, path, embeddings.filter(col("id") < 10), dim = 64, maxDegree = 4)
    val v1 = idx.deleteBatch(Seq(5L))
    val v2 = v1.deleteBatch(Seq(5L)) // retry / overlap
    assert(v2.meta.freelist.count(_ == 4) == 1)
    assert(v2.meta.numPoints == 9)
    val s = v2.toServing
    val (_, r1) = s.insert(Array.fill(64)(0.1f))
    val (_, r2) = s.insert(Array.fill(64)(0.2f))
    assert(r1 == 5L && r2 == 11L) // one recycle, then append
  }

  test("regression: insertBatch recycles freed slots and never collides with them") {
    val ss = spark
    import ss.implicits._
    val path = tmpDir("idx-recycle")
    val idx = VectorIndex.build(spark, path, embeddings.filter(col("id") < 10), dim = 64, maxDegree = 4)
    val v1 = idx.deleteBatch(Seq(10L)) // frees internal 9 (the max id)
    val batch = embeddings.filter(col("id").between(20, 22))
      .select(concat(lit("nb_"), col("id")).as("key"), col("vec"))
    val v2 = v1.insertBatch(batch)
    assert(v2.meta.numPoints == 12)
    // freed slot 9 was recycled; fresh ids start past every id ever used
    val ids = v2.vectors.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids.contains(9L))
    assert(ids.size == 12) // no collisions
    assert(v2.meta.freelist.isEmpty)
    val s = v2.toServing
    assert(s.numPoints == 12)
  }

  test("regression: insertBatch preserves the ring connectivity backbone") {
    val path = tmpDir("idx-ringkeep")
    val idx = VectorIndex.build(spark, path, embeddings.filter(col("id") < 30), dim = 64, maxDegree = 6)
    val batch = embeddings.filter(col("id").between(30, 34))
      .select(col("id").cast("string").as("key"), col("vec"))
    val v1 = idx.insertBatch(batch)
    // every node keeps its ring successor or predecessor (id-sorted order)
    val adj = v1.adjacency.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val sorted = adj.keys.toSeq.sorted
    val n = sorted.length
    val missing = sorted.indices.filterNot { i =>
      val succ = sorted((i + 1) % n); val prev = sorted((i - 1 + n) % n)
      adj(sorted(i)).contains(succ) || adj(sorted(i)).contains(prev)
    }
    assert(missing.isEmpty, s"nodes without ring edges: ${missing.map(sorted)}")
  }

  test("regression: delete-all + smaller insert re-elects a LIVE entrypoint") {
    val path = tmpDir("idx-entry")
    val idx = VectorIndex.build(spark, path, embeddings.filter(col("id") < 10), dim = 64, maxDegree = 6)
    // delete id 1 first so internal slot 0 sits at the BOTTOM of the
    // freelist, then the rest: LIFO recycling of a smaller batch will
    // NOT reuse slot 0 — the old hardcoded entrypoint=0 was a dead slot
    val v1 = idx.deleteBatch(Seq(1L))
    val v2 = v1.deleteBatch(2L to 10L)
    assert(v2.meta.entrypoint == -1)
    assert(v2.vectors.count() == 0)
    val batch = embeddings.filter(col("id").between(20, 22))
      .select(col("id").cast("string").as("key"), col("vec"))
    val v3 = v2.insertBatch(batch)
    val live = v3.vectors.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(v3.meta.entrypoint >= 0)
    assert(live.contains(v3.meta.entrypoint.toLong),
      s"entrypoint ${v3.meta.entrypoint} not live (live=$live)")
    // the distributed beam search must seed and return results
    val queries = v3.vectors.limit(2)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val res = DistributedSearch.beamSearch(v3, queries, topk = 2)
    assert(res.count() == 4)
  }

  private def dirBytes(p: String): Long = {
    import java.nio.file.{Files, Path, Paths}
    val root = Paths.get(p)
    if (!Files.exists(root)) 0L
    else {
      val s = Files.walk(root)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }
  }

  test("insertBatch commits O(batch) bytes — a delta segment, not a table rewrite") {
    val path = tmpDir("idx-delta")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    val baseBytes = dirBytes(s"$path/v=0")
    val batch = embeddings.filter(col("id") < 5)
      .select(concat(lit("d_"), col("id")).as("key"), col("vec"))
    val v1 = idx.insertBatch(batch)
    assert(v1.meta.segments == Seq(0L, 1L))
    val deltaBytes = dirBytes(s"$path/v=1")
    info(s"base=$baseBytes bytes, delta=$deltaBytes bytes")
    // 5 rows into 500: the delta must be a small fraction of the base
    // (parquet per-file overhead keeps it from being 1%)
    assert(deltaBytes < baseBytes / 3,
      s"delta segment $deltaBytes bytes is not O(batch) vs base $baseBytes")
    // the delta holds only the batch + touched rows, not the table
    val deltaVecRows = spark.read.schema(VectorIndex.vectorsSchema)
      .parquet(s"$path/v=1/vectors").count()
    assert(deltaVecRows == 5)
    val deltaGraphRows = spark.read.schema(VectorIndex.graphSchema)
      .parquet(s"$path/v=1/graph").count()
    assert(deltaGraphRows <= 5 * (2 * 16 + 1), s"graph delta $deltaGraphRows rows not bounded by batch·degree")
    // resolved state is correct and searchable
    assert(v1.vectors.count() == 505)
    val qv = embeddings.filter(col("id") === 2)
      .select(lit(2L).as("query_id"), col("vec").as("qvec"))
    val hit = v1.searchExact(qv, topk = 1).collect().head
    assert(hit.getDouble(3) == 0.0)
    // deletes are delta-sized too (tombstones + repaired referrers)
    val v2 = v1.deleteBatch(Seq(1L, 2L, 3L))
    assert(dirBytes(s"$path/v=2") < baseBytes / 3)
    assert(v2.vectors.count() == 502)
    // multi-segment READS must not shuffle the base: small deltas are
    // resolved via a broadcast anti-join on the displaced ids, so the
    // base scan stays map-side (no SortMergeJoin / base-side Exchange
    // feeding a groupBy(id) over the whole index)
    val plan = v2.vectors.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"multi-segment resolve should broadcast-anti-join the deltas:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "multi-segment resolve must not shuffle the base for small deltas")
  }

  test("segments compact back to one past the threshold; state survives") {
    val path = tmpDir("idx-compact")
    var idx = VectorIndex.build(spark, path, embeddings.filter(col("id") < 40), dim = 64, maxDegree = 8)
    // 8 mutations: the 8th commit crosses MaxSegments=8 and compacts
    (0 until 8).foreach { i =>
      val b = embeddings.filter(col("id") === (50 + i).toLong)
        .select(concat(lit("c_"), col("id")).as("key"), col("vec"))
      idx = idx.insertBatch(b)
    }
    assert(idx.meta.segments.length == 1, s"expected compaction, got ${idx.meta.segments}")
    assert(idx.meta.numPoints == 48)
    assert(idx.vectors.count() == 48)
    // reload resolves the compacted layout
    val re = VectorIndex.load(spark, path)
    assert(re.vectors.count() == 48)
    assert(re.toServing.numPoints == 48)
    // ring survives compaction: every node keeps a ring edge
    val adj = re.adjacency.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val sorted = adj.keys.toSeq.sorted
    val n = sorted.length
    val missing = sorted.indices.filterNot { i =>
      adj(sorted(i)).contains(sorted((i + 1) % n)) || adj(sorted(i)).contains(sorted((i - 1 + n) % n))
    }
    assert(missing.isEmpty, s"nodes without ring edges after compaction: ${missing.map(sorted)}")
  }

  test("batch wiring above exactThreshold is LSH-bucketed — no crossJoin in the plan") {
    val all = embeddings.select(col("id"), col("vec"))
    val batchIds = embeddings.filter(col("id") >= 495).select(col("id"))
    val edges = GraphBuilder.lshBatchEdges(all, batchIds, k = 8, metric = Metric.Euclidean)
    val plan = edges.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "LSH batch wiring must not cross join")
    // and it actually wires: every batch node gets candidates
    val srcs = edges.select(col("src")).distinct().collect().map(_.getLong(0)).toSet
    assert(srcs == Set(495L, 496L, 497L, 498L, 499L))
    // end-to-end: an index past its exactThreshold takes this path and
    // the inserted vectors are findable
    val path = tmpDir("idx-lshins")
    val idx = VectorIndex.build(spark, path, embeddings.filter(col("id") < 480),
      dim = 64, maxDegree = 16, exactThreshold = 100L)
    val batch = embeddings.filter(col("id").between(480, 489))
      .select(concat(lit("lsh_"), col("id")).as("key"), col("vec"))
    val v1 = idx.insertBatch(batch)
    assert(v1.meta.numPoints == 490)
    val s = v1.toServing
    val probe = embeddings.filter(col("id") === 485).head().getSeq[Float](1).toArray
    val got = s.search(probe, topk = 5).flatMap(_._1)
    assert(got.contains("lsh_485"), s"inserted vector not found via graph search: $got")
  }

  test("beamSearch on an empty index returns an empty, well-typed result") {
    val path = tmpDir("idx-empty-beam")
    val idx = VectorIndex.create(spark, path, dim = 64, maxDegree = 6)
    val queries = embeddings.filter(col("id") < 2)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val res = DistributedSearch.beamSearch(idx, queries, topk = 3)
    assert(res.count() == 0)
    assert(res.columns.toSeq == Seq("query_id", "public_id", "key", "dist", "rnk"))
  }
}
