package graft.index

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference test suite's single-node testsets
  * (/root/reference/test/runtests.jl): Minimal (:216-289), Integration
  * (:294-397), Larger-Scale recall (:410-459), scenarios (:536-548),
  * cosine metric (:27-70), parametric behavior (:552-638). Same
  * thresholds (avg recall >= 0.70), seeded determinism. */
class ServingIndexSpec extends AnyFunSuite {

  private def randVec(rng: Random, dim: Int): Array[Float] =
    Array.fill(dim)(rng.nextFloat())

  private def bruteForceTopK(
      vecs: Seq[(Long, Array[Float])], q: Array[Float], k: Int,
      metric: Metric = Metric.Euclidean): Seq[Long] =
    vecs.sortBy { case (id, v) => (metric.dist(q, v), id) }.take(k).map(_._1)

  test("fresh index invariants (runtests.jl:216-231)") {
    val idx = new ServingIndex(dim = 4)
    assert(idx.dim == 4)
    assert(idx.numPoints == 0)
    assert(idx.entrypoint == -1)
    assert(idx.isEmpty)
    assert(idx.search(Array(0f, 0f, 0f, 0f)).isEmpty)
  }

  test("first insert returns public id 1 and auto key \"1\" (runtests.jl:239)") {
    val idx = new ServingIndex(dim = 4)
    val (key, id) = idx.insert(Array(1f, 2f, 3f, 4f))
    assert(id == 1L)
    assert(key == "1")
    assert(idx.entrypoint == 0)
    assert(idx.numPoints == 1)
  }

  test("custom key insert, search, retrieval round-trip (runtests.jl:241-289)") {
    val idx = new ServingIndex(dim = 4)
    val v1 = Array(1f, 2f, 3f, 4f)
    val v2 = Array(9f, 9f, 9f, 9f)
    val (k1, id1) = idx.insert(v1)
    val (k2, id2) = idx.insert(v2, Some("my_key"))
    assert((k1, id1) == ("1", 1L))
    assert((k2, id2) == ("my_key", 2L))
    val res = idx.search(v2, topk = 1)
    assert(res.head == (Some("my_key"), 2L))
    assert(idx.embeddingById(1L).sameElements(v1))
    assert(idx.embeddingByKey("my_key").sameElements(v2))
    assert(idx.idForKey("my_key").contains(2L))
    assert(idx.keyForId(2L).contains("my_key"))
    // delete by key: excluded from search, retrieval errors, survivor found
    assert(idx.deleteByKey("my_key"))
    assert(!idx.deleteByKey("my_key"))
    val res2 = idx.search(v2, topk = 2)
    assert(!res2.exists(_._2 == 2L))
    assertThrows[IllegalArgumentException](idx.embeddingById(2L))
    assertThrows[NoSuchElementException](idx.embeddingByKey("my_key"))
    assert(idx.search(v1, topk = 1).head._2 == 1L)
  }

  test("integration: 10 vectors, alternating keys, delete all (runtests.jl:294-397)") {
    val rng = new Random(1)
    val idx = new ServingIndex(dim = 5)
    val vecs = (1 to 10).map { i =>
      val v = randVec(rng, 5)
      val key = if (i % 2 == 0) Some(s"vec_$i") else None
      val (k, id) = idx.insert(v, key)
      assert(id == i.toLong)
      if (i % 2 == 0) assert(k == s"vec_$i") else assert(k == i.toString)
      (id, k, v)
    }
    // every vector self-findable at topk=3
    vecs.foreach { case (id, _, v) =>
      assert(idx.search(v, topk = 3).exists(_._2 == id))
    }
    // retrieval by id and key
    vecs.foreach { case (id, k, v) =>
      assert(idx.embeddingById(id).sameElements(v))
      assert(idx.embeddingByKey(k).sameElements(v))
    }
    // delete all: odd by ID, even by key
    vecs.foreach { case (id, k, _) =>
      if (id % 2 == 1) idx.delete(id) else assert(idx.deleteByKey(k))
    }
    assert(idx.numPoints == 0)
    assert(idx.entrypoint == -1)
    vecs.foreach { case (id, _, v) =>
      assert(!idx.search(v, topk = 3).exists(_._2 == id))
      assertThrows[IllegalArgumentException](idx.embeddingById(id))
    }
  }

  test("freed slots are recycled LIFO and reused ids carry no stale state (Q1/Q3)") {
    val idx = new ServingIndex(dim = 2)
    (1 to 5).foreach(i => idx.insert(Array(i.toFloat, i.toFloat)))
    idx.delete(3L)
    idx.delete(5L)
    // LIFO: last freed (internal 4) reused first -> public id 5
    val (_, idA) = idx.insert(Array(50f, 50f))
    assert(idA == 5L)
    val (_, idB) = idx.insert(Array(30f, 30f))
    assert(idB == 3L)
    assert(idx.search(Array(50f, 50f), topk = 1).head._2 == 5L)
  }

  test("re-registering a key remaps it (Q7 fixed, divergence documented)") {
    val idx = new ServingIndex(dim = 2)
    idx.insert(Array(1f, 1f), Some("k"))
    idx.insert(Array(9f, 9f), Some("k"))
    assert(idx.idForKey("k").contains(2L))
    assert(idx.keyForId(1L).isEmpty)
    assert(idx.countKeys == 1)
  }

  test("recall@10 > 0.70 on 2000x100 self-queries (runtests.jl:410-459)") {
    val rng = new Random(1)
    val dim = 100
    val idx = new ServingIndex(dim)
    val all = (0 until 2000).map { i => ((i + 1).toLong, randVec(rng, dim)) }
    all.foreach { case (_, v) => idx.insert(v) }
    val queryIds = rng.shuffle(all.indices.toList).take(30)
    val recalls = queryIds.map { qi =>
      val (_, q) = all(qi)
      val truth = bruteForceTopK(all, q, 10).toSet
      val got = idx.search(q, topk = 10).map(_._2).toSet
      truth.intersect(got).size.toDouble / 10.0
    }
    val avg = recalls.sum / recalls.size
    info(f"avg recall@10 = $avg%.3f")
    assert(avg > 0.70)
  }

  test("recall@20 >= 0.70 on 10000x10 (runtests.jl:543-545)") {
    val rng = new Random(1)
    val dim = 10
    val idx = new ServingIndex(dim)
    val all = (0 until 10000).map { i => ((i + 1).toLong, randVec(rng, dim)) }
    all.foreach { case (_, v) => idx.insert(v) }
    val queryIds = rng.shuffle(all.indices.toList).take(10)
    val recalls = queryIds.map { qi =>
      val (_, q) = all(qi)
      val truth = bruteForceTopK(all, q, 20).toSet
      val got = idx.search(q, topk = 20).map(_._2).toSet
      truth.intersect(got).size.toDouble / 20.0
    }
    val avg = recalls.sum / recalls.size
    info(f"avg recall@20 = $avg%.3f")
    assert(avg >= 0.70)
  }

  test("cosine metric end-to-end, recall@10 >= 0.70 on 500x32 (runtests.jl:27-70)") {
    val rng = new Random(1)
    val dim = 32
    val idx = new ServingIndex(dim, metric = Metric.Cosine)
    val all = (0 until 500).map { i => ((i + 1).toLong, randVec(rng, dim)) }
    all.foreach { case (_, v) => idx.insert(v) }
    val queryIds = rng.shuffle(all.indices.toList).take(20)
    val recalls = queryIds.map { qi =>
      val (_, q) = all(qi)
      val truth = bruteForceTopK(all, q, 10, Metric.Cosine).toSet
      val got = idx.search(q, topk = 10).map(_._2).toSet
      truth.intersect(got).size.toDouble / 10.0
    }
    val avg = recalls.sum / recalls.size
    info(f"avg cosine recall@10 = $avg%.3f")
    assert(avg >= 0.70)
  }

  test("dimension mismatch is rejected (schema rigidity, SURVEY §1.3)") {
    val idx = new ServingIndex(dim = 4)
    assertThrows[IllegalArgumentException](idx.insert(Array(1f, 2f)))
    idx.insert(Array(1f, 2f, 3f, 4f))
    assertThrows[IllegalArgumentException](idx.search(Array(1f)))
  }

  test("entrypoint re-election is first-live-ascending (Q4)") {
    val idx = new ServingIndex(dim = 2)
    (1 to 4).foreach(i => idx.insert(Array(i.toFloat, 0f)))
    assert(idx.entrypoint == 0)
    idx.delete(1L)
    assert(idx.entrypoint == 1) // internal id of public 2
    idx.delete(2L)
    assert(idx.entrypoint == 2)
  }

  test("concurrent searches stay safe while one maintenance thread mutates (rw lock)") {
    val idx = new ServingIndex(dim = 8, maxDegree = 8)
    val rng = new scala.util.Random(5)
    (0 until 500).foreach(_ => idx.insert(Array.fill(8)(rng.nextFloat())))
    val error = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val searchers = (0 until 4).map { s =>
      new Thread(() => {
        val r = new scala.util.Random(s)
        try while (!stop.get()) {
          val hits = idx.search(Array.fill(8)(r.nextFloat()), topk = 5)
          assert(hits.size <= 5)
        } catch { case t: Throwable => error.compareAndSet(null, t) }
      })
    }
    searchers.foreach(_.start())
    try {
      // the routerMaintenance shape: ONE writer thread, many readers
      (0 until 300).foreach { i =>
        val (_, pid) = idx.insert(Array.fill(8)(rng.nextFloat()))
        if (i % 3 == 0) idx.delete(pid)
      }
    } finally {
      stop.set(true)
      searchers.foreach(_.join(10000))
    }
    assert(error.get() == null, s"concurrent search failed: ${error.get()}")
    assert(idx.numPoints == 500 + 300 - 100)
  }
}
