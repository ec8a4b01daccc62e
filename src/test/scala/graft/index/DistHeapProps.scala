package graft.index

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Differential fuzz pinning [[DistHeap]]'s EXACT-REPLICA contract:
  * every operation sequence must leave the primitive heap and
  * `mutable.PriorityQueue[(Double, Int)](Ordering.by(_._1))` with the
  * same head and the same drain order — INCLUDING equal-distance
  * elements, whose placement is decided purely by the sift algorithm's
  * structural moves (the serving traversal's ef-bounded pool evicts by
  * head, so a tie divergence would move hash-oracled serving results
  * and gated recall). Distances draw from a tiny value set so exact
  * ties dominate every run. */
class DistHeapProps extends AnyFunSuite {

  private def maxOrd = Ordering.by[(Double, Int), Double](_._1)

  private def drain(h: DistHeap): List[(Double, Int)] = {
    val b = List.newBuilder[(Double, Int)]
    while (h.nonEmpty) { b += ((h.headDist, h.headId)); h.removeHead() }
    b.result()
  }

  private def fuzz(min: Boolean, seed: Int, ops: Int, tieValues: Int): Unit = {
    val rng = new scala.util.Random(seed)
    val ord = if (min) maxOrd.reverse else maxOrd
    val ref = mutable.PriorityQueue.empty[(Double, Int)](ord)
    val h = new DistHeap(min)
    var nextId = 0
    (0 until ops).foreach { _ =>
      rng.nextInt(4) match {
        case 0 | 1 => // enqueue a (often-tied) distance
          val d = rng.nextInt(tieValues).toDouble
          ref.enqueue((d, nextId)); h.enqueue(d, nextId); nextId += 1
        case 2 if ref.nonEmpty => // dequeue
          val (rd, ri) = ref.dequeue()
          assert(h.nonEmpty && h.headDist == rd && h.headId == ri,
            s"head diverged: ref=($rd,$ri) got=(${h.headDist},${h.headId})")
          h.removeHead()
        case 3 if ref.nonEmpty => // peek
          assert(h.headDist == ref.head._1 && h.headId == ref.head._2)
        case _ => ()
      }
      assert(h.size == ref.size)
    }
    // full drain must match element-for-element (ties included)
    val refDrain = ref.dequeueAll.toList
    assert(drain(h) == refDrain, s"drain diverged (min=$min, seed=$seed)")
  }

  test("max-heap matches PriorityQueue move-for-move under heavy ties") {
    (1 to 50).foreach(s => fuzz(min = false, seed = s, ops = 400, tieValues = 4))
    (51 to 60).foreach(s => fuzz(min = false, seed = s, ops = 2000, tieValues = 7))
  }

  test("min-heap (.reverse ordering) matches PriorityQueue move-for-move under heavy ties") {
    (1 to 50).foreach(s => fuzz(min = true, seed = s, ops = 400, tieValues = 4))
    (51 to 60).foreach(s => fuzz(min = true, seed = s, ops = 2000, tieValues = 7))
  }

  test("the searchGraph pool pattern: bounded eviction picks identical victims on ties") {
    // replay the exact traversal pool discipline (enqueue to both,
    // evict past ef) against the reference heaps for many tie-heavy
    // streams — the candidate POOL a traversal keeps must be identical
    (1 to 40).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val ef = 8
      val ref = mutable.PriorityQueue.empty[(Double, Int)](maxOrd)
      val h = new DistHeap(min = false)
      (0 until 300).foreach { id =>
        val nd = rng.nextInt(5).toDouble
        if (ref.size < ef || nd < ref.head._1) {
          ref.enqueue((nd, id)); h.enqueue(nd, id)
          if (ref.size > ef) { ref.dequeue(); h.removeHead() }
        }
        assert(h.size == ref.size && (!ref.nonEmpty ||
          (h.headDist == ref.head._1 && h.headId == ref.head._2)))
      }
      assert(drain(h) == ref.dequeueAll.toList)
    }
  }
}
