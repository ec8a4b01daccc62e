package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.expressions.TopKBuffer

/** ScalaCheck properties for the bounded top-k heap: both modes must
  * agree with the naive sort-based reference, including the distinct
  * mode's dedup under arbitrary merge splits (the partial-aggregation
  * path the engine relies on). */
object TopKBufferProps extends Properties("TopKBuffer") {

  private val pairGen: Gen[(Double, Long)] = for {
    d <- Gen.chooseNum(0.0, 10.0)
    id <- Gen.chooseNum(0L, 30L)
  } yield (d, id)

  // duplicates are EXACT repeats (deterministic distance contract)
  private val streamGen: Gen[List[(Double, Long)]] = for {
    base <- Gen.nonEmptyListOf(pairGen)
    dups <- Gen.someOf(base)
  } yield new scala.util.Random(7).shuffle(base ++ dups)

  private val kGen: Gen[Int] = Gen.chooseNum(1, 8)

  property("plain mode == sort.take(k)") =
    Prop.forAll(streamGen, kGen) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (d, id) => buf.add(d, id) }
      buf.sorted.toSeq == xs.sorted.take(k)
    }

  property("distinct mode == distinct.sort.take(k)") =
    Prop.forAll(streamGen, kGen) { (xs, k) =>
      val buf = new TopKBuffer(k, distinct = true)
      xs.foreach { case (d, id) => buf.add(d, id) }
      buf.sorted.toSeq == xs.distinct.sorted.take(k)
    }

  property("distinct mode survives arbitrary merge splits") =
    Prop.forAll(streamGen, kGen, Gen.chooseNum(1, 5)) { (xs, k, nSplits) =>
      val parts = xs.grouped(math.max(1, xs.length / nSplits)).toList
      val bufs = parts.map { p =>
        val b = new TopKBuffer(k, distinct = true)
        p.foreach { case (d, id) => b.add(d, id) }
        b
      }
      val merged = bufs.reduceLeft { (a, b) =>
        var i = 0
        while (i < b.size) { a.add(b.dists(i), b.ids(i)); i += 1 }
        a
      }
      merged.sorted.toSeq == xs.distinct.sorted.take(k)
    }
}
