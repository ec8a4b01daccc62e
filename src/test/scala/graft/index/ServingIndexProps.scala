package graft.index

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property tests for the ID/key/lifecycle invariants
  * (SURVEY §5 port strategy: property tests for ID/key invariants). */
object ServingIndexProps extends Properties("ServingIndex") {

  private val dim = 4
  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(dim, Gen.chooseNum(-100f, 100f)).map(_.toArray)
  private val vecsGen: Gen[List[Array[Float]]] =
    Gen.nonEmptyListOf(vecGen).map(_.take(40))

  property("public ids are dense 1-based in insertion order") =
    Prop.forAll(vecsGen) { vs =>
      val idx = new ServingIndex(dim)
      val ids = vs.map(v => idx.insert(v)._2)
      ids == (1L to vs.length.toLong).toList
    }

  property("every inserted vector round-trips by id and by key") =
    Prop.forAll(vecsGen) { vs =>
      val idx = new ServingIndex(dim)
      val recs = vs.zipWithIndex.map { case (v, i) =>
        val key = if (i % 2 == 0) Some(s"k$i") else None
        (idx.insert(v, key), v)
      }
      recs.forall { case ((key, id), v) =>
        idx.embeddingById(id).sameElements(v) &&
          idx.embeddingByKey(key).sameElements(v) &&
          idx.idForKey(key).contains(id) &&
          idx.keyForId(id).contains(key)
      }
    }

  property("self-search at topk=1 finds an exact-distance match") =
    Prop.forAll(vecsGen) { vs =>
      val idx = new ServingIndex(dim)
      vs.foreach(v => idx.insert(v))
      vs.forall { v =>
        val hits = idx.search(v, topk = 1)
        hits.nonEmpty && {
          val hit = idx.embeddingById(hits.head._2)
          Metric.Euclidean.dist(hit, v) == 0.0
        }
      }
    }

  property("delete removes exactly the victim; survivors stay searchable") =
    Prop.forAll(vecsGen, Gen.posNum[Int]) { (vs, seed) =>
      val idx = new ServingIndex(dim)
      val ids = vs.map(v => idx.insert(v)._2)
      val victim = ids(seed % ids.length)
      idx.delete(victim)
      val victimGone = idx.search(vs((victim - 1).toInt), topk = vs.length)
        .forall(_._2 != victim)
      val survivorsLive = ids.filter(_ != victim).forall(id => idx.keyForId(id).isDefined)
      victimGone && survivorsLive && idx.numPoints == vs.length - 1
    }

  property("freed slots recycle LIFO and count stays consistent") =
    Prop.forAll(vecsGen) { vs =>
      Prop.iff[List[Array[Float]]](vs, {
        case v if v.length >= 3 =>
          val idx = new ServingIndex(dim)
          v.foreach(x => idx.insert(x))
          idx.delete(1L)
          idx.delete(3L)
          val (_, r1) = idx.insert(v.head) // last freed first
          val (_, r2) = idx.insert(v.head)
          Prop(r1 == 3L && r2 == 1L && idx.numPoints == v.length)
        case _ => Prop(true)
      })
    }

  property("adjacency degree never exceeds maxDegree") =
    Prop.forAll(vecsGen) { vs =>
      val idx = new ServingIndex(dim, maxDegree = 4)
      vs.foreach(v => idx.insert(v))
      // exercise via deletes + reinserts, then check search still works
      if (vs.length > 2) idx.delete(2L)
      vs.forall(v => idx.search(v, topk = 2).nonEmpty == (idx.numPoints > 0))
    }
}
