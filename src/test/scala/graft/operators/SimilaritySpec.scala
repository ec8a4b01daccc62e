package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("IVF probe meets the recall gate vs exact top-k") {
    val src = embeddings.cache()
    val (centroids, assigned) = Similarity.ivfFit(src, k = 16)
    assert(centroids.count() == 16)
    assert(assigned.select(countDistinct(col("cluster"))).head().getLong(0) <= 16)
    val queries = src.limit(20).select(col("id").as("query_id"), col("vec").as("qvec"))
    val ivf = Similarity.ivfTopK(assigned, centroids, queries, topk = 10, nprobe = 6)
    assert(ivf.groupBy(col("query_id")).count().filter(col("count") =!= 10).count() == 0)
    val exact = src.crossJoin(broadcast(queries))
      .select(col("query_id"), col("id").as("neighbor_id"),
        VectorFunctions.euclidean(col("qvec"), col("vec")).as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), 10).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.id").as("neighbor_id"))
    val matched = ivf.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id")).count()
    val recall = matched.toDouble / (20 * 10.0)
    info(f"IVF recall@10 (k=16, nprobe=6) = $recall%.3f")
    assert(recall >= 0.70)
  }

  test("cosine IVF meets the recall gate vs exact cosine (reference runtests.jl:37-67 gate)") {
    import graft.index.Metric
    val src = embeddings.cache()
    val (centroids, assigned) = Similarity.ivfFit(src, k = 16, metric = Metric.Cosine)
    assert(centroids.count() == 16)
    val queries = src.limit(20).select(col("id").as("query_id"), col("vec").as("qvec"))
    val ivf = Similarity.ivfTopK(assigned, centroids, queries, topk = 10, nprobe = 6,
      metric = Metric.Cosine)
    // distances are true cosine distances (within [0, 2])
    assert(ivf.filter(col("dist") < -1e-9 || col("dist") > 2.0 + 1e-9).count() == 0)
    val exact = src.crossJoin(broadcast(queries))
      .select(col("query_id"), col("id").as("neighbor_id"),
        VectorFunctions.cosineDistance(col("qvec"), col("vec")).as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), 10).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.id").as("neighbor_id"))
    val matched = ivf.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id")).count()
    val recall = matched.toDouble / (20 * 10.0)
    info(f"cosine IVF recall@10 (k=16, nprobe=6) = $recall%.3f")
    assert(recall >= 0.70)
  }

  test("IVF with nprobe = k is exact") {
    val src = embeddings.filter(col("id") < 200).cache()
    val (centroids, assigned) = Similarity.ivfFit(src, k = 8)
    val queries = src.limit(5).select(col("id").as("query_id"), col("vec").as("qvec"))
    val ivf = Similarity.ivfTopK(assigned, centroids, queries, topk = 5, nprobe = 8)
    val exact = src.crossJoin(broadcast(queries))
      .select(col("query_id"), col("id").as("neighbor_id"),
        VectorFunctions.euclidean(col("qvec"), col("vec")).as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), 5).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.id").as("neighbor_id"))
    val matched = ivf.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id")).count()
    assert(matched == 25L)
  }

  test("labelCentroids equals the fixed-point per-component mean on any partitioning") {
    val ss = spark
    import ss.implicits._
    val rows = Seq(
      (1L, 0, Array(1.0f, -2.0f, 0.5f)),
      (2L, 0, Array(2.0f, 2.0f, -0.5f)),
      (3L, 0, Array(0.25f, 0.125f, 1.0f)),
      (4L, 1, Array(-1.5f, 0.0f, 3.0f)))
    val out = Similarity.labelCentroids(
        rows.toDF("vec_id", "label", "embedding").repartition(3))
      .select("label", "n_vecs", "pos", "centroid")
      .as[(Int, Long, Int, Double)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    assert(out.size == 6)
    def expect(label: Int, xs: Seq[Seq[Float]]): Unit =
      (0 until 3).foreach { p =>
        val fpsum = xs.map(v => math.rint(v(p).toDouble * 1e6).toLong).sum
        val want = math.rint(fpsum.toDouble / (xs.size * 1e6) * 1e4) / 1e4
        val (n, c) = out((label, p + 1))
        assert(n == xs.size && c == want, s"label=$label pos=${p + 1}: got $c want $want")
      }
    expect(0, rows.filter(_._2 == 0).map(_._3.toSeq))
    expect(1, rows.filter(_._2 == 1).map(_._3.toSeq))
  }

  test("int8Quantize: exact codes at the scale extremes, zero-variance dims quantize to 0") {
    val ss = spark
    import ss.implicits._
    val rows = Seq(
      (1L, Array(1.0f, -2.0f, 0.0f)),
      (2L, Array(0.5f, 2.0f, 0.0f)),
      (3L, Array(-1.0f, -4.0f, 0.0f)))
    val out = Similarity.int8Quantize(rows.toDF("vec_id", "embedding"))
      .select("vec_id", "codes", "mse")
      .as[(Long, Seq[Int], Double)].collect().map(r => r._1 -> r).toMap
    // scales: dim1 max|x|=1.0, dim2 max|x|=4.0, dim3 all-zero
    assert(out(1L)._2 == Seq(127, -63, 0))
    assert(out(2L)._2 == Seq(64, 64, 0))
    assert(out(3L)._2 == Seq(-127, -127, 0))
    // vec 3 sits exactly on the scale extremes -> perfect reconstruction
    assert(out(3L)._3 == 0.0)
    // vec 1 dim2: dequant -63*4/127 = -1.98425..., mse = diff^2/3 rounded to 6
    val diff = -2.0 - (-63.0 * 4.0 / 127.0)
    assert(math.abs(out(1L)._3 - math.rint(diff * diff / 3.0 * 1e6) / 1e6) < 1e-12)
    out.values.foreach(r => r._2.foreach(c => assert(c >= -127 && c <= 127)))
  }

  test("srpSignature: scale-invariant, antipodal-complementary, copies pair at hamming 0") {
    val ss = spark
    import ss.implicits._
    val rng = new scala.util.Random(3)
    val v = Array.fill(64)(rng.nextFloat() - 0.5f)
    val rows = Seq(
      (1L, v),
      (2L, v.map(_ * 2.5f)),        // same direction -> same signature
      (3L, v.map(-_)),              // antipodal -> complementary signature
      (4L, Array.fill(64)(rng.nextFloat() - 0.5f)))
    val sigs = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.srpSignature(col("embedding")).as("sig"))
    val m = sigs.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) == 32)
    // exact banded pair join finds the same-direction pair at hamming 0
    val pairs = Dedup.simhashNearDupPairs(sigs, maxHamming = 1, nBands = 2,
        idCol = "vec_id", hashCol = "sig")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("semanticDecontaminate: max-cos vs the bench set, flag on the rounded value") {
    val ss = spark
    import ss.implicits._
    val bench = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Array(2.0f, 0.0f)),   // cos 1.0 vs bench   -> contaminated
      (2L, Array(1.0f, 1.0f)),   // cos ~0.7071        -> clean at tau 0.8
      (3L, Array(0.0f, 3.0f)),   // cos 0.0
      (4L, Array(0.0f, 0.0f))    // zero norm -> cos 0 by contract
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(train, bench, tau = 0.8)
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1.0, true)))
    assert(out(2L) == ((2L, 0.7071, false)))
    assert(out(3L) == ((3L, 0.0, false)))
    assert(out(4L) == ((4L, 0.0, false)))
  }

  test("int8TopK with exact refine nearly matches exact top-k") {
    val src = embeddings.cache()
    val queries = src.limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val got = Similarity.int8TopK(src, queries, topk = 10)
    assert(got.groupBy(col("query_id")).count().filter(col("count") =!= 10).count() == 0)
    val exact = src.crossJoin(broadcast(
        src.limit(20).select(col("id").as("query_id"), col("vec").as("qvec"))))
      .select(col("query_id"), col("id").as("neighbor_id"),
        VectorFunctions.euclidean(col("qvec"), col("vec")).as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), 10).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.id").as("neighbor_id"))
    val matched = got.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id")).count()
    val recall = matched.toDouble / (20 * 10.0)
    info(f"int8+refine recall@10 = $recall%.3f")
    assert(recall >= 0.90)
  }

  test("pcaPrefilterTopK is EXACT when the data lies in the retained subspace") {
    // 4-dim vectors whose mass is entirely in dims 0-1: a k=2 model
    // loses nothing, so the prefilter ranking must equal exact top-k
    // even at refineFactor 1 (projection is an isometry on the data).
    val ss = spark
    import ss.implicits._
    val rows = (0L until 60L).map(i =>
      (i, Seq((i % 13).toFloat, (i % 7).toFloat, 0.0f, 0.0f)))
    val src = rows.toDF("id", "vec")
    val model = Pca.fit(src, dim = 4, k = 2, vecCol = "vec")
    val queries = rows.take(5).map { case (i, v) => (i, v.toArray) }.toArray
    val got = Similarity.pcaPrefilterTopK(src, queries, model, topk = 5, refineFactor = 1)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .as[(Long, Long, Int)].collect().toSet
    val exact = src.crossJoin(broadcast(
        rows.take(5).toDF("query_id", "qvec")))
      .select(col("query_id"), col("id").as("neighbor_id"),
        VectorFunctions.squaredEuclidean(col("qvec"), col("vec")).as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), 5).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rnk"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == exact)
  }

  test("mmrRerank defers a redundant near-copy in favor of a diverse lower-rel candidate") {
    val ss = spark
    import ss.implicits._
    // c2 is exactly parallel to c1 (cos 1 -> sim_fp 10000); c3 is
    // orthogonal. Pure relevance order would be c1, c2, c3; MMR with
    // lambda 7/10 must pick the diverse c3 second:
    //   step2: c2 -> 7*9500 - 3*10000 = 36500;  c3 -> 7*6000 = 42000
    val cands = Seq(
      (0L, 1L, 0.99, Seq(1f, 0f, 0f)),
      (0L, 2L, 0.95, Seq(2f, 0f, 0f)),
      (0L, 3L, 0.60, Seq(0f, 1f, 0f)))
      .toDF("query_id", "cand_id", "rel", "vec")
    val out = Similarity.mmrRerank(cands, k = 3)
      .collect().map(r => (r.getInt(2), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq((1, 1L, 69300L), (2, 3L, 42000L), (3, 2L, 36500L)),
      s"got ${out.toSeq}")
  }

  test("mmrRerank breaks exact score ties on the smaller candidate id") {
    val ss = spark
    import ss.implicits._
    // two mutually-orthogonal candidates with identical rel: identical
    // scores at every step -> id order decides
    val cands = Seq(
      (0L, 9L, 0.80, Seq(0f, 0f, 1f)),
      (0L, 4L, 0.80, Seq(0f, 1f, 0f)))
      .toDF("query_id", "cand_id", "rel", "vec")
    val out = Similarity.mmrRerank(cands, k = 2)
      .collect().map(r => (r.getInt(2), r.getLong(1)))
    assert(out.toSeq == Seq((1, 4L), (2, 9L)), s"got ${out.toSeq}")
  }

  test("hardNegatives: other-label only, anchor excluded, margins flag violators") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    val e = Seq(
      (0L, Seq(0f, 0f), 0),  // anchor, label 0
      (1L, Seq(3f, 0f), 0),  // nearest positive, d_pos = 3
      (2L, Seq(1f, 0f), 1),  // violator negative: margin 1-3 = -2
      (3L, Seq(5f, 0f), 1),  // semi-hard negative: margin 5-3 = 2
      (4L, Seq(9f, 0f), 0))  // farther positive, must not appear
      .toDF("vec_id", "embedding", "label")
    val anchors = e.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("avec"),
        col("label").as("anchor_label"))
    val out = Similarity.hardNegatives(e, anchors, k = 10)
      .orderBy("rnk").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 3L)) // negatives only, by distance
    assert(out.map(_.getDouble(3)).toSeq == Seq(3.0, 3.0)) // d_pos
    assert(out.map(_.getDouble(4)).toSeq == Seq(-2.0, 2.0)) // margins, violator negative
    // partition invariance of the two-leg aggregate shape
    val out13 = Similarity.hardNegatives(e.repartition(13), anchors, k = 10)
      .orderBy("rnk").collect()
    assert(out13.toSeq == out.toSeq)
  }

  test("mutualKnnPairs: hub one-way neighbors cut, mutual pairs kept once") {
    val ss = spark
    import ss.implicits._
    // 1-d line: hub 0 at origin; 1,2 close to hub; 3,4 far out together.
    // k=1: knn(0)={1}, knn(1)={0}, knn(2)={1}, knn(3)={4}, knn(4)={3}
    // mutual: {0,1} and {3,4}; (2->1) is one-way (knn(1) is 0), cut.
    val vecs = Seq(
      (0L, Seq(0.0f)), (1L, Seq(1.0f)), (2L, Seq(2.5f)),
      (3L, Seq(10.0f)), (4L, Seq(10.5f))
    ).toDF("vec_id", "embedding")
    val knn = Similarity.knnJoinExact(vecs, vecs, 1, excludeSelf = true)
    val pairs = Similarity.mutualKnnPairs(knn)
      .select("lo", "hi").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((0L, 1L), (3L, 4L)))
  }
}
