package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Clustering.kmeansReport contract: fixed-point determinism, the
  * lowest-id tie-break, blob recovery, and the one-shuffle-per-round
  * plan shape. */
class ClusteringSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Seq[Float])]) = {
    val ss = spark
    import ss.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("k=1 single round: centroid is the fixed-point mean, inertia exact") {
    // 1-dim vectors 0.0, 0.3, 0.6 seeded at id 0 (centroid 0.0)
    val e = df(Seq((0L, Seq(0.0f)), (1L, Seq(0.3f)), (2L, Seq(0.6f))))
    val r = Clustering.kmeansReport(e, k = 1, iters = 1).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_vecs") == 3L)
    // fp component sums: round(0*1e6)+round(0.3f*1e6)+round(0.6f*1e6)
    val fp = 0L + math.round(0.3f.toDouble * 1e6) + math.round(0.6f.toDouble * 1e6)
    val expectedCentroid = BigDecimal(fp / (3 * 1e6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("centroid") == expectedCentroid)
    // inertia vs seed centroid 0.0: round(d^2 * 1e8) per row
    val inertia = Seq(0.0f, 0.3f, 0.6f)
      .map(v => math.round(v.toDouble * v.toDouble * 1e8)).sum
    assert(row.getAs[Long]("inertia_fp") == inertia)
  }

  test("equidistant point breaks the argmin tie to the lowest cluster id") {
    // seeds at -1 and +1; the point 0.0 is exactly equidistant
    val e = df(Seq((0L, Seq(-1.0f)), (1L, Seq(1.0f)), (2L, Seq(0.0f))))
    val r = Clustering.kmeansReport(e, k = 2, iters = 1)
      .select("cluster", "n_vecs").distinct().collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r == Map(0 -> 2L, 1 -> 1L)) // 0.0 joined cluster 0
  }

  test("two separated blobs are recovered with their sizes") {
    val blob0 = (0L to 4L).map(i => (i * 2, Seq(0.1f * i, 0.0f))) // ids 0,2,4,6,8
    val blob1 = (0L to 3L).map(i => (i * 2 + 1, Seq(10.0f + 0.1f * i, 5.0f)))
    val e = df(scala.util.Random.shuffle(blob0 ++ blob1))
    val r = Clustering.kmeansReport(e, k = 2, iters = 2)
    val sizes = r.select("cluster", "n_vecs").distinct().collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    // seed 0 = (0,0) in blob0, seed 1 = (10,5) in blob1
    assert(sizes == Map(0 -> 5L, 1 -> 4L))
    // centroid of cluster 1 dim 1 ~ 10.15 (mean of 10.0..10.3)
    val c1 = r.filter(col("cluster") === 1 && col("pos") === 1)
      .head().getAs[Double]("centroid")
    assert(math.abs(c1 - 10.15) < 1e-6)
  }

  test("modelFromReport + assignExpr reproduce the fit's own assignment") {
    val rows = (0L until 30L).map(i => (i, Seq((i % 9).toFloat, (i % 4).toFloat)))
    val e = df(rows)
    val report = Clustering.kmeansReport(e, k = 3, iters = 2)
    val model = Clustering.modelFromReport(report, 3)
    assert(model.k == 3 && model.dim == 2)
    // sizes from assigning under the model's centroids == report sizes
    val viaExpr = e.select(Clustering.assignExpr(col("embedding"), model.centroids).as("cl"))
      .groupBy("cl").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // report centroids are the POST-update means of that assignment;
    // re-assigning under them can move points (one more Lloyd step), so
    // compare against a 3-round report's sizes instead
    val next = Clustering.kmeansReport(e, k = 3, iters = 3)
      .select("cluster", "n_vecs").distinct().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaExpr == next)
  }

  test("KmeansArtifact: save -> load round-trips; tampered centroid refused") {
    val e = df((0L until 20L).map(i => (i, Seq(i.toFloat))))
    val model = Clustering.modelFromReport(Clustering.kmeansReport(e, 2, 1), 2)
    val dir = tmpDir("kmeans-artifact")
    KmeansArtifact.save(model, dir)
    val back = KmeansArtifact.load(dir)
    assert(back.fingerprint == model.fingerprint)
    assert(back.centroids.map(_.toSeq).toSeq == model.centroids.map(_.toSeq).toSeq)
    val content = s"$dir/kmeans-${model.fingerprint}.json"
    val raw = new String(graft.index.ArtifactStore.current.readBytes(content), "UTF-8")
    val tampered = raw.replaceFirst(""""centroids":\[\[[-0-9.eE]+""", """"centroids":[[123.456""")
    assert(tampered != raw)
    graft.index.ArtifactStore.current.writeAtomic(content, tampered.getBytes("UTF-8"))
    val err = intercept[IllegalArgumentException] { KmeansArtifact.load(dir) }
    assert(err.getMessage.contains("fingerprint"))
  }

  test("round plan: narrow-map assign + one partial-agg shuffle, no cartesian") {
    val e = df((0L until 40L).map(i => (i, Seq(i.toFloat, (i % 7).toFloat))))
    val r = Clustering.kmeansReport(e, k = 3, iters = 1)
    r.count()
    val cartesians = collectPlanNodes(r) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(cartesians.isEmpty, "assignment must be a narrow map, never a per-row join")
    assert(collectShuffles(r).size <= 2,
      "one groupBy shuffle (plus at most an AQE coalesce) per round")
  }
}
