package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The reference's extensibility hook (any `Distances.PreMetric`,
  * src/LMDiskANN.jl:58,62,242) as [[Metric.Custom]]: full serving
  * lifecycle under a user metric, name-registry round-trip with the Q8
  * whitelist property, and loud refusal on the codegen-only
  * distributed tiers. */
class MetricCustomSpec extends SparkSpec {

  private def manhattan = Metric.Custom("manhattan", (a, b) => {
    var s = 0.0; var i = 0
    while (i < a.length) { s += math.abs(a(i).toDouble - b(i).toDouble); i += 1 }
    s
  })

  test("custom metric drives the serving traversal (L1 vs L2 disagree on the winner)") {
    // q=(0,0); a=(0.8,0.8): L1=1.6, L2~1.13; b=(1.3,0): L1=1.3, L2=1.3
    // -> nearest is a under Euclidean but b under Manhattan
    val q = Array(0f, 0f)
    def populate(s: ServingIndex): Unit = {
      s.insert(Array(5f, 5f), Some("far"))
      s.insert(Array(0.8f, 0.8f), Some("a"))
      s.insert(Array(1.3f, 0f), Some("b"))
    }
    val l1 = new ServingIndex(dim = 2, maxDegree = 4, metric = manhattan)
    populate(l1)
    assert(l1.search(q, topk = 1).head._1.contains("b"))
    val l2 = new ServingIndex(dim = 2, maxDegree = 4)
    populate(l2)
    assert(l2.search(q, topk = 1).head._1.contains("a"))
    // the rest of the lifecycle holds under the custom metric
    val (_, bId) = (l1.idForKey("b").get, l1.idForKey("b").get)
    l1.delete(bId)
    assert(l1.search(q, topk = 1).head._1.contains("a"))
    assert(l1.embeddingByKey("a").toSeq == Seq(0.8f, 0.8f))
  }

  test("registry round-trip keeps the Q8 whitelist property") {
    val m = Metric.register(manhattan)
    try {
      assert(Metric.fromName("manhattan") eq m)
      assert(Metric.fromName("MANHATTAN").dist(Array(0f, 0f), Array(1f, 2f)) == 3.0)
    } finally Metric.unregister("manhattan")
    val e = intercept[IllegalArgumentException] { Metric.fromName("manhattan") }
    assert(e.getMessage.contains("register"), e.getMessage)
    // built-in names cannot be shadowed
    intercept[IllegalArgumentException] {
      Metric.Custom("euclidean", (_, _) => 0.0)
    }
    // names land raw in JSON sidecars/dir suffixes — unsafe chars refuse
    intercept[IllegalArgumentException] {
      Metric.Custom("""bad"name""", (_, _) => 0.0)
    }
  }

  test("distributed tiers refuse custom metrics loudly, never silently fall back") {
    val ss = spark
    import ss.implicits._
    val src = Seq((0L, Seq(0f, 0f)), (1L, Seq(1f, 1f))).toDF("id", "vec")
    val e1 = intercept[IllegalArgumentException] {
      VectorIndex.build(spark, tmpDir("custom-metric"), src, dim = 2,
        maxDegree = 4, metric = manhattan)
    }
    assert(e1.getMessage.contains("ServingIndex"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Metric.distColumn(manhattan,
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"))
    }
    assert(e2.getMessage.contains("codegen"), e2.getMessage)
    // PQ low-memory ADC has no defined relationship to a user metric
    val s = new ServingIndex(dim = 2, maxDegree = 4, metric = manhattan)
    s.insert(Array(0f, 1f), None)
    val pq = Quantization.pqFitLocal(
      Array(Array(0f, 1f), Array(1f, 0f)), m = 1, k = 2)
    intercept[IllegalArgumentException] { s.enableLowMemoryTraversal(pq) }
  }
}
