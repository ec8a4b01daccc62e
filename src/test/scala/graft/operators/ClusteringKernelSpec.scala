package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bit-parity of the fused assignment/projection kernels against their
  * interpreted HOF twins (the TermHashKernelSpec discipline): same
  * element order, same widen-first arithmetic, LONG/DOUBLE-exact
  * equality — on both ARRAY<FLOAT> and ARRAY<DOUBLE> inputs, through
  * collect (codegen path) and over multiple partitions. */
class ClusteringKernelSpec extends SparkSpec {

  private def floatVecs = {
    val ss = spark
    import ss.implicits._
    (0L until 120L).map(i =>
      (i, Seq.tabulate(6)(d => ((i * 31 + d * 17) % 97).toFloat / 7.0f - 5.0f)))
      .toDF("id", "vec").repartition(5)
  }

  private val cent = Array(0.3, -1.7, 2.25, 0.0, -0.125, 4.5)

  test("FixedPointSquaredL2Const == HOF round-based distFp, float and double inputs") {
    val f = floatVecs
    val both = f.select(
        Clustering.distFpKernel(col("vec"), cent).as("k"),
        Clustering.distFpHof(col("vec"), cent).as("h"))
      .filter(col("k") =!= col("h"))
    assert(both.count() == 0)
    val d = f.select(col("id"), col("vec").cast("array<double>").as("vec"))
    val bothD = d.select(
        Clustering.distFpKernel(col("vec"), cent).as("k"),
        Clustering.distFpHof(col("vec"), cent).as("h"))
      .filter(col("k") =!= col("h"))
    assert(bothD.count() == 0)
  }

  test("ProjectVec transform == HOF transform, whitened and raw") {
    val model = Pca.Model(
      mean = Array(0.1, -0.2, 0.3, 0.0, 1.5, -2.5),
      components = Array(
        Array(0.5, 0.5, 0.5, 0.5, 0.0, 0.0),
        Array(0.0, 0.0, 0.0, 0.0, 1.0, 0.0)),
      eigenvalues = Array(4.0, 1.0))
    for (whiten <- Seq(true, false)) {
      val k = Pca.transform(floatVecs, model, whiten = whiten, vecCol = "vec")
        .select(col("id"), col("proj")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val h = Pca.transformHof(floatVecs, model, whiten = whiten, vecCol = "vec")
        .select(col("id"), col("proj")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(k == h, s"kernel/HOF divergence at whiten=$whiten")
    }
  }

  test("fused kernels ride whole-stage codegen (fallback disabled — a codegen bug fails, not silently interprets)") {
    val model = Pca.Model(
      mean = Array.fill(6)(0.5),
      components = Array(Array(1.0, 0, 0, 0, 0, 0), Array(0, 1.0, 0, 0, 0, 0)),
      eigenvalues = Array(2.0, 1.0))
    val cents = Array(cent, cent.map(_ + 1.0))
    val proj = Pca.transform(floatVecs, model, vecCol = "vec")
    val asg = floatVecs.select(Clustering.assignExpr(col("vec"), cents).as("cl"))
    // execute first and unwrap AQE (pre-execution the adaptive plan is
    // a leaf), then read the FINAL tree string: a `*(n)`-starred line
    // is one WholeStageCodegen participates — QueryStageExec wrappers
    // are collect-opaque, so node-type collection undercounts
    def kernelCodegend(df: org.apache.spark.sql.DataFrame, kernel: String): Boolean = {
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.toString.linesIterator.exists(l => l.contains(kernel) && l.contains("*("))
    }
    assert(kernelCodegend(proj, "graft_project_vec"),
      "ProjectVec not inside a WholeStageCodegen span")
    assert(kernelCodegend(asg, "graft_fp_l2_const"),
      "FixedPointSquaredL2Const not inside a WholeStageCodegen span")
    val srp = floatVecs.select(Similarity.srpSignature(col("vec")).as("sig"))
    assert(kernelCodegend(srp, "graft_srp_signature"),
      "SrpSignature not inside a WholeStageCodegen span")
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      assert(proj.count() == 120 && asg.count() == 120 && srp.count() == 120)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("SrpSignature kernel == HOF twin at nBits 1/9/32, float and double inputs") {
    val f = floatVecs
    for (nBits <- Seq(1, 9, 32)) {
      val bad = f.select(
          Similarity.srpSignature(col("vec"), nBits).as("k"),
          Similarity.srpSignatureHof(col("vec"), nBits).as("h"))
        .filter(col("k") =!= col("h"))
      assert(bad.count() == 0, s"kernel/HOF divergence at nBits=$nBits")
    }
    val d = f.select(col("vec").cast("array<double>").as("vec"))
    val badD = d.select(
        Similarity.srpSignature(col("vec")).as("k"),
        Similarity.srpSignatureHof(col("vec")).as("h"))
      .filter(col("k") =!= col("h"))
    assert(badD.count() == 0)
  }

  test("generalized SquaredL2/DotProduct on ARRAY<DOUBLE> == HOF twins") {
    import graft.functions.VectorFunctions
    val d = floatVecs.select(col("id"),
      col("vec").cast("array<double>").as("a"),
      reverse(col("vec")).cast("array<double>").as("b"))
    val bad = d.select(
        (VectorFunctions.squaredEuclidean(col("a"), col("b")) =!=
          VectorFunctions.squaredEuclideanHof(col("a"), col("b"))).as("x"),
        (VectorFunctions.dot(col("a"), col("b")) =!=
          VectorFunctions.dotHof(col("a"), col("b"))).as("y"))
      .filter(col("x") || col("y"))
    assert(bad.count() == 0)
    // mixed float/double operands also agree
    val m = floatVecs.select(col("vec"),
      col("vec").cast("array<double>").as("dv"))
    val badMixed = m.filter(
      VectorFunctions.squaredEuclidean(col("vec"), col("dv")) =!= lit(0.0))
    assert(badMixed.count() == 0)
  }
}
