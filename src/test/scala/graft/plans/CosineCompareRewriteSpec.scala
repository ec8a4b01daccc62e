package graft.plans

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The cosine-predicate dot-form rewrite: parity with the unrewritten
  * fl semantics away from ulp-scale boundaries, division and sqrt gone
  * from the executed filter, zero-norm coalesce contract preserved,
  * and the skip conditions. (The L2 tier's spec is
  * [[SqrtCompareRewriteSpec]].) */
class CosineCompareRewriteSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  graft.GraftExtensions.register(spark)

  // deterministic 4-d vectors spanning signs and magnitudes, plus an
  // all-zero row (the coalesce contract) and near-(anti)parallel pairs
  private lazy val rows: Seq[(Long, Seq[Float])] = {
    var x = 0x243F6A8885A308D3L
    def nx(): Float = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (((x >>> 20) % 2000L) - 1000L).toFloat / 250.0f
    }
    val rand = (0 until 40).map(i => (i.toLong, Seq.fill(4)(nx())))
    rand ++ Seq(
      (100L, Seq(0f, 0f, 0f, 0f)),        // zero norm -> sim 0, dist 1
      (101L, Seq(1f, 2f, 3f, 4f)),        // parallel to the query
      (102L, Seq(-1f, -2f, -3f, -4f)),    // anti-parallel
      (103L, Seq(2f, 4f, 6f, 8f)))
  }

  private lazy val df = rows.toDF("id", "vec").cache()

  private val qv = Seq(1f, 2f, 3f, 4f)
  private def q = typedLit(qv)
  private def cosDist = VectorFunctions.cosineDistance(col("vec"), q)
  private def cosSim = VectorFunctions.cosineSimilarity(col("vec"), q)

  /** Driver-side replica of the UNREWRITTEN fl pipeline (DotProduct's
    * widen-first sequential fold, then sqrt/divide/coalesce). */
  private def flSim(v: Seq[Float]): Double = {
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val n = math.sqrt(dot(v, v)) * math.sqrt(dot(qv, qv))
    if (n == 0.0) 0.0 else dot(v, qv) / n
  }

  private def ids(c: org.apache.spark.sql.Column): Set[Long] =
    df.filter(c).select("id").as[Long].collect().toSet

  test("parity on mid-gap radii (all comparators, dist and sim forms)") {
    val sims = rows.map { case (id, v) => id -> flSim(v) }.toMap
    val dists = sims.view.mapValues(1.0 - _).toMap
    // thresholds strictly between adjacent observed values (plus the
    // out-of-range extremes): stage 2 is real-exact, so away from the
    // ulp boundary the row sets must match EXACTLY
    def midpoints(vs: Seq[Double]): Seq[Double] = {
      val s = vs.distinct.sorted
      s.zip(s.tail).map { case (a, b) => (a + b) / 2 }
    }
    val distRs = midpoints(dists.values.toSeq) ++ Seq(-0.5, 0.0, 1.0, 2.5)
    for (r <- distRs) {
      assert(ids(cosDist <= r) == dists.collect { case (i, d) if d <= r => i }.toSet, s"dist <= $r")
      assert(ids(cosDist < r) == dists.collect { case (i, d) if d < r => i }.toSet, s"dist < $r")
      assert(ids(cosDist > r) == dists.collect { case (i, d) if d > r => i }.toSet, s"dist > $r")
      assert(ids(cosDist >= r) == dists.collect { case (i, d) if d >= r => i }.toSet, s"dist >= $r")
      assert(ids(lit(r) >= cosDist) == dists.collect { case (i, d) if r >= d => i }.toSet, s"mirror $r")
    }
    val simRs = midpoints(sims.values.toSeq) ++ Seq(-1.5, 1.5)
    for (s <- simRs) {
      assert(ids(cosSim >= s) == sims.collect { case (i, v) if v >= s => i }.toSet, s"sim >= $s")
      assert(ids(cosSim > s) == sims.collect { case (i, v) if v > s => i }.toSet, s"sim > $s")
      assert(ids(cosSim <= s) == sims.collect { case (i, v) if v <= s => i }.toSet, s"sim <= $s")
      assert(ids(cosSim < s) == sims.collect { case (i, v) if v < s => i }.toSet, s"sim < $s")
      assert(ids(lit(s) <= cosSim) == sims.collect { case (i, v) if s <= v => i }.toSet, s"mirror sim $s")
    }
  }

  test("zero-norm rows keep the coalesce contract through the rewrite") {
    // sim == 0, dist == 1 for the zero vector, in every branch family:
    // S > 0, S == 0, S < 0
    assert(ids(cosDist <= 1.0).contains(100L))   // dist 1 <= 1
    assert(!ids(cosDist <= 0.9).contains(100L))  // S > 0 branch
    assert(ids(cosSim >= 0.0).contains(100L))    // S == 0 branch
    assert(!ids(cosSim > 0.0).contains(100L))
    assert(ids(cosSim >= -0.5).contains(100L))   // S < 0 branch
    assert(!ids(cosSim <= -0.5).contains(100L))
  }

  private def filterConds(dfq: org.apache.spark.sql.DataFrame) = {
    dfq.count()
    // a non-equi predicate may land in a join's condition rather than
    // a FilterExec (the two-attribute pair query) — audit both
    collectPlanNodes(dfq) {
      case f: org.apache.spark.sql.execution.FilterExec => Some(f.condition)
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.condition
    }.flatten
  }

  private def assertNoSqrtDivide(conds: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Unit = {
    assert(conds.nonEmpty)
    assert(!conds.exists(_.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.Sqrt])),
      s"sqrt survived the cosine rewrite: $conds")
    assert(!conds.exists(_.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.Divide])),
      s"division survived the cosine rewrite: $conds")
  }

  test("executed filter carries no sqrt and no division — column API") {
    assertNoSqrtDivide(filterConds(df.filter(cosDist <= 0.7).select("id")))
    assertNoSqrtDivide(filterConds(df.filter(cosSim >= 0.3).select("id")))
  }

  test("executed filter carries no sqrt and no division — SQL surface") {
    df.createOrReplaceTempView("cos_t")
    val viaDist = spark.sql(
      "SELECT id FROM cos_t WHERE graft_cosine_dist(vec, " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), " +
        "CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) <= 0.7")
    assertNoSqrtDivide(filterConds(viaDist))
    // two-attribute form (neither side literal): self-join pairs
    val pairs = spark.sql(
      """SELECT a.id FROM cos_t a JOIN cos_t b ON a.id < b.id
        |WHERE graft_cosine_sim(a.vec, b.vec) >= 0.8""".stripMargin)
    assertNoSqrtDivide(filterConds(pairs))
  }

  test("two-attribute parity (no literal side): pair predicate matches fl truth") {
    def flSim2(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
        s
      }
      val n = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
      if (n == 0.0) 0.0 else dot(a, b) / n
    }
    val byId = rows.toMap
    val truth = (for {
      (i, a) <- rows; (j, b) <- rows if i < j
      if flSim2(a, b) >= 0.8
    } yield (i, j)).toSet
    df.createOrReplaceTempView("cos_t")
    val got = spark.sql(
      """SELECT a.id AS i, b.id AS j FROM cos_t a JOIN cos_t b ON a.id < b.id
        |WHERE graft_cosine_sim(a.vec, b.vec) >= 0.8""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(got == truth, s"diff: ${got.diff(truth)} / ${truth.diff(got)}")
    assert(byId.nonEmpty)
  }

  test("skips: NaN threshold keeps native semantics; column threshold untouched") {
    // Spark orders NaN above every double; the rule skips NaN and must
    // not disturb that
    assert(df.filter(cosDist <= Double.NaN).count() == df.count())
    assert(df.filter(cosDist > Double.NaN).count() == 0)
    val withR = df.withColumn("r", when(col("id") % 2 === 0, 0.7).otherwise(1.5))
    val got = withR.filter(cosDist <= col("r")).select("id").as[Long].collect().toSet
    val truth = rows.collect {
      case (i, v) if (1.0 - flSim(v)) <= (if (i % 2 == 0) 0.7 else 1.5) => i
    }.toSet
    assert(got == truth)
  }
}
