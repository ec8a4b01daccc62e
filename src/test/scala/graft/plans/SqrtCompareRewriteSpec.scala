package graft.plans

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The sqrt-elimination rule: bit-exact result parity against the
  * un-rewritten semantics on adversarial boundary radii, sqrt gone
  * from the executed plan, and the skip conditions. */
class SqrtCompareRewriteSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  graft.GraftExtensions.register(spark)

  // 1-d vectors make distance == |a - q| with exactly controllable
  // squared values; include denormal-adjacent and boundary cases
  private lazy val vals: Seq[Double] = {
    val base = Seq(0.0, 0.1, 0.25, 0.5, 0.7, 1.0, 1.5, 2.0, 1e-8, 123.456)
    base ++ base.map(math.nextUp) ++ base.map(math.nextAfter(_, -1.0)).filter(_ >= 0)
  }

  private lazy val df = vals.zipWithIndex
    .map { case (v, i) => (i.toLong, Seq(v.toFloat)) }
    .toDF("id", "vec").cache()

  private def q = typedLit(Seq(0.0f))

  private def dist = VectorFunctions.euclidean(col("vec"), q)

  test("bit-exact parity with per-row math.sqrt on boundary radii, all comparators") {
    val truth = df.select(col("id"),
        VectorFunctions.squaredEuclidean(col("vec"), q).as("sq"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // radii engineered to sit ON fl(sqrt) outputs (the boundary ulps
    // where the naive r*r rewrite flips rows)
    val radii = truth.values.map(math.sqrt).toSeq ++
      truth.values.map(v => math.nextUp(math.sqrt(v))) ++
      truth.values.map(v => math.nextAfter(math.sqrt(v), -1.0)) ++ Seq(0.0, 0.5)
    for (r <- radii.distinct) {
      def ids(c: org.apache.spark.sql.Column) =
        df.filter(c).select("id").as[Long].collect().toSet
      assert(ids(dist <= r) == truth.collect { case (i, s) if math.sqrt(s) <= r => i }.toSet, s"<= $r")
      assert(ids(dist < r) == truth.collect { case (i, s) if math.sqrt(s) < r => i }.toSet, s"< $r")
      assert(ids(dist > r) == truth.collect { case (i, s) if math.sqrt(s) > r => i }.toSet, s"> $r")
      assert(ids(dist >= r) == truth.collect { case (i, s) if math.sqrt(s) >= r => i }.toSet, s">= $r")
      assert(ids(lit(r) >= dist) == truth.collect { case (i, s) if r >= math.sqrt(s) => i }.toSet, s"mirror $r")
    }
  }

  test("the executed plan's filter carries no SQRT; SQL path rewrites too") {
    val filtered = df.filter(dist <= 0.5)
    filtered.count()
    val conds = collectPlanNodes(filtered) {
      case f: org.apache.spark.sql.execution.FilterExec => f.condition
    }
    assert(conds.nonEmpty)
    assert(!conds.exists(_.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.Sqrt])),
      s"sqrt survived the rewrite: $conds")
    df.createOrReplaceTempView("sqr_t")
    val viaSql = spark.sql(
      "SELECT id FROM sqr_t WHERE graft_l2(vec, array(CAST(0.0 AS FLOAT))) <= 0.5")
    viaSql.count()
    val sqlConds = collectPlanNodes(viaSql) {
      case f: org.apache.spark.sql.execution.FilterExec => f.condition
    }
    assert(sqlConds.nonEmpty && !sqlConds.exists(_.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.Sqrt])))
  }

  test("skips: negative/NaN radius keeps rows correct; non-literal radius untouched") {
    assert(df.filter(dist <= -1.0).count() == 0)
    assert(df.filter(dist >= -1.0).count() == df.count())
    // Spark SQL orders NaN GREATER than every double (not Java's
    // all-comparisons-false), so <= NaN keeps every row; the rule
    // skips NaN radii and must not disturb that native semantic
    assert(df.filter(dist <= Double.NaN).count() == df.count())
    assert(df.filter(dist > Double.NaN).count() == 0)
    // radius from a COLUMN (not foldable): must still answer correctly
    val withR = df.withColumn("r", (col("id") % 2).cast("double"))
    val got = withR.filter(dist <= col("r")).select("id").as[Long].collect().toSet
    val truth = df.select(col("id"),
        VectorFunctions.squaredEuclidean(col("vec"), q).as("sq"))
      .collect().collect {
        case r if math.sqrt(r.getDouble(1)) <= (r.getLong(0) % 2).toDouble => r.getLong(0)
      }.toSet
    assert(got == truth)
  }
}
