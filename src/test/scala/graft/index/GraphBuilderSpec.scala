package graft.index

import graft.SparkSpec

/** Degenerate-input guards for [[GraphBuilder.fitLsh]]'s auto width
  * (r12 advisor: < 2 sampled rows made the gap array empty →
  * ArrayIndexOutOfBoundsException; a duplicate-heavy sample put 0 at
  * the target quantile and the 1e-6 floor quasi-disabled the seed). */
class GraphBuilderSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Seq[Float])]) = {
    val ss = spark
    import ss.implicits._
    rows.toDF("id", "vec")
  }

  test("fitLsh on a single-row corpus yields a sane fixed width") {
    val m = GraphBuilder.fitLsh(df(Seq((0L, Seq(1f, 2f, 3f)))), Metric.Euclidean)
    assert(m.bucketLength === 1.0)
    assert(m.projections.length === 8)
  }

  test("fitLsh on an all-duplicates corpus falls back, not 1e-6") {
    val rows = (0L until 40L).map(i => (i, Seq(0.5f, -1f, 2f, 0f)))
    val m = GraphBuilder.fitLsh(df(rows), Metric.Euclidean)
    assert(m.bucketLength === 1.0,
      "all projection gaps are zero — the fixed-width fallback must apply")
  }

  test("fitLsh floors a duplicate-heavy quantile at the smallest nonzero gap") {
    val rng = new scala.util.Random(11)
    // 90% exact copies of one vector + 10 distinct rows: the target
    // quantile of pair gaps is very likely 0, but nonzero gaps exist
    val dup = Seq.fill(8)(1f)
    val rows = (0L until 90L).map(i => (i, dup)) ++
      (90L until 100L).map(i => (i, Seq.fill(8)(rng.nextFloat() * 4f)))
    val m = GraphBuilder.fitLsh(df(rows), Metric.Euclidean)
    assert(m.bucketLength > 1e-5,
      s"width ${m.bucketLength} must be calibrated off the nonzero gaps")
  }
}
