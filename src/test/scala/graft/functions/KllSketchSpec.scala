package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KLL quantile sketch: rank-error bounds under adversarial input
  * orders and partitionings, exactness below capacity, NULL/NaN
  * contracts. (The end-to-end gate is q151's measured rank_recall.) */
class KllSketchSpec extends SparkSpec {

  private val Probs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)

  private def rankErrs(values: Seq[Double], numPartitions: Int): Seq[Double] = {
    val ss = spark
    import ss.implicits._
    val df = values.toDF("x").repartition(numPartitions)
    val est = df.agg(SketchFunctions.kllQuantiles(col("x"), Probs).as("e"))
      .head().getSeq[Double](0)
    val sorted = values.sorted
    // rank error against the TIE INTERVAL [frac(< est), frac(<= est)]:
    // with heavy repeats even the exact quantile's point rank jumps
    // past p, so distance-to-interval is the meaningful residual
    est.zip(Probs).map { case (e, p) =>
      val lo = sorted.count(_ < e).toDouble / sorted.size
      val hi = sorted.count(_ <= e).toDouble / sorted.size
      if (p < lo) lo - p else if (p > hi) p - hi else 0.0
    }
  }

  test("exact below capacity: every estimate is the true lower quantile") {
    val ss = spark
    import ss.implicits._
    val values = (1 to 100).map(_.toDouble)
    val est = values.toDF("x").repartition(3)
      .agg(SketchFunctions.kllQuantiles(col("x"), Probs, k = 256).as("e"))
      .head().getSeq[Double](0)
    // lower quantile of 1..100 at p: ceil(p * 100)
    assert(est == Probs.map(p => math.max(1, math.ceil(p * 100).toInt).toDouble))
  }

  test("rank error stays small on 50k values across orders and partitionings") {
    val asc = (1 to 50000).map(_.toDouble)
    // adversarial: descending, and an interleaved shuffle-ish order
    val desc = asc.reverse
    val inter = asc.grouped(1000).toSeq.reverse.flatten
    for ((vs, label) <- Seq((asc, "asc"), (desc, "desc"), (inter, "interleaved"));
         parts <- Seq(1, 7, 32)) {
      val errs = rankErrs(vs, parts)
      assert(errs.max < 0.02, s"rank err ${errs.max} at $label/$parts parts")
    }
  }

  test("skewed distribution (zipf-ish repeats) keeps the bound") {
    val vs = (1 to 200).flatMap(i => Seq.fill(40000 / (i * i) + 1)(i.toDouble))
    val errs = rankErrs(vs, 11)
    assert(errs.max < 0.02, s"rank err ${errs.max} on skewed input")
  }

  test("NULLs are skipped; NaN raises") {
    val ss = spark
    import ss.implicits._
    val withNulls = Seq[Option[Double]](Some(1.0), None, Some(2.0), None, Some(3.0))
      .toDF("x")
    val est = withNulls.agg(SketchFunctions.kllQuantiles(col("x"), Seq(0.5)).as("e"))
      .head().getSeq[Double](0)
    assert(est == Seq(2.0))
    val ex = intercept[Exception] {
      Seq(1.0, Double.NaN).toDF("x")
        .agg(SketchFunctions.kllQuantiles(col("x"), Seq(0.5))).collect()
    }
    assert(ex.getMessage != null)
  }
}
