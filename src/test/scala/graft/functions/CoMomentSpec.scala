package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CoMomentAgg contract: exact fixed-point cells, partition-order
  * independence (merge correctness), null skipping, and the
  * length-mismatch guard. */
class CoMomentSpec extends SparkSpec {

  private def fp(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong

  private def vecs(rows: Seq[Seq[Float]]) = {
    val ss = spark
    import ss.implicits._
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
  }

  private val sample = Seq(
    Seq(1.0f, -2.0f), Seq(0.5f, 0.25f), Seq(-1.5f, 3.0f))

  private def cells(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.agg(VectorFunctions.coMoment(col("embedding"), 2).as("m"))
      .head().getSeq[Long](0)

  test("buffer cells are the exact fixed-point sums") {
    val m = cells(vecs(sample))
    // layout: [n, S1, S2, P11, P12, P22]
    assert(m(0) == 3L)
    assert(m(1) == sample.map(v => fp(v(0).toDouble)).sum)
    assert(m(2) == sample.map(v => fp(v(1).toDouble)).sum)
    assert(m(3) == sample.map(v => fp(v(0).toDouble * v(0).toDouble)).sum)
    assert(m(4) == sample.map(v => fp(v(0).toDouble * v(1).toDouble)).sum)
    assert(m(5) == sample.map(v => fp(v(1).toDouble * v(1).toDouble)).sum)
  }

  test("result is independent of partitioning (merge path)") {
    val many = (0 until 97).map(i => Seq(i * 0.013f - 0.5f, (i % 11) * 0.21f))
    val one = cells(vecs(many).coalesce(1))
    val four = cells(vecs(many).repartition(7))
    assert(one == four)
  }

  test("null vectors are skipped, not counted") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None), (3L, Some(Seq(3.0f, 4.0f))))
      .toDF("vec_id", "embedding")
    val m = cells(df)
    assert(m(0) == 2L)
  }

  test("a wrong-length vector raises instead of truncating") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] { cells(df) }
    assert(e.getMessage != null)
  }
}
