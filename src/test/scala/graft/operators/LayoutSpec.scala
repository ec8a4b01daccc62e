package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout key: bit-exact vs a scalar reference interleave,
  * and the locality property the layout exists for. */
class LayoutSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def refZ(a: Long, b: Long): Long = {
    def spread(v: Long): Long = {
      var x = v & 0xFFFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      (x | (x << 1)) & 0x5555555555555555L
    }
    spread(a) | (spread(b) << 1)
  }

  test("zValue2 == scalar reference on boundary values and a fuzz grid") {
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (12345L, 67890L)) ++
      (0 until 300).map(_ => (rnd.nextInt(Int.MaxValue).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue2(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == refZ(a, b), s"($a, $b)")
    }
  }

  test("out-of-domain keys (negative or >= 2^31) yield NULL, not a corrupt key") {
    // b's bit 31 would land on the long SIGN bit: such a z sorts
    // before every positive z and silently breaks range clustering —
    // the contract maps the whole out-of-domain space to NULL instead
    val cases = Seq((0x80000000L, 1L), (1L, 0x80000000L),
      (0xFFFFFFFFL, 0xFFFFFFFFL), (-1L, 5L), (5L, -1L))
    val got = cases.toDF("a", "b")
      .select(Layout.zValue2(col("a"), col("b")).as("z")).collect()
    assert(got.forall(_.isNullAt(0)), s"expected all NULL, got ${got.toSeq}")
    // SQL surface agrees
    graft.GraftExtensions.register(spark)
    cases.toDF("a", "b").createOrReplaceTempView("zv_dom_t")
    assert(spark.sql("SELECT graft_zvalue2(a, b) FROM zv_dom_t")
      .collect().forall(_.isNullAt(0)))
  }

  test("SQL surface graft_zvalue2 matches the column API") {
    graft.GraftExtensions.register(spark)
    Seq((12345L, 67890L)).toDF("a", "b").createOrReplaceTempView("zv_t")
    val viaSql = spark.sql("SELECT graft_zvalue2(a, b) FROM zv_t")
      .collect().head.getLong(0)
    assert(viaSql == refZ(12345L, 67890L))
  }

  test("z-sorted buckets bound BOTH key spans (the pruning property)") {
    val rows = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val z = rows.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue2(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    // 16 equal z-range buckets over the 64x64 grid: each must confine
    // both coordinates to a 16x16 quadrant-block (perfect-grid case)
    z.grouped(z.length / 16).foreach { bucket =>
      val (as, bs) = (bucket.map(_._1), bucket.map(_._2))
      assert(as.max - as.min <= 16 && bs.max - bs.min <= 16,
        s"span a=${as.min}..${as.max} b=${bs.min}..${bs.max}")
    }
    // contrast: sorting by `a` alone leaves b unbounded in every slice
    val bySingle = rows.sortBy(_._1).take(rows.length / 16).map(_._2)
    assert(bySingle.max - bySingle.min == 63L)
  }
}
