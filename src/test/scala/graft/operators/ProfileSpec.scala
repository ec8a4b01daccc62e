package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** Table profiler: hand-computed measures on a frame with nulls and
  * mixed types, plan shape (one scan), and the KMV approx twin's
  * cardinality gate. */
class ProfileSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private lazy val df = Seq(
    (Some(1L), Some("aa"), Some(10L)),
    (Some(2L), Some("bbbb"), Some(20L)),
    (Some(2L), None, Some(30L)),
    (None, Some("aa"), Some(40L)),
    (Some(4L), Some("c"), None)
  ).toDF("id", "s", "v")

  test("profileTable: hand-computed nulls/distinct/minmax/means per column") {
    val rows = Profile.profileTable(df, Seq("id", "s", "v")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("id", "s", "v")) // ordered
    val byCol = rows.map(r => r.getString(0) -> r).toMap

    val id = byCol("id")
    assert(id.getLong(1) == 5L)                 // n_rows
    assert(id.getLong(2) == 1L)                 // n_null
    assert(id.getLong(3) == 3L)                 // distinct {1,2,4}
    assert(id.getDouble(4) == 0.8)              // completeness 4/5
    assert(id.getString(5) == "1" && id.getString(6) == "4")
    assert(id.getDouble(7) == 2.25)             // mean (1+2+2+4)/4
    assert(id.isNullAt(8))                      // avg_len null for numeric

    val s = byCol("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 3L) // {aa, bbbb, c}
    assert(s.getString(5) == "aa" && s.getString(6) == "c")
    assert(s.isNullAt(7))                       // mean_v null for string
    assert(s.getDouble(8) == 2.25)              // (2+4+2+1)/4

    val v = byCol("v")
    assert(v.getLong(2) == 1L && v.getLong(3) == 4L)
    assert(v.getDouble(7) == 25.0)
  }

  test("profileTable: all-null column reports zero completeness, null stats") {
    val d2 = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val s = Profile.profileTable(d2, Seq("s")).collect().head
    assert(s.getLong(2) == 2L && s.getLong(3) == 0L)
    assert(s.getDouble(4) == 0.0)
    assert(s.isNullAt(5) && s.isNullAt(6) && s.isNullAt(8))
  }

  test("profileTableApprox: KMV distinct within 15% of exact on 2k values") {
    val wide = (1 to 2000).map(i => (i.toLong, s"v${i % 700}")).toDF("id", "s")
    val exact = Profile.profileTable(wide, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.profileTableApprox(wide, Seq("id", "s"), k = 256)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    for (c <- Seq("id", "s")) {
      val (e, a) = (exact(c).toDouble, approx(c).toDouble)
      assert(math.abs(a - e) / e <= 0.15, s"$c: approx $a vs exact $e")
    }
    // non-distinct measures are identical between the twins
    val eRest = Profile.profileTable(wide, Seq("id", "s"))
      .drop("n_distinct").collect().toSeq
    val aRest = Profile.profileTableApprox(wide, Seq("id", "s"), k = 256)
      .drop("n_distinct").collect().toSeq
    assert(eRest == aRest)
  }

  test("profileTable plan: one scan feeding the agg (no self-union of scans)") {
    val prof = Profile.profileTable(df, Seq("id", "s", "v"))
    prof.collect()
    val leaves = collectPlanNodes(prof) {
      case p: org.apache.spark.sql.execution.LocalTableScanExec => p
    }
    // the source is scanned exactly once for the whole profile
    assert(leaves.size == 1, s"expected 1 scan leaf, got: ${leaves.map(_.nodeName)}")
  }

  test("knnJoin (IVF co-partitioned) finds the planted nearest pair; " +
      "knnJoinExact agrees") {
    // 40 vectors in 2 tight blobs + one planted twin pair
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array.tabulate(8)(d => base + (i * (d + 1) % 7) * 0.01f).toSeq)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.knnJoinExact(vecs, vecs, 3, excludeSelf = true)
    val ivf = Similarity.knnJoin(vecs, vecs, 3, cells = 4, nprobe = 4,
      excludeSelf = true)
    // nprobe == cells -> every cell probed -> IVF neighbor set == exact
    def sets(rows: Array[Row]) = rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val (es, is) = (sets(exact.collect()), sets(ivf.collect()))
    assert(es.keySet == is.keySet && es.keySet.size == 40)
    assert(es.forall { case (q, s) => is(q) == s })
    // no self matches anywhere
    assert(exact.where(col("query_id") === col("neighbor_id")).count() == 0)
    assert(ivf.where(col("query_id") === col("neighbor_id")).count() == 0)
  }
}
