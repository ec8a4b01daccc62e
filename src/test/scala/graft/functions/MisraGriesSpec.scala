package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Misra–Gries summary ([[SketchFunctions.mgSummary]]) and the exact
  * two-pass heavy-hitter consumer
  * ([[TextAnalysis.frequentNgrams]]): coverage guarantee, count error
  * band, partition invariance of the GUARANTEE (not the candidate
  * set), the pass-1 bounded-state plan, pass-2 broadcast, the runtime
  * coverage guard, and exact parity with a naive groupBy count. */
class MisraGriesSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  // 10_000 rows: "heavy" 2000×, "warm" 600×, the rest unique fillers.
  private def skewedRows: Seq[String] =
    Seq.fill(2000)("heavy") ++ Seq.fill(600)("warm") ++
      (0 until 7400).map(i => s"filler-$i")

  test("every item with frequency > N/k survives; counts undercount by at most N/k") {
    val n = 10000.0
    for (parts <- Seq(1, 16)) {
      val m = skewedRows.toDF("s").repartition(parts)
        .agg(SketchFunctions.mgSummary(col("s"), 32)).head
        .getMap[String, Long](0)
      val slack = n / 32.0 // = 312.5
      assert(m.contains("heavy") && m.contains("warm"), s"parts=$parts: $m")
      assert(m("heavy") <= 2000 && m("heavy") >= 2000 - slack, s"parts=$parts: ${m("heavy")}")
      assert(m("warm") <= 600 && m("warm") >= 600 - slack, s"parts=$parts: ${m("warm")}")
      assert(m.size <= 32)
    }
  }

  test("below k distinct items the summary is the exact count map") {
    val m = (0 until 900).map(i => s"v${i % 9}").toDF("s")
      .repartition(5)
      .agg(SketchFunctions.mgSummary(col("s"), 64)).head
      .getMap[String, Long](0)
    assert(m.size == 9 && m.values.forall(_ == 100L))
  }

  test("frequentNgrams == naive groupBy/HAVING, including under candidate pruning") {
    // ~3700 (doc, trigram) pairs; k=1024 forces no pruning, k=128 prunes
    // (N/k ≈ 29) — both must produce the identical exact answer for a
    // threshold above N/k.
    val docs = (0 until 300).map { i =>
      val tail = s"unique$i tail$i mark$i extra$i"
      (i.toLong, if (i % 3 == 0) s"the quick brown fox $tail" else s"plain filler words $tail")
    }.toDF("doc_id", "text")
    val naive = docs
      .select(explode(array_distinct(
        TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3))).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 50)
      .orderBy(col("df").desc, col("shingle"))
      .collect().toSeq
    assert(naive.nonEmpty) // the fixture has signal
    for (k <- Seq(1024, 128)) {
      val got = TextAnalysis.frequentNgrams(docs, n = 3, k = k, minCount = 50L)
        .collect().toSeq
      assert(got == naive, s"k=$k")
    }
  }

  test("coverage guard refuses a threshold the summary cannot certify") {
    val docs = (0 until 200).map(i => (i.toLong, s"a b c d e f g h i j k$i"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.frequentNgrams(docs, n = 3, k = 4, minCount = 2L)
    }
    assert(e.getMessage.contains("raise k"))
  }

  test("plan: pass-1 partial+final bounded-state aggregate; pass-2 broadcasts candidates") {
    val docs = (0 until 400).map(i => (i.toLong, s"alpha beta gamma delta u$i v$i"))
      .toDF("doc_id", "text").repartition(8)
    // Pass 1 plan shape: the MG aggregate partials before the 1-row reduce.
    val p1 = docs.select(explode(array_distinct(
        TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3))).as("shingle"))
      .agg(SketchFunctions.mgSummary(col("shingle"), 256).as("m"))
    p1.count()
    val aggs = collectPlanNodes(p1) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(aggs.size == 2, s"expected partial+final MG stages, got ${aggs.size}")
    // End-to-end: pass 2's candidate join is a broadcast, never a
    // shuffled join of the exploded n-gram stream.
    val out = TextAnalysis.frequentNgrams(docs, n = 3, k = 256, minCount = 100L)
    out.count()
    val bj = collectPlanNodes(out) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bj.nonEmpty, "candidate filter should be a broadcast hash join")
  }

  test("SQL surface: graft_mg_summary registered and map-typed") {
    graft.GraftExtensions.register(spark)
    (0 until 500).map(i => if (i % 2 == 0) "even" else s"odd-$i").toDF("s")
      .createOrReplaceTempView("mg_in")
    val m = spark.sql("SELECT graft_mg_summary(s, 16) AS m FROM mg_in")
      .head.getMap[String, Long](0)
    assert(m.contains("even") && m("even") <= 250 && m("even") >= 250 - 500 / 16)
  }
}
