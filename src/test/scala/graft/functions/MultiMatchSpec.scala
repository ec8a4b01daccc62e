package graft.functions

import graft.SparkSpec
import graft.functions.expressions.AhoCorasick
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Aho–Corasick multi-pattern screen: automaton unit cases (overlap,
  * nesting, suffix outputs, UTF-8), a deterministic fuzz against naive
  * contains, and the DataFrame/SQL surfaces (codegen path). */
class MultiMatchSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  private def naive(text: String, pats: Seq[String]): Seq[Int] =
    pats.zipWithIndex.collect { case (p, i) if text.contains(p) => i + 1 }

  test("automaton: overlapping / nested / suffix patterns all reported") {
    // "he"/"she"/"his"/"hers" is the canonical AC example (Aho &
    // Corasick 1975, fig. 1) — "ushers" must hit she, he, hers.
    val ac = new AhoCorasick(Array("he", "she", "his", "hers"))
    assert(ac.matchSet("ushers".getBytes("UTF-8")).toSeq == Seq(0, 1, 3))
    // nested prefixes: every level ends inside the longer match
    val ac2 = new AhoCorasick(Array("a", "aa", "aaa"))
    assert(ac2.matchSet("xaaz".getBytes("UTF-8")).toSeq == Seq(0, 1))
    assert(ac2.matchSet("aaa".getBytes("UTF-8")).toSeq == Seq(0, 1, 2))
    // match via fail-link output only (suffix of another pattern)
    val ac3 = new AhoCorasick(Array("abcd", "bc"))
    assert(ac3.matchSet("zabcz".getBytes("UTF-8")).toSeq == Seq(1))
    // multi-byte UTF-8 (byte-level trie must not split code points)
    val ac4 = new AhoCorasick(Array("日本", "本語"))
    assert(ac4.matchSet("日本語".getBytes("UTF-8")).toSeq == Seq(0, 1))
  }

  test("automaton: 500-case deterministic fuzz vs naive contains") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 0 until 500) {
      val pats = (0 until 1 + rnd.nextInt(6)).map(_ => randStr(1 + rnd.nextInt(4))).distinct
      val text = randStr(rnd.nextInt(40))
      val ac = new AhoCorasick(pats.toArray)
      assert(ac.matchSet(text.getBytes("UTF-8")).toSeq.map(_ + 1) == naive(text, pats),
        s"text='$text' pats=$pats")
    }
  }

  test("multiMatch column: codegen path, null text, empty result") {
    val df = Seq(
      (1L, Some("the slow fast lane")),
      (2L, Some("nothing here")),
      (3L, Option.empty[String])
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.multiMatch(col("text"), Seq("slow fast", "lane", "zz")).as("m"))
      .orderBy(col("id")).collect()
    assert(out(0).getSeq[Int](1) == Seq(1, 2))
    assert(out(1).getSeq[Int](1) == Seq.empty)
    assert(out(2).isNullAt(1))
  }

  test("SQL surface graft_multi_match round-trips through the registry") {
    graft.GraftExtensions.register(spark)
    Seq(("ushers lane")).toDF("t").createOrReplaceTempView("mm_t")
    val r = spark.sql(
      "SELECT graft_multi_match(t, array('she', 'zz', 'lane')) AS m FROM mm_t")
      .collect().head.getSeq[Int](0)
    assert(r == Seq(1, 3))
  }

  test("countAll: all match positions; equals replace-count for borderless patterns") {
    val ac = new AhoCorasick(Array("aa", "slow fast", "he"))
    // "aa" self-overlaps: AC reports every ending position (2 in
    // "aaa"), replace-count reports the non-overlapping 1 — the
    // documented divergence, which is why q167 uses borderless phrases
    assert(ac.countAll("aaa".getBytes("UTF-8")).toSeq == Seq(2, 0, 0))
    val text = "he said slow fast and slow fast again, hehe"
    def replCount(t: String, p: String) = (t.length - t.replace(p, "").length) / p.length
    val counts = ac.countAll(text.getBytes("UTF-8"))
    assert(counts(1) == replCount(text, "slow fast") && counts(1) == 2)
    assert(counts(2) == 3) // "he", "hehe" -> all positions
    assert(counts(2) == replCount(text, "he")) // 'he' has no border: equal
  }

  test("multiMatchCounts column + SQL surface agree with the kernel") {
    val df = Seq((1L, Some("x slow fast y slow fast")), (2L, None))
      .toDF("id", "text")
    val viaCol = df.orderBy("id").select(
        TextAnalysis.multiMatchCounts(col("text"), Seq("slow fast", "zz")))
      .collect()
    assert(viaCol(0).getSeq[Int](0) == Seq(2, 0))
    assert(viaCol(1).isNullAt(0))
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("mmc_t")
    val viaSql = spark.sql(
      "SELECT graft_multi_count(text, array('slow fast', 'zz')) FROM mmc_t " +
        "WHERE id = 1").collect().head.getSeq[Int](0)
    assert(viaSql == Seq(2, 0))
  }

  test("guards: empty pattern list / empty pattern string refuse loudly") {
    val df = Seq("x").toDF("t")
    intercept[Exception] {
      df.select(TextAnalysis.multiMatch(col("t"), Seq.empty)).collect()
    }
    intercept[Exception] {
      df.select(TextAnalysis.multiMatch(col("t"), Seq("a", ""))).collect()
    }
  }
}
