package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The native [[graft.functions.expressions.TextStats]] kernel must
  * make [[TextAnalysis.withTextStats]] BIT-IDENTICAL to the HOF
  * formulation it replaced (size/array_distinct/aggregate/filter) —
  * q46's full stats block is hash-oracled and q85/q117/q134/q160 key
  * quality decisions on these exact doubles. Exercised over marker
  * tokens, unicode, whitespace shapes, empties, and a generated
  * corpus. */
class TextStatsKernelSpec extends SparkSpec {

  private val edgeCases = Seq(
    "", " ", "  ", "a", "the", "the the the",
    "the a of and to", // all en markers
    "el la de los y",  // es markers (must NOT count as stopwords)
    "café naïve café", // repeated multibyte
    "日本語 的 テキスト 的",
    "😀 a😀b 😀",
    ("word " * 30).trim, // long repetition: distinct_ratio floor
    (1 to 25).map(i => s"tok$i").mkString(" "), // nTok in [20,1000]
    ("x " * 1200).trim,  // nTok > 1000
    "supercalifragilisticexpialidocious short a", // avg len spread
    "Tabs\tand\nnewlines   collapse")

  test("withTextStats (native kernel) is bit-identical to the HOF twin, null text included") {
    val wordGen = Gen.oneOf(
      Gen.oneOf("the", "a", "of", "and", "to", "el", "la", "中文", "é"),
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.listOfN(3, Gen.chooseNum(0x20, 0xD7FF).map(_.toChar)).map(_.mkString))
    val docGen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val generated = Gen.listOfN(300, docGen)(
      org.scalacheck.Gen.Parameters.default, Seed(99L)).getOrElse(Nil)
    val ss = spark
    import ss.implicits._
    val df = ((edgeCases ++ generated).map(Option(_)) :+ Option.empty[String])
      .toDF("text")
    val outCols = Seq("n_chars", "n_tokens", "n_distinct_tokens",
      "distinct_ratio", "avg_token_len", "stopword_ratio", "quality_score")
    val native = TextAnalysis.withTextStats(df)
    val hof = TextAnalysis.withTextStatsHof(df)
    // row-for-row equality including null fields: hash the whole row
    val rowHash = (d: org.apache.spark.sql.DataFrame) =>
      d.select(hash(col("text") +: outCols.map(col): _*).as("h"))
        .collect().map(_.getInt(0)).toSeq
    assert(rowHash(native) == rowHash(hof),
      "native withTextStats diverges from the HOF formulation")
  }

  test("native shingles are bit-identical to the HOF twin (k = 1, 3, 8; null/short/unicode)") {
    val wordGen = Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.oneOf("the", "中文", "é", "😀", "a-b", ""))
    val arrGen = Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, wordGen))
    val generated = Gen.listOfN(250, arrGen)(
      org.scalacheck.Gen.Parameters.default, Seed(11L)).getOrElse(Nil)
    val ss = spark
    import ss.implicits._
    val df = (generated.map(Option(_)) :+ Option.empty[Seq[String]]).toDF("toks")
    for (k <- Seq(1, 3, 8)) {
      val diff = df.select(
          TextAnalysis.shingles(col("toks"), k).as("nat"),
          TextAnalysis.shinglesHof(col("toks"), k).as("hof"))
        .filter(not(col("nat") <=> col("hof")))
        .collect()
      assert(diff.isEmpty,
        s"k=$k: native shingles != HOF on ${diff.length} rows: ${diff.take(3).mkString}")
    }
  }

  test("quality_score distribution survives the kernel (sf0.001 fixture)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val native = TextAnalysis.withTextStats(docs)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        col("distinct_ratio"), col("avg_token_len"), col("stopword_ratio"),
        col("quality_score"))
    val hof = TextAnalysis.withTextStatsHof(docs)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        col("distinct_ratio"), col("avg_token_len"), col("stopword_ratio"),
        col("quality_score"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "fixture stats differ between kernel and HOF")
  }
}
