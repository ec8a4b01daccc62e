package graft.operators

import graft.SparkSpec

/** Hand-computable cases for the corpus-statistics operators added for
  * the training-data pipeline: Gopher-style repetition fractions and
  * the CCNet-style unigram NLL score. (End-to-end numerics are
  * oracle-checked by the driver via q64/q70; these pin the operator
  * definitions on inputs small enough to verify by hand.)
  */
class TextAnalysisSpec extends SparkSpec {

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference BPE encode in plain Scala: rules in rank order, each
    * applied exhaustively leftmost-first — the independent twin the
    * column fold must match. */
  private def refBpe(word: String): Seq[String] = {
    var syms = word.split("").toSeq
    for ((l, r) <- TextAnalysis.BpeMerges) {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      for (s <- syms) {
        if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = l + r
        else out += s
      }
      syms = out.toSeq
    }
    syms
  }

  test("bpeSymbols runs the frozen merge table exactly like a reference BPE encode") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    val words = Seq("the", "there", "ingesting", "and", "information",
      "a", "x", "zzz", "threshold", "ورد", "东西")
    val got = words.toDF("w")
      .select(col("w"), TextAnalysis.bpeSymbols(col("w")).as("s"))
      .as[(String, Seq[String])].collect().toMap
    for (w <- words)
      assert(got(w) == refBpe(w), s"BPE of '$w': got ${got(w)}, want ${refBpe(w)}")
    // pinned known cases: full merges and rank-order precedence
    assert(got("the") == Seq("the"))
    assert(refBpe("the") == Seq("the"))
    assert(got("and") == Seq("and"))
    // adjacent-run behavior: leftmost pair merges first
    assert(got("zzz") == Seq("z", "z", "z")) // no rule for (z,z)
  }

  test("learnBpeMerges: frequency-ranked rounds with iterative re-symbolization") {
    val ss = spark
    import ss.implicits._
    // vocab: "aaab" x2, "ab" x1
    // r1: (a,a)=4 beats (a,b)=3 -> merge aa
    // r2: on [aa,a,b]/[a,b]: (a,b)=3 beats (aa,a)=2 -> merge ab
    // r3: on [aa,ab]/[ab]: (aa,ab)=2 -> merge aaab
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val got = TextAnalysis.learnBpeMerges(docs, nMerges = 3)
    assert(got == Seq(("a", "a", 4L), ("a", "b", 3L), ("aa", "ab", 2L)))
  }

  test("learnBpeMerges stops early when no repeated-pair mass remains") {
    val ss = spark
    import ss.implicits._
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    assert(TextAnalysis.learnBpeMerges(docs, nMerges = 3) == Seq.empty)
  }

  test("repetitionStats computes top-n-gram fractions and the flag by definition") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "a a a b"), // top1 3/4, top2 "a a" 2/3, top3 1/2 -> repetitive
      (2L, (0 until 36).map(i => s"t$i").mkString(" ")), // all distinct, long enough -> clean
      (3L, "solo") // shorter than the gram sizes -> coalesced zeros
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out(1L).getAs[Double]("top1gram_frac") == 0.75)
    assert(out(1L).getAs[Double]("top2gram_frac") == round4(2.0 / 3.0))
    assert(out(1L).getAs[Double]("top3gram_frac") == 0.5)
    assert(out(1L).getAs[Boolean]("repetitive"))

    assert(out(2L).getAs[Double]("top1gram_frac") == round4(1.0 / 36.0))
    assert(out(2L).getAs[Double]("top2gram_frac") == round4(1.0 / 35.0))
    assert(out(2L).getAs[Double]("top3gram_frac") == round4(1.0 / 34.0))
    assert(!out(2L).getAs[Boolean]("repetitive"))

    assert(out(3L).getAs[Double]("top1gram_frac") == 1.0)
    assert(out(3L).getAs[Double]("top2gram_frac") == 0.0)
    assert(out(3L).getAs[Double]("top3gram_frac") == 0.0)
    assert(out(3L).getAs[Boolean]("repetitive"))
  }

  test("repetitionStats is total over the input: a NULL-text doc reports all-zero fracs") {
    val ss = spark
    import ss.implicits._
    val docs = Seq((1L, "x y"), (2L, null)).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(2L).getAs[Double]("top1gram_frac") == 0.0)
    assert(!out(2L).getAs[Boolean]("repetitive"))
  }

  test("repetitionStats rejects maxN without a matching flag threshold") {
    val ss = spark
    import ss.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.repetitionStats(docs, maxN = TextAnalysis.RepetitionThresholds.length + 1)
    }
  }

  test("unigramNllScores: order-independent fixed-point sum matches hand arithmetic") {
    val ss = spark
    import ss.implicits._
    // corpus: a=2, b=2, c=1, total=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramNllScores(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    val fpA = math.round(-math.log(2.0 / 5.0) * 10000) // = fpB
    val fpC = math.round(-math.log(1.0 / 5.0) * 10000)
    assert(out(1L).getAs[Long]("n_tokens") == 3L)
    assert(out(1L).getAs[Double]("avg_nll") == round4(3 * fpA / 10000.0 / 3))
    assert(out(2L).getAs[Long]("n_tokens") == 2L)
    assert(out(2L).getAs[Double]("avg_nll") == round4((fpA + fpC) / 10000.0 / 2))
  }

  test("bigramNllScores: chain-rule NLL (first token unigram, rest conditional bigram)") {
    val ss = spark
    import ss.implicits._
    // corpus tokens: doc1 = a a b, doc2 = a b. Unigrams: a=3, b=2, N=5.
    // Bigram events: (a,a) doc1, (a,b) doc1, (a,b) doc2.
    // Contexts: a -> 3 events. p(a|a)=1/3, p(b|a)=2/3.
    val docs = Seq((1L, "a a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNllScores(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    val fpUniA = math.round(-math.log(3.0 / 5.0) * 10000)
    val fpAA = math.round(-math.log(1.0 / 3.0) * 10000)
    val fpAB = math.round(-math.log(2.0 / 3.0) * 10000)
    assert(out(1L).getAs[Long]("n_tokens") == 3L)
    assert(out(1L).getAs[Double]("avg_nll") == round4((fpUniA + fpAA + fpAB) / 10000.0 / 3))
    assert(out(2L).getAs[Long]("n_tokens") == 2L)
    assert(out(2L).getAs[Double]("avg_nll") == round4((fpUniA + fpAB) / 10000.0 / 2))
  }

  test("bigramNllScores: a single-token doc scores on the unigram leg alone") {
    val ss = spark
    import ss.implicits._
    // corpus: doc1 = c (no bigrams anywhere -> docBig is empty)
    val docs = Seq((1L, "c"), (2L, "d e")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNllScores(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val fpC = math.round(-math.log(1.0 / 3.0) * 10000)
    assert(out(1L).getAs[Long]("n_tokens") == 1L)
    assert(out(1L).getAs[Double]("avg_nll") == round4(fpC / 10000.0))
    // doc2: first token d unigram 1/3; bigram (d,e) is the only d-context
    // event -> p(e|d)=1 -> nll 0
    assert(out(2L).getAs[Double]("avg_nll") == round4(fpC / 10000.0 / 2))
  }

  test("withPiiRedaction counts and redacts emails, IPv4s, and phone fragments") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "mail a.user+tag@sub.example.org then 192.168.0.1 and 555-0199 end"),
      (2L, "two mails x@y.io and z@w.co no ip"),
      (3L, "clean text with just words"),
      (4L, "version 1.2 is not an ip, 12-345 is not a phone")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withPiiRedaction(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") == 1L)
    assert(out(1L).getAs[Long]("n_ips") == 1L)
    assert(out(1L).getAs[Long]("n_phones") == 1L)
    assert(out(1L).getAs[String]("redacted") ==
      "mail <EMAIL> then <IP> and <PHONE> end")
    assert(out(2L).getAs[Long]("n_emails") == 2L)
    assert(out(2L).getAs[Long]("n_ips") == 0L)
    assert(out(2L).getAs[String]("redacted") == "two mails <EMAIL> and <EMAIL> no ip")
    assert(out(3L).getAs[String]("redacted") == "clean text with just words")
    // near-miss literals must NOT be redacted
    assert(out(4L).getAs[String]("redacted") == out(4L).getAs[String]("text"))
  }

  test("withHashedLinearScore equals an independent recompute of the hash arithmetic") {
    val ss = spark
    import ss.implicits._
    def refHash(term: String): Long =
      if (term.isEmpty) 0L
      else term.map(_.toLong).reduceLeft((h, c) => (h * 31 + c) % 1000000007L)
    def refScore(text: String): (Long, Long) = {
      val toks = text.trim.toLowerCase.split("\\s+", -1).toSeq
      val fp = toks.map { t =>
        val idx = refHash(t) % TextAnalysis.HashedDim
        ((idx + 1) * 48271L) % 2001L - 1000L
      }.sum
      (toks.size.toLong, fp)
    }
    val texts = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "to be or not to be that is the question"),
      (3L, "zzz"),
      (4L, ""))
    val out = TextAnalysis.withHashedLinearScore(texts.toDF("doc_id", "text"))
      .select("doc_id", "n_tokens", "score_fp", "keep")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    texts.foreach { case (id, text) =>
      val (n, fp) = refScore(text)
      assert(out(id)._2 == n && out(id)._3 == fp,
        s"doc $id: got ${out(id)}, want (n=$n, fp=$fp)")
      assert(out(id)._4 == (fp > 0))
    }
  }

  test("normalizeUnicode: NFC collapses decomposed forms, NFKC folds compatibility chars, nulls pass") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "cafe\u0301"),   // decomposed: e + combining acute
      (2L, "caf\u00e9"),    // composed
      (3L, "\ufb01le"),     // fi-ligature (NFC-invariant, NFKC folds)
      (4L, null.asInstanceOf[String]))
    val df = rows.toDF("id", "t")
    val out = df.select(col("id"),
        TextAnalysis.normalizeUnicode(col("t")).as("nfc"),
        TextAnalysis.normalizeUnicode(col("t"), "NFKC").as("nfkc"),
        TextAnalysis.normalizeUnicode(col("t"), "NFD").as("nfd"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(out(1L) == (("caf\u00e9", "caf\u00e9", "cafe\u0301")))
    assert(out(2L) == (("caf\u00e9", "caf\u00e9", "cafe\u0301")))
    assert(out(3L) == (("\ufb01le", "file", "\ufb01le")))
    assert(out(4L) == ((null, null, null)))
    // the two source encodings hash identically after NFC -- the
    // dedup-identity property the operator exists for
    val hashes = df.filter(col("id") <= 2)
      .select(md5(TextAnalysis.normalizeUnicode(col("t")))).collect().map(_.getString(0))
    assert(hashes.distinct.length == 1)
  }

  test("pmiCollocations: hand-computed PMI over a tiny corpus, min-count filter applies") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    // unigrams: a=3 b=2 c=1 (n=6); bigrams: "a b"=2, "b a"=1, "a c"=1 (n=4)
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, minCount = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // only "a b" clears minCount=2: pmi = ln(2*6*6 / (4*3*2)) = ln(3)
    assert(out.toSeq == Seq(("a", "b", 2L,
      BigDecimal(math.log(3.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)),
      s"got ${out.toSeq}")
  }

  test("pmiCollocations: ONE tokenize/explode pass — all legs reuse the shared term shuffle") {
    val ss = spark
    import ss.implicits._
    // parquet-backed (like the real q116): exchange reuse requires the
    // scan legs to canonicalize equal, which file scans do and local
    // relations may not
    val dir = tmpDir("pmi-plan")
    Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val out = TextAnalysis.pmiCollocations(docs, minCount = 1L, k = 10)
    out.collect()
    // the single tokenize pass happens at the counts checkpoint; the
    // final plan must contain ZERO explode legs (before the fix it
    // re-tokenized the corpus once per leg — 3-4 Generate nodes)
    val gens = collectPlanNodes(out) {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gens.isEmpty,
      s"expected zero explode legs over the checkpointed counts, got ${gens.size}")
    graft.plans.Blocks.release(out)
  }

  test("chunkTokens: overlap, kept tail, short-doc single chunk, guards") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens, size 4 stride 2 -> 4 windows
      (2L, "x y"))                 // shorter than size -> one chunk
    val out = TextAnalysis.chunkTokens(docs.toDF("doc_id", "text"), size = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3)))).toMap
    assert(out == Map(
      (1L, 0) -> (("a b c d", 4)), (1L, 1) -> (("c d e f", 4)),
      (1L, 2) -> (("e f g h", 4)), (1L, 3) -> (("g h i j", 4)),
      (2L, 0) -> (("x y", 2))), s"got $out")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(docs.toDF("doc_id", "text"), size = 4, stride = 5)
    }
  }

  test("tokenDistributionDrift: identical slices drift 0; symmetric; bounded by ln 2") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    val a = Seq("alpha beta gamma", "alpha beta", "delta").toDF("text")
    val b = Seq("alpha epsilon", "zeta zeta zeta", "beta").toDF("text")
    // identical corpora: add-one smoothed p_a == p_b -> every term 0
    val same = TextAnalysis.tokenDistributionDrift(a, a)
    assert(same.agg(sum("js_fp")).head.getLong(0) == 0L)
    assert(same.filter(col("js_fp") =!= 0L).count() == 0)
    // symmetric in (a, b); contributions nonneg; total <= ln2 * 1e12
    val ab = TextAnalysis.tokenDistributionDrift(a, b)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val ba = TextAnalysis.tokenDistributionDrift(b, a)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ab == ba)
    assert(ab.values.forall(_ >= 0L))
    assert(ab.values.sum <= (math.log(2.0) * 1e12).toLong)
    assert(ab.values.sum > 0L)
    // partition invariance (fixed-point + integer sums)
    val ab13 = TextAnalysis.tokenDistributionDrift(a.repartition(13), b.repartition(7))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ab13 == ab)
  }

  test("vocabCoverage: hand-computed per-source coverage and OOV types") {
    val ss = spark
    import ss.implicits._
    // corpus counts: a=4, b=3, c=2, d=1 -> top-2 vocab {a, b}
    val df = Seq(
      ("s1", "a a b c"),   // 4 toks, covered 3 (a,a,b), oov types {c}
      ("s1", "a d"),       // 2 toks, covered 1,        oov {d}
      ("s2", "b b a c")    // 4 toks, covered 3,        oov {c}
    ).toDF("source", "text")
    val rows = TextAnalysis.vocabCoverage(df, vocabSize = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("s1").getLong(1) == 6L)
    assert(rows("s1").getDouble(2) == math.rint(4.0 / 6.0 * 1e6) / 1e6)
    assert(rows("s1").getLong(3) == 2L) // {c, d}
    assert(rows("s2").getLong(1) == 4L)
    assert(rows("s2").getDouble(2) == 0.75)
    assert(rows("s2").getLong(3) == 1L) // {c}
    // vocab ties: with vocabSize=3, c (count 2) enters before d
    val r3 = TextAnalysis.vocabCoverage(df, vocabSize = 3)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(r3 == Map("s1" -> 1L, "s2" -> 0L)) // only d stays OOV
  }

  test("tfidfKeywords: rare term outranks frequent ubiquitous term") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, "common common common rare"),
      (2L, "common other"),
      (3L, "common other")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfKeywords(df, k = 2).collect()
    val doc1 = rows.filter(_.getLong(0) == 1L)
    // idf(common)=ln(3/3)=0 -> score 0 despite tf 3; rare: tf 1, idf ln 3
    assert(doc1(0).getString(2) == "rare")
    assert(doc1(0).getLong(4) == math.round(math.log(3.0) * 1e6))
    assert(doc1(1).getString(2) == "common" && doc1(1).getLong(4) == 0L)
    // ranks are 1-based and dense per doc
    assert(rows.filter(_.getLong(0) == 2L).map(_.getInt(1)).toSeq == Seq(1, 2))
    // partition invariance (exact ints, fixed-point idf)
    val rep = TextAnalysis.tfidfKeywords(df.repartition(7), k = 2).collect()
    assert(rep.map(_.toString).sorted.toSeq == rows.map(_.toString).sorted.toSeq)
  }

  test("normalizeUnicode rejects an unknown form at analysis time") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    val ex = intercept[Exception] {
      Seq("x").toDF("t").select(TextAnalysis.normalizeUnicode(col("t"), "NFX")).collect()
    }
    assert(ex.getMessage.contains("NFC") || ex.getMessage.toLowerCase.contains("form"))
  }

  test("batchPerceptron replays the hand-computed integer trajectory and converges") {
    val ss = spark
    import ss.implicits._
    // 1-D separable: y = +1 iff f > 2 (margin 1 around the threshold)
    val rows = Seq((1L, 4L), (1L, 5L), (1L, 6L), (-1L, 0L), (-1L, 1L), (-1L, 2L))
    val df = rows.toDF("y", "f").repartition(3)
    val out = TextAnalysis.batchPerceptron(df, Seq("f"), "y", epochs = 6)
      .orderBy("epoch").collect()
    // hand replay: epoch 1 starts at w = 0 -> all 6 rows have margin 0,
    // misclassified; g = (sum y, sum y*f) = (0, 15 - 3) = (0, 12)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 0L &&
      out(0).getLong(2) == 12L && out(0).getLong(3) == 6L)
    // epoch 2: margins 12f -> negatives with f=0 sit at 0 (wrong),
    // f=1,2 positive (wrong); g = (-3, -3); w = (-3, 9)
    assert(out(1).toSeq == Seq(2L, -3L, 9L, 3L))
    // must reach and hold 0 misclassified on separable data
    assert(out.last.getLong(3) == 0L)
    val zeroAt = out.indexWhere(_.getLong(3) == 0L)
    assert(out.drop(zeroAt).forall(r => r.getLong(3) == 0L &&
      r.getLong(1) == out(zeroAt).getLong(1) && r.getLong(2) == out(zeroAt).getLong(2)),
      "weights must freeze once the error count hits zero")
    // partition invariance: integer sums are order-independent
    val rep = TextAnalysis.batchPerceptron(rows.toDF("y", "f").repartition(1),
      Seq("f"), "y", epochs = 6).orderBy("epoch").collect()
    assert(rep.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
  }

  test("linearFilterScore appends the exact integer margin and keep flag") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, 4L), (2L, 2L)).toDF("id", "f")
    val got = TextAnalysis.linearFilterScore(df, Seq("f"), Seq(-3L, 9L))
      .orderBy("id").collect()
    assert(got(0).getLong(2) == 33L && got(0).getBoolean(3))
    assert(got(1).getLong(2) == 15L && got(1).getBoolean(3))
    val neg = TextAnalysis.linearFilterScore(Seq((1L, 0L)).toDF("id", "f"),
      Seq("f"), Seq(-3L, 9L)).collect()
    assert(neg(0).getLong(2) == -3L && !neg(0).getBoolean(3))
  }

  test("distinctNgramStats: hand-counted totals, distincts, and HALF_UP fixed-point ratios") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      ("s1", "a a b"), // unigrams a,a,b; bigrams (a a),(a b)
      ("s1", "a b"), //   unigrams a,b;   bigram  (a b)
      ("s2", "x x x x")) // 4 unigrams 1 distinct; 3 bigrams 1 distinct
      .toDF("source", "text").repartition(3)
    val got = TextAnalysis.distinctNgramStats(df).orderBy("source").collect()
    // s1: 5 unigrams / 2 distinct; 3 bigrams / 2 distinct
    assert(got(0).getLong(1) == 5L && got(0).getLong(2) == 2L)
    assert(got(0).getLong(3) == 3L && got(0).getLong(4) == 2L)
    // ratios: HALF_UP(2/5 * 10000) = 4000; HALF_UP(2/3 * 10000) = 6667
    assert(got(0).getLong(5) == 4000L && got(0).getLong(6) == 6667L)
    // s2 (mode-collapsed): 4/1 and 3/1 -> 2500 and 3333 per-10k
    assert(got(1).getLong(1) == 4L && got(1).getLong(2) == 1L)
    assert(got(1).getLong(3) == 3L && got(1).getLong(4) == 1L)
    assert(got(1).getLong(5) == 2500L && got(1).getLong(6) == 3333L)
  }

  test("distinctNgramStats: a single-token group has unigram stats but null bigram stats (left join keeps it)") {
    val ss = spark
    import ss.implicits._
    val got = TextAnalysis.distinctNgramStats(
        Seq(("solo", "word")).toDF("source", "text"))
      .collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 1L && got(0).getLong(2) == 1L)
    assert(got(0).isNullAt(3) && got(0).isNullAt(4) && got(0).isNullAt(6))
  }
}
