package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling semantics: mixture thresholds and quota
  * selection must equal a brute-force recompute of the same hash
  * arithmetic. (End-to-end numerics vs DuckDB are oracle-checked by
  * the driver via q71/q72.) */
class SamplingSpec extends SparkSpec {

  private val P = 1000000007L
  private val A = 2654435761L % P
  private def bucketOf(id: Long): Long = ((id % P) * A) % P % 10000L

  test("mixtureSample keeps exactly the rows whose bucket clears the stratum rate") {
    val ss = spark
    import ss.implicits._
    val rows = (0L until 400L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
    val rates = Map("en" -> 0.5, "zh" -> 0.1)
    val kept = Sampling.mixtureSample(rows.toDF("doc_id", "lang"), rates)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    val expected = rows.collect {
      case (id, s) if bucketOf(id) < math.round(rates(s) * 10000) => id -> bucketOf(id)
    }.toMap
    assert(kept == expected)
    assert(expected.nonEmpty && expected.size < rows.size)
  }

  test("mixtureSample drops strata absent from the rates map") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, "en"), (2L, "xx"), (3L, "xx")).toDF("doc_id", "lang")
    val kept = Sampling.mixtureSample(df, Map("en" -> 1.0))
      .select("lang").as[String].collect()
    assert(kept.forall(_ == "en"))
  }

  test("packSequences offsets equal a sequential scan regardless of partitioning") {
    val ss = spark
    import ss.implicits._
    // ids deliberately unsorted in the input; token counts 1..13 words
    val rows: Seq[(Long, String)] =
      Seq(7L, 2L, 11L, 5L, 1L, 9L, 3L, 12L, 8L, 4L, 10L, 6L)
        .map(id => (id, Seq.fill((id % 13 + 1).toInt)("w").mkString(" "))) :+
        (13L, null) // NULL text packs as 0 tokens, stays in the output
    val out = Sampling.packSequences(rows.toDF("doc_id", "text").repartition(5), budget = 10L)
      .select("doc_id", "n_tokens", "tok_offset", "bin_id", "bin_offset")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    var cum = 0L
    val expected = rows.sortBy(_._1).map { case (id, text) =>
      val n = if (text == null) 0L else text.split("\\s+").length.toLong
      val r = (id, n, cum, cum / 10L, cum % 10L)
      cum += n
      r
    }
    assert(out.toSeq == expected)
  }

  test("packSequences accepts a pluggable token-count column (BPE-real budgets)") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, "aa"), (2L, "bbbb"), (3L, null.asInstanceOf[String]), (4L, "cccccc"))
    // count = text length: offsets must follow the plugged expression,
    // not the default whitespace count (which would be 1 per doc)
    val out = Sampling.packSequences(rows.toDF("doc_id", "text"), budget = 5L,
        tokenCount = Some(length(col("text")).cast("long")))
      .select("doc_id", "n_tokens", "tok_offset", "bin_id", "bin_offset")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 2L, 0L, 0L, 0L),
      (2L, 4L, 2L, 0L, 2L),
      (3L, 0L, 6L, 1L, 1L), // null text -> 0 via the same COALESCE
      (4L, 6L, 6L, 1L, 1L)))
  }

  test("quotaCap keeps the maxPerGroup smallest (bucket, id) per group, all of a small group") {
    val ss = spark
    import ss.implicits._
    val rows = (0L until 60L).map(i => (i, "big")) ++ Seq((1000L, "small"), (1001L, "small"))
    val out = Sampling.quotaCap(rows.toDF("doc_id", "source"), maxPerGroup = 5)
      .select("source", "doc_id", "bucket").as[(String, Long, Long)].collect()
    val big = out.filter(_._1 == "big").map(r => (r._3, r._2)).sorted
    val expectedBig = (0L until 60L).map(i => (bucketOf(i), i)).sorted.take(5)
    assert(big.toSeq == expectedBig)
    assert(out.filter(_._1 == "small").map(_._2).sorted.toSeq == Seq(1000L, 1001L))
    out.foreach { case (_, id, b) => assert(b == bucketOf(id)) }
  }

  test("temperatureWeights flattens the mixture and caps tiny-stratum rates at 1") {
    val ss = spark
    import ss.implicits._
    val rows = (0L until 100L).map(i => (i, "en")) ++
      (100L until 125L).map(i => (i, "de")) :+ (999L, "xx")
    val out = Sampling.temperatureWeights(rows.toDF("doc_id", "src"),
        alpha = 0.5, budgetFrac = 0.5, stratumCol = "src")
      .select("src", "n_docs", "weight", "rate")
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // zi = round(sqrt(n)*1e6): en 10e6, de 5e6, xx 1e6; z = 16e6, total = 126
    assert(out("en")._2 == 100L && out("de")._2 == 25L && out("xx")._2 == 1L)
    assert(out("en")._3 == math.rint(10.0 / 16.0 * 1e6) / 1e6)
    assert(out("de")._3 == math.rint(5.0 / 16.0 * 1e6) / 1e6)
    // α=0.5 flattens: head stratum weight below natural share, tail above
    assert(out("en")._3 < 100.0 / 126.0 && out("de")._3 > 25.0 / 126.0)
    // rate realizes the stratum's share of the 63-doc budget, capped at 1
    assert(out("en")._4 == math.rint(10.0 / 16.0 * 63.0 / 100.0 * 1e6) / 1e6)
    assert(out("xx")._4 == 1.0) // ideal allocation 3.9 docs > its 1 doc
  }

  test("stratifiedSplit: exact integer-boundary proportions per stratum, any partitioning") {
    val ss = spark
    import ss.implicits._
    // stratum A: 20 rows -> 2 test / 2 val / 16 train (exact);
    // stratum B: 7 rows  -> 0 test (7*10 < 100) / 1 val / 6 train
    val rows = (0L until 20L).map(i => (i, "A")) ++ (100L until 107L).map(i => (i, "B"))
    val df = rows.toDF("vec_id", "lab")
    val out = Sampling.stratifiedSplit(df, col("lab"), testPct = 10, valPct = 10)
      .as[(Long, String, String)].collect()
    val byStratum = out.groupBy(_._2).map { case (k, xs) =>
      k -> xs.groupBy(_._3).view.mapValues(_.length).toMap
    }
    assert(byStratum("A") == Map("test" -> 2, "val" -> 2, "train" -> 16))
    assert(byStratum("B").getOrElse("test", 0) == 0)
    assert(byStratum("B") == Map("val" -> 1, "train" -> 6))
    // partitioning independence: a different input layout assigns every
    // id to the same split
    val out2 = Sampling.stratifiedSplit(df.repartition(7), col("lab"), 10, 10)
      .as[(Long, String, String)].collect()
    assert(out.map(r => r._1 -> r._3).toMap == out2.map(r => r._1 -> r._3).toMap)
    // the split order is the id-HASH order, not id order: the test
    // slice is not simply the smallest ids
    val aTest = out.filter(r => r._2 == "A" && r._3 == "test").map(_._1).toSet
    val expected = (0L until 20L).sortBy(i =>
      (((i % 1000000007L) * 654435747L) % 1000000007L % 10000L, i)).take(2).toSet
    assert(aTest == expected)
  }

  test("percentileBlend: tie-aware percentiles match PERCENT_RANK on any partitioning") {
    val ss = spark
    import ss.implicits._
    // heavy ties in a; b strictly increasing
    val rows = (1L to 40L).map(i => (i, (i % 4).toDouble, i.toDouble * 2))
    val out = Sampling.percentileBlend(
        rows.toDF("doc_id", "a", "b").repartition(7),
        Seq("a" -> col("a"), "b" -> col("b")))
      .select("doc_id", "a_pct", "b_pct", "blend")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    val n = rows.length
    def pctFp(vals: Seq[Double], v: Double): Long =
      vals.count(_ < v).toLong * 1000000L / (n - 1)
    val as = rows.map(_._2); val bs = rows.map(_._3)
    rows.foreach { case (id, a, b) =>
      val r = out(id.toInt - 1)
      assert(r._2 == pctFp(as, a) / 1e6, s"a_pct for id $id")
      assert(r._3 == pctFp(bs, b) / 1e6)
      assert(r._4 == (pctFp(as, a) + pctFp(bs, b)) / 2L / 1e6)
    }
    // ties share the percentile; min value sits at 0, max of b at 1.0
    assert(out.filter(r => rows(r._1.toInt - 1)._2 == 0.0).map(_._2).distinct.length == 1)
    assert(out.map(_._2).min == 0.0 && out.map(_._3).max == 1.0)
    // single-row frame: nm1 guard keeps it at percentile 0, no div-by-0
    val one = Sampling.percentileBlend(Seq((1L, 5.0)).toDF("doc_id", "a"),
      Seq("a" -> col("a"))).collect()
    assert(one.length == 1 && one.head.getDouble(1) == 0.0)
  }

  test("curriculumRank equals the global (score DESC, id) row number on any partitioning") {
    val ss = spark
    import ss.implicits._
    val rows = (1L to 50L).map(i => (i, (i % 5).toDouble / 4.0))
    val out = Sampling.curriculumRank(
        rows.toDF("doc_id", "s").repartition(7), col("s"))
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    val expected = rows.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(out == expected)
  }

  test("shardAssign deals size-rank round-robin: exact assignment, balanced totals, any partitioning") {
    val ss = spark
    import ss.implicits._
    val rows = (1L to 100L).map(i => (i, 101L - i)) // sizes 100..1
    val out = Sampling.shardAssign(
        rows.toDF("doc_id", "sz").repartition(7), nShards = 4, sizeCol = col("sz"))
      .select("doc_id", "size", "shard").as[(Long, Long, Int)].collect()
    val expected = rows.sortBy { case (id, sz) => (-sz, id) }
      .zipWithIndex.map { case ((id, sz), i) => (id, sz, i % 4) }
    assert(out.sortBy(_._1).toSeq == expected.sortBy(_._1).toSeq)
    // LPT round-robin balance: shard totals within nShards * max-size slack
    val totals = out.groupBy(_._3).view.mapValues(_.map(_._2).sum).values.toSeq
    assert(totals.size == 4 && totals.max - totals.min <= 100L,
      s"unbalanced shard totals: $totals")
  }

  test("weightedSample: without replacement, partition-invariant, weight-proportional") {
    val ss = spark
    import ss.implicits._
    // 2000 ids, the first 1000 weight 25, the rest weight 1.
    val rows = (1L to 2000L).map(i => (i, if (i <= 1000) 25L else 1L))
    val one = Sampling.weightedSample(
      rows.toDF("doc_id", "w0").repartition(1), 200, col("w0")).collect().toSeq
    val many = Sampling.weightedSample(
      rows.toDF("doc_id", "w0").repartition(13), 200, col("w0")).collect().toSeq
    assert(one == many) // hash keys, not RNG: the sample is THE sample
    val ids = one.map(_.getLong(0))
    assert(ids.distinct.size == 200) // without replacement
    // Heavy rows hold ~25/26 of total mass; with u^(1/w) keys the
    // deterministic hash draw must overwhelmingly select them.
    val nHeavy = ids.count(_ <= 1000L)
    assert(nHeavy > 170, s"expected heavy-weight dominance, got $nHeavy/200")
    // scores are the ranked keys, descending
    val scores = one.map(_.getDouble(2))
    assert(scores == scores.sorted.reverse)
  }

  test("weightedSample: non-positive weights are never sampled (no NaN-key pick)") {
    val ss = spark
    import ss.implicits._
    val rows = (1L to 50L).map(i => (i, if (i % 2 == 0) 0L else 3L))
    val out = Sampling.weightedSample(rows.toDF("doc_id", "w0"), 25, col("w0"))
      .collect().toSeq
    assert(out.map(_.getLong(0)).forall(_ % 2 == 1) && out.size == 25)
  }

  test("weightedSample plan: top-m is a TakeOrdered, never a global sort exchange") {
    val ss = spark
    import ss.implicits._
    val df = Sampling.weightedSample(
      (1L to 5000L).map(i => (i, i % 7 + 1)).toDF("doc_id", "w0").repartition(8),
      50, col("w0"))
    df.count()
    val takes = collectPlanNodes(df) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(takes.nonEmpty, "expected TakeOrderedAndProject")
    val sorts = collectPlanNodes(df) {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(sorts.isEmpty, "global sort should not appear")
  }

  // ------------------------------------------------ UniMax allocation

  test("unimaxAllocation: hand-computed water-filling — full funding below the level, integer level above") {
    val ss = spark
    import ss.implicits._
    val counts = Seq(("A", 10L), ("B", 20L), ("C", 100L)).toDF("lang", "n_tokens")
    // caps 20/40/200 at 2 epochs, budget 120: A and B fund fully
    // (20*3+0=60 <= 120, 40*2+20=100 <= 120), C gets (120-60)/1 = 60
    val got = Sampling.unimaxAllocation(counts, budget = 120L, maxEpochs = 2)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("A", 10L, 20L, 20L, 20000L),
      ("B", 20L, 40L, 40L, 20000L),
      ("C", 100L, 200L, 60L, 6000L)))
    // budget above total capacity: everyone hits their epoch cap
    val capped = Sampling.unimaxAllocation(counts, budget = 1000L, maxEpochs = 2)
      .orderBy("lang").collect().map(r => r.getLong(3))
    assert(capped.toSeq == Seq(20L, 40L, 200L))
    // zero budget: zero allocations, zero epochs
    val zero = Sampling.unimaxAllocation(counts, budget = 0L, maxEpochs = 2)
      .orderBy("lang").collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(zero.forall(_ == (0L, 0L)))
  }

  // ------------------------------------------------ DSIR importance

  /** The cross-engine bucket map dsirImportance uses: 60-bit md5
    * prefix mod B, recomputed here from first principles. */
  private def dsirBucketOf(tok: String, buckets: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % buckets).toInt
  }

  test("dsirImportance equals a from-scratch recompute and separates target vocab from raw-only vocab") {
    val ss = spark
    import ss.implicits._
    val rows = Seq(
      (1L, true, "aa bb aa"),
      (2L, true, "bb aa"),
      (3L, false, "cc dd cc dd"),
      (4L, false, "aa cc"),
      (5L, false, "dd dd"))
    val buckets = 64
    val out = Sampling.dsirImportance(
        rows.toDF("id", "is_t", "text"), col("is_t"), buckets)
      .select("id", "score").as[(Long, Long)].collect().toMap
    // brute-force fit + score with plain Scala over the same tokens
    val toks = rows.map { case (id, t, text) =>
      (id, t, text.trim.toLowerCase.split("\\s+").toSeq) }
    val cr = new Array[Long](buckets)
    val ct = new Array[Long](buckets)
    toks.foreach { case (_, t, ts) => ts.foreach { w =>
      val b = dsirBucketOf(w, buckets); cr(b) += 1; if (t) ct(b) += 1 } }
    val (nr, nt) = (cr.sum, ct.sum)
    val expected = toks.map { case (id, _, ts) =>
      id -> ts.map { w =>
        val b = dsirBucketOf(w, buckets); ct(b) * nr - cr(b) * nt }.sum
    }.toMap
    assert(out == expected)
    // all-target vocab scores positive, raw-only vocab negative
    assert(out(1L) > 0 && out(2L) > 0)
    assert(out(3L) < 0 && out(5L) < 0)
  }

  test("dsirImportance scoring pass is shuffle-free: the fitted model rides as array literals") {
    val ss = spark
    import ss.implicits._
    val df = (1L to 200L).map(i =>
        (i, i % 3 == 0, s"tok${i % 17} tok${i % 5} tok${i % 11}"))
      .toDF("id", "is_t", "text")
    val scored = Sampling.dsirImportance(df, col("is_t"), buckets = 32)
    scored.count()
    assert(collectShuffles(scored).isEmpty,
      "scoring must be a narrow map-only pass (zero exchanges)")
    // every row scored (model covers the full vocab by construction)
    assert(scored.filter(col("score").isNull).count() == 0L)
  }
}
