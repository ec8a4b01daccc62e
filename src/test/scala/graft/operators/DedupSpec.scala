package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected-components semantics (the pairs -> groups step): chains
  * need label propagation across multiple rounds, disjoint components
  * must not merge. (End-to-end dedup numerics are oracle-checked by
  * the driver via q40-q45/q52.) */
class DedupSpec extends SparkSpec {

  test("exactDuplicates orders member ids exactly near 2^63 (no double collapse)") {
    val ss = spark
    import ss.implicits._
    // ulp(2^63) = 2048, so consecutive ids near Long.MaxValue all
    // round to the SAME double — a double-keyed ordering collapses
    // them; the long-keyed heap must keep them distinct and ascending
    val base = Long.MaxValue - 10L
    val docs = (0 until 8).map(i => (base + i, "same-text")) ++
      Seq((1L, "same-text"), (42L, "other"))
    val out = Dedup.exactDuplicates(docs.toDF("doc_id", "text"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("canonical_id") == 1L)
    assert(r.getAs[Long]("n_copies") == 9L)
    val members = r.getSeq[Long](r.fieldIndex("member_ids"))
    assert(members == (1L +: (0 until 8).map(i => base + i)),
      s"member ids must be exact ascending longs, got $members")
  }

  test("removeDupSpans cuts non-canonical duplicated spans; re-detection finds ~nothing") {
    val ss = spark
    import ss.implicits._
    val shared = "one two three four five six seven eight" // exactly 8 tokens
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),       // canonical holder (smallest id)
      (2L, s"delta $shared epsilon zeta"),     // must lose the span
      (3L, s"$shared"),                        // must lose everything
      (4L, "unrelated text with no duplicated content at all here"),
      (5L, null.asInstanceOf[String]))         // TOTAL: null stays a row
      .toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, k = 8).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5)
    // canonical doc 1 keeps its text verbatim (tokens re-joined)
    assert(out(1L).getAs[String]("cleaned_text") == s"alpha beta $shared gamma")
    assert(out(1L).getAs[Int]("n_removed") == 0)
    // doc 2 loses exactly the 8 shared tokens
    assert(out(2L).getAs[String]("cleaned_text") == "delta epsilon zeta")
    assert(out(2L).getAs[Int]("n_removed") == 8)
    // doc 3 is cut to nothing
    assert(out(3L).getAs[String]("cleaned_text") == "")
    assert(out(3L).getAs[Int]("n_removed") == 8)
    // untouched doc passes through; null text stays null
    assert(out(4L).getAs[Int]("n_removed") == 0)
    assert(out(5L).isNullAt(out(5L).fieldIndex("cleaned_text")))
    // the done-criterion: re-running detection on the cleaned corpus
    // finds no cross-document duplication left
    val cleaned = Seq(
      (1L, out(1L).getAs[String]("cleaned_text")),
      (2L, out(2L).getAs[String]("cleaned_text")),
      (3L, out(3L).getAs[String]("cleaned_text")),
      (4L, out(4L).getAs[String]("cleaned_text"))).toDF("doc_id", "text")
    assert(Dedup.chunkDupStats(cleaned, k = 8).count() == 0)
  }

  test("removeDupSpans cuts overlapping and within-doc repeated spans of a duplicated chunk") {
    val ss = spark
    import ss.implicits._
    val span = "a b c d e f g h" // 8 tokens
    val docs = Seq(
      (1L, s"$span tail"),
      // doc 2 repeats the duplicated chunk twice — BOTH occurrences cut
      (2L, s"x $span y $span z")).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, k = 8).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("cleaned_text") == s"$span tail")
    assert(out(2L).getAs[String]("cleaned_text") == "x y z")
    assert(out(2L).getAs[Int]("n_removed") == 16)
  }

  test("removeDupSpans protects canonical occurrences from overlapping non-canonical cuts") {
    val ss = spark
    import ss.implicits._
    // doc 1 is CANONICAL for X = (x1 x2 y1) — duplicated with doc 2 —
    // but NON-canonical for the overlapping Y = (y1 y2 y3), canonical
    // in doc 0. Without protection, cutting Y's window in doc 1
    // removes y1 (position 2), partially destroying the canonical X
    // occurrence; doc 2's X copy is cut too, so X would vanish from
    // the corpus entirely. The protection keeps X verbatim in doc 1.
    val docs = Seq(
      (0L, "y1 y2 y3"),
      (1L, "x1 x2 y1 y2 y3"),
      (2L, "x1 x2 y1 z")).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, k = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[String]("cleaned_text") == "y1 y2 y3") // canonical Y intact
    assert(out(1L).getAs[String]("cleaned_text") == "x1 x2 y1") // canonical X survives verbatim
    assert(out(1L).getAs[Int]("n_removed") == 2)                // y2 y3 still cut
    assert(out(2L).getAs[String]("cleaned_text") == "z")        // non-canonical X cut
  }

  test("chunk ids are the widened dual-fold form (past 32-bit range, oracle-mirrorable)") {
    val ss = spark
    import ss.implicits._
    // a chunk's id = fold31 * 1e9 + fold37 must exceed the old 30-bit
    // space for any fold31 >= 2 — i.e. essentially every real chunk —
    // while staying under 2^63 (DuckDB BIGINT)
    val docs = Seq((1L, "aa bb cc"), (2L, "aa bb cc")).toDF("doc_id", "text")
    val stats = Dedup.chunkDupStats(docs, k = 3).collect()
    assert(stats.length == 2) // the widened ids still match across docs
    // recompute one id by hand through the public column expressions
    val row = ss.sql("SELECT 1").select(
      graft.operators.TextAnalysis.termHash(lit("aa")).as("h1"),
      graft.operators.TextAnalysis.termHash2(lit("aa")).as("h2")).collect()(0)
    val (h1, h2) = (row.getLong(0), row.getLong(1))
    assert(h1 != h2, "the two term-hash streams must be independent")
  }

  test("chunkDupStats counts cross-doc chunks once per doc, ignores within-doc repeats") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "p q r s"), // chunks: "p q r", "q r s"
      (2L, "z p q r"), // chunks: "z p q", "p q r"  -> shares "p q r" with doc 1
      (3L, "m n o"), // one chunk, unshared
      (4L, "a b c a b c a b c") // repeats its OWN chunks only -> not a dup
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDupStats(docs, k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getAs[Long]("n_chunks") == 2L)
      assert(out(id).getAs[Long]("n_dup_chunks") == 1L)
      assert(out(id).getAs[Double]("dup_frac") == 0.5)
    }
  }

  test("connectedComponents labels chains and keeps disjoint groups apart") {
    val ss = spark
    import ss.implicits._
    // component A: chain 1-2-3-4 (diameter 3 -> multiple rounds)
    // component B: triangle 10-11-12
    // component C: pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a chain deeper than the round cap (pointer doubling)") {
    val ss = spark
    import ss.implicits._
    // path graph 0-1-2-...-60: diameter 60 > maxIter 20, so plain
    // min-label propagation could NOT finish in 20 rounds — pointer
    // doubling must (and the guard must not fire)
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 61 && cc.values.forall(_ == 0L))
  }

  test("connectedComponents matches a local union-find oracle on a random multi-partition graph") {
    val ss = spark
    import ss.implicits._
    val rng = new scala.util.Random(1729)
    // 400 nodes, 300 random edges: a mix of mid-size components,
    // singletons-with-self-loops, and isolated pairs — spread over 16
    // partitions so the phase-1 contraction sees each component split
    // across many partitions (the regime the cross-root edges exist for)
    val edges = Seq.fill(300)((rng.nextInt(400).toLong, rng.nextInt(400).toLong))
    val pairs = edges.toDF("doc_a", "doc_b").repartition(16)
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side union-find ground truth (min-root)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val want = parent.keys.map(n => n -> find(n)).toMap
    assert(got === want)
  }

  test("connectedComponents is exact when every edge sits alone in its partition") {
    val ss = spark
    import ss.implicits._
    // one edge per partition: phase-1 union-find merges NOTHING beyond
    // single edges, so connectivity is carried entirely by the
    // contracted root graph — the worst case for the contraction
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      .repartition(12)
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 13 && cc.values.forall(_ == 0L))
  }

  test("removeBoilerplateLines drops lines in >= minDocFreq distinct docs from EVERY doc, order preserved") {
    val ss = spark
    import ss.implicits._
    // "cookie banner" appears in docs 1,2,3 (freq 3 -> boilerplate at K=3,
    // including a repeat inside doc 1 that must not inflate doc-freq);
    // "shared once" appears in docs 1,2 only (freq 2 -> kept)
    val lines = Seq(
      (1L, 0, "cookie banner"), (1L, 1, "doc one body"), (1L, 2, "cookie banner"),
      (1L, 3, "shared once"),
      (2L, 0, "shared once"), (2L, 1, "cookie banner"), (2L, 2, "doc two body"),
      (3L, 0, "doc three body"), (3L, 1, "cookie banner"),
      (4L, 0, "doc four body")
    ).toDF("doc_id", "line_no", "line")
    val out = Dedup.removeBoilerplateLines(lines, minDocFreq = 3, sep = "\n")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((4L, 2L, "doc one body\nshared once")))
    assert(out(2L) == ((3L, 1L, "shared once\ndoc two body")))
    assert(out(3L) == ((2L, 1L, "doc three body")))
    assert(out(4L) == ((1L, 0L, "doc four body")))
  }

  test("removeBoilerplateLines: a fully-boilerplate doc survives as an empty row, not a dropped one") {
    val ss = spark
    import ss.implicits._
    val lines = Seq(
      (1L, 0, "x"), (2L, 0, "x"), (3L, 0, "x"))
      .toDF("doc_id", "line_no", "line")
    val out = Dedup.removeBoilerplateLines(lines, minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out.keySet == Set(1L, 2L, 3L) && out.values.forall(_ == ""))
  }

  test("dedupLinesKeepFirst keeps only the globally first occurrence, within-doc repeats included") {
    val ss = spark
    import ss.implicits._
    // "cookie banner" first occurs at (1,0): every later copy goes —
    // the repeat INSIDE doc 1, and the copies in docs 2 and 3.
    // "shared once" first occurs at (1,3), so doc 2's copy goes too —
    // unlike the boilerplate policy, which would have kept both at
    // doc-freq 2 and dropped BOTH cookie-banner originals at freq 3.
    val lines = Seq(
      (1L, 0, "cookie banner"), (1L, 1, "doc one body"), (1L, 2, "cookie banner"),
      (1L, 3, "shared once"),
      (2L, 0, "shared once"), (2L, 1, "cookie banner"), (2L, 2, "doc two body"),
      (3L, 0, "doc three body"), (3L, 1, "cookie banner"),
      (4L, 0, "doc four body")
    ).toDF("doc_id", "line_no", "line")
    val out = Dedup.dedupLinesKeepFirst(lines, sep = "\n")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((4L, 1L, "cookie banner\ndoc one body\nshared once")))
    assert(out(2L) == ((3L, 2L, "doc two body")))
    assert(out(3L) == ((2L, 1L, "doc three body")))
    assert(out(4L) == ((1L, 0L, "doc four body")))
  }

  test("dedupLinesKeepFirst: an exact-copy doc survives as an empty row; ties break by (id, line_no)") {
    val ss = spark
    import ss.implicits._
    val lines = Seq(
      (7L, 0, "a"), (7L, 1, "b"),
      (9L, 0, "a"), (9L, 1, "b")) // exact later copy -> fully emptied
      .toDF("doc_id", "line_no", "line")
    val out = Dedup.dedupLinesKeepFirst(lines)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(7L) == ((0L, "a b")))
    assert(out(9L) == ((2L, "")))
  }

  test("semanticDedup drops exact copies, keeps mutually-orthogonal originals") {
    val ss = spark
    import ss.implicits._
    // 40 pairwise-orthogonal unit vectors (basis vectors of R^40) plus
    // exact copies of ids 0..4 under shifted ids: every copy has cosine
    // 1.0 to its original (and lands in the same cluster — identical
    // vectors get identical seed similarities), every other pair 0.0
    val dim = 40
    val base = (0 until dim).map(i =>
      (i.toLong, Array.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)))
    val rows = base ++ (0 until 5).map(i => (1000L + i, base(i)._2))
    val out = Dedup.semanticDedup(rows.toDF("vec_id", "embedding"),
        k = 4, simThreshold = 0.95)
      .select("vec_id", "cluster", "n_dup_smaller", "keep")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 45)
    (0 until 5).foreach { i =>
      assert(out(i.toLong)._4, s"original $i must survive")
      assert(!out(1000L + i)._4 && out(1000L + i)._3 == 1L,
        s"copy of $i must be dropped with exactly one smaller-id dup")
      assert(out(1000L + i)._2 == out(i.toLong)._2,
        s"copy of $i must share its original's cluster")
    }
    assert(out.values.count(!_._4) == 5)
  }

  test("winnowDupStats: shared runs >= k+w-1 tokens co-flag, exact copies reach dup_frac 1.0, uniques are absent") {
    val ss = spark
    import ss.implicits._
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val run = words("c", 30) // shared run, far above the k+w-1=11 guarantee
    val docs = Seq(
      (1L, words("a", 10) + " " + run + " " + words("b", 5)),
      (2L, words("z", 7) + " " + run + " " + words("y", 3)),
      (3L, words("u", 20)),  // unique — must not appear
      (4L, words("v", 20)),  // exact copies of each other
      (5L, words("v", 20)))
      .toDF("doc_id", "text")
    val out = Dedup.winnowDupStats(docs, k = 8, w = 4)
      .select("doc_id", "n_chunks", "n_minimizers", "n_dup_minimizers", "dup_frac")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 5L), s"got ${out.keySet}")
    // winnowing theorem: the 30-token shared run guarantees >= 1 shared minimizer
    assert(out(1L)._4 >= 1 && out(2L)._4 >= 1)
    // exact copies share every minimizer
    assert(out(4L)._5 == 1.0 && out(5L)._5 == 1.0)
    assert(out(4L)._3 == out(5L)._3)
    // selection only ever shrinks the fingerprint set
    out.values.foreach(r => assert(r._3 <= r._2, s"doc ${r._1}: minimizers ${r._3} > chunks ${r._2}"))
  }

  test("removeContaminatedSpans cuts every benchmark window, keeps clean text, no survivor") {
    val ss = spark
    import ss.implicits._
    val benchRun = (1 to 8).map(i => s"b$i").mkString(" ") // one 8-token chunk
    val bench = Seq((100L, s"$benchRun tail1 tail2")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"x1 x2 $benchRun y1 y2"),         // middle span cut
      (2L, "clean doc with no benchmark text at all"), // untouched
      (3L, s"$benchRun mid $benchRun"),        // BOTH occurrences cut
      (4L, benchRun)                            // fully contaminated -> empty
    ).toDF("doc_id", "text")
    val out = Dedup.removeContaminatedSpans(train, bench, k = 8)
      .select("doc_id", "n_tokens", "n_removed", "cleaned_text")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 12, 8, "x1 x2 y1 y2")))
    assert(out(2L)._3 == 0 && out(2L)._4 == "clean doc with no benchmark text at all")
    assert(out(3L) == ((3L, 17, 16, "mid")))
    assert(out(4L) == ((4L, 8, 8, "")))
    // the benchmark's own extra windows ("b2..tail1" etc.) also cut in
    // a train doc that contains them shifted — window identity is
    // verbatim token runs, not aligned blocks
    val shifted = Seq((5L, s"z ${(2 to 8).map(i => s"b$i").mkString(" ")} tail1 w"))
      .toDF("doc_id", "text")
    val out2 = Dedup.removeContaminatedSpans(shifted, bench, k = 8)
      .select("doc_id", "cleaned_text").as[(Long, String)].collect().head
    assert(out2 == ((5L, "z w")))
  }

  test("simhashNearDupPairs: banded join finds every pair within the hamming bound") {
    val ss = spark
    import ss.implicits._
    val hashes = Seq(
      1L -> 0x00000000L, // blocks 00 00 00 00
      2L -> 0x00000007L, // hamming 3 vs id1; shares 3 blocks
      3L -> 0x0F0F0F0FL, // hamming 16 vs id1; no shared block
      4L -> 0x01010101L, // hamming 4 vs id1: within no-guarantee zone, no shared block
      5L -> 0x00000007L  // == id2 -> hamming 0; hamming 3 vs id1
    ).toDF("doc_id", "simhash")
    val got = Dedup.simhashNearDupPairs(hashes, maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Long)].collect().toSeq
    // exact contract: every pair at hamming <= 3 appears exactly once
    assert(got == Seq((1L, 2L, 3L), (1L, 5L, 3L), (2L, 5L, 0L)))
    // pigeonhole precondition is enforced, not silently weakened
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(hashes, maxHamming = 4, nBands = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(hashes, maxHamming = 3, nBands = 5)
    }
  }

  test("simhashBoth is bit-identical to simhash(32) and simhash(64); 64-bit sign bit lands") {
    val ss = spark
    import ss.implicits._
    // token ids spread over the hash family's range; counts vary so the
    // sign sums are non-trivial; enough tokens that some doc plausibly
    // sets bit 63 (and the negative-fingerprint path is exercised)
    val rng = new scala.util.Random(7)
    val dtc = (1L to 40L).flatMap { d =>
      (0 until 30).map(_ => (d, rng.nextLong().abs % 1000003L, 1L + rng.nextInt(5)))
    }.toDF("doc_id", "tid", "cnt")
    val both = Dedup.simhashBoth(dtc).orderBy("doc_id").collect()
    val h32 = Dedup.simhash(dtc).orderBy("doc_id").collect()
    val h64 = Dedup.simhash(dtc, bits = 64).orderBy("doc_id").collect()
    assert(both.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      h32.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(both.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      h64.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // the 32-bit fingerprint is literally the 64-bit one's low half
    assert(both.forall(r => (r.getLong(2) & 0xFFFFFFFFL) == r.getLong(1)))
    // bit 63 fires for some doc on this corpus — the Long.MinValue
    // term (no positive 2^63 literal exists) must sum in-range
    assert(both.exists(_.getLong(2) < 0L),
      "no doc set bit 63 — the sign-bit path went untested")
  }

  test("crossSourceOverlap: engineered shingle overlap yields exact pair counts and Jaccard") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      ("a", "t1 t2 t3 t4"),   // shingles {t1 t2 t3, t2 t3 t4}
      ("b", "t2 t3 t4 t5"),   // shingles {t2 t3 t4, t3 t4 t5}
      ("c", "x1 x2 x3"))      // disjoint
      .toDF("source", "text")
    val out = Dedup.crossSourceOverlap(docs, k = 3)
      .select("src_a", "src_b", "n_shared", "jaccard")
      .as[(String, String, Long, Double)].collect()
    assert(out.toSeq == Seq(("a", "b", 1L, 0.333333)),
      s"got ${out.toSeq}")
  }


  test("editDistanceVerify: exact copy verifies, short-tail near copy fails the char bar, empty pair is sim 1.0") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "abcd"), (2L, "abed"), (3L, "abcd"),
      (4L, ""), (5L, "")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.editDistanceVerify(docs, pairs, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getDouble(3), r.getInt(4))).toMap
    assert(out((1L, 2L)) == ((1, 0.75, 0)))   // 1 edit over len 4: candidate rejected
    assert(out((1L, 3L)) == ((0, 1.0, 1)))    // exact copy verified
    assert(out((4L, 5L)) == ((0, 1.0, 1)))    // empty-vs-empty guard, no 0/0
    // plan: candidate side broadcast on both joins -- no shuffle of docs
    val plan = Dedup.editDistanceVerify(docs, pairs, tau = 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"docs must not shuffle:\n$plan")
  }

  test("rowMinhashSignatures is bit-identical to the batch explode/groupBy pipeline") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma delta epsilon zeta"), // exact copy of 1
      (4L, "tiny doc"), // < 3 tokens: no shingles
      (5L, "the the the the the")) // degenerate repeats
      .toDF("doc_id", "text")
    def collectSigs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "sig").as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val batch = collectSigs(
      Dedup.minhashSignatures(Dedup.contentShingleIds(Dedup.docShingles(docs, 3))))
    val row = collectSigs(Dedup.rowMinhashSignatures(docs))
    assert(row == batch)
    assert(row.map(_._1) == Seq(1L, 2L, 3L, 5L)) // doc 4 absent from both
    assert(row.head._2 == row(2)._2) // exact copies share a signature
  }

  test("ngramJaccardPairs defaults to the capped tier: the posting-list size cap is in the plan") {
    val ss = spark
    import ss.implicits._
    // a hot shingle ("the end of it") shared by every doc, plus one
    // genuine near-dup pair that shares real content
    val docs = (1L to 30L).map(i =>
        (i, s"unique$i token$i word$i the end of it"))
      .toDF("doc_id", "text")
    // the BARE default must engage the frequency cap: since r18 the
    // cap lives INSIDE the list collector (BoundedCollectListAgg —
    // per-key state capped at maxFreq longs, hot keys yield NULL; the
    // r17 shape's `size(ids) <= cap` post-filter materialized the
    // full hot list in one aggregation buffer first, the skewed-key
    // OOM the cap exists to prevent). The public API checkpoints the
    // aggregated pairs (lineage truncated), so the cap is pinned on
    // the kernel's lazy plan — the exact subtree the query executes.
    val kernel = Dedup.shinglePairCounts(
      Dedup.docShingles(docs, 3), Dedup.DefaultMaxShingleFreq)
    val plan = kernel.queryExecution.optimizedPlan.toString
    assert(plan.contains(
        s"graft_bounded_collect_list_${Dedup.DefaultMaxShingleFreq}"),
      s"pair kernel must collect posting lists through the " +
        s"size-bounded aggregate at the default cap:\n$plan")
    assert(!plan.contains("collect_list("),
      s"the capped tier must never materialize unbounded lists:\n$plan")
    // semantics of the cap on a corpus that actually trips it: with
    // maxShingleFreq = 5 the all-docs shingles vanish and no pair
    // shares anything; uncapped (explicit 0) every pair co-occurs
    val capped = Dedup.ngramJaccardPairs(docs, maxShingleFreq = 5).count()
    val uncapped = Dedup.ngramJaccardPairs(docs, maxShingleFreq = 0).count()
    assert(capped === 0L)
    assert(uncapped === 30L * 29L / 2L) // every pair shares the hot tail
  }

  test("shinglePairCounts: a synthetic hot shingle (freq >> cap) flows through without pairing") {
    val ss = spark
    import ss.implicits._
    // one boilerplate shingle shared by 1000 docs (100x the cap), plus
    // a small genuine cluster; the kernel must produce the cluster's
    // pairs and diagonals while the hot shingle contributes NOTHING —
    // and (pinned by the plan gate above) its posting list overflows
    // the bounded collector at cap+1 elements, so the 1000-element
    // list is never buffered and its ~500k pair structs never generate
    val hot = (1L to 1000L).map(i => (i, "hot shingle row"))
    val cluster = Seq((1L, "real shared content"), (2L, "real shared content"),
      (3L, "only in doc three"))
    val shingles = (hot ++ cluster).toDF("doc_id", "shingle")
    val out = Dedup.shinglePairCounts(shingles, maxShingleFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // diagonals count each doc's SURVIVING shingles; docs 4..1000 only
    // carried the hot shingle and vanish entirely
    assert(out == Map((1L, 2L) -> 1L, (1L, 1L) -> 1L, (2L, 2L) -> 1L, (3L, 3L) -> 1L))
  }

  test("simhash's native multi-sum aggregate is bit-identical to the declarative formulation") {
    val ss = spark
    import ss.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1L to 400L).map(_ =>
      (rng.nextInt(40).toLong, rng.nextInt(1000000).toLong, (rng.nextInt(9) + 1).toLong))
    val counts = rows.toDF("doc_id", "tid", "cnt").repartition(6)
    def declarative(bits: Int) = {
      val bitSums = (0 until bits).map { b =>
        sum(when(((col("tid") * Dedup.simA(b) + Dedup.simB(b)) % Dedup.MinhashPrime) % 2 === 1,
          col("cnt")).otherwise(-col("cnt"))).as(s"s$b")
      }
      counts.groupBy(col("doc_id"))
        .agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until bits).map(b =>
            when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _).as("simhash"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    }
    def native(bits: Int) =
      Dedup.simhash(counts, bits).as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(native(32) == declarative(32))
    assert(native(64) == declarative(64))
    // simhashBoth's shared-sums assembly matches the per-width outputs
    val both = Dedup.simhashBoth(counts)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(both.map(t => (t._1, t._2)) == native(32))
    assert(both.map(t => (t._1, t._3)) == native(64))
  }

  test("embeddingNearDupPairs routes to the LSH tier above exactThreshold, exact below") {
    val ss = spark
    import ss.implicits._
    val vecs = (0L until 40L).map { i =>
      // two planted near-dup pairs on a shared direction; the rest
      // spread along distinct axes
      val base = Array.fill(8)(0f)
      if (i < 4) { base(0) = 1f; base(1) = 0.01f * i }
      else base((i % 7 + 1).toInt) = 1f + i * 0.05f
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
    // below the threshold: exact crossJoin tier
    val exactPlan = Dedup.embeddingNearDupPairs(vecs, topN = 5,
      exactThreshold = 100L).queryExecution.optimizedPlan.toString
    assert(exactPlan.contains("Join Cross") || exactPlan.contains("CrossJoin"),
      s"small corpus should use the exact tier:\n$exactPlan")
    // above the threshold: the LSH bucketed tier — no cross join
    val lsh = Dedup.embeddingNearDupPairs(vecs, topN = 5, exactThreshold = 10L)
    val lshPlan = lsh.queryExecution.optimizedPlan.toString
    assert(!lshPlan.contains("Join Cross") && !lshPlan.contains("CrossJoin"),
      s"above exactThreshold the pair join must be bucketed, not all-pairs:\n$lshPlan")
    // and it still FINDS the planted near-dups (same output shape)
    val got = lsh.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)) || got.contains((0L, 2L)) || got.contains((1L, 2L)),
      s"LSH tier missed every planted near-dup pair: $got")
    assert(lsh.columns.toSeq === Seq("id_a", "id_b", "cos_sim", "tier"))
    // the tier marker rides in the OUTPUT, so exact vs approximate
    // results stay distinguishable after the log line is gone
    assert(lsh.select("tier").distinct().collect().map(_.getString(0)).toSeq
      == Seq("srp-banded-32bit"))
    assert(Dedup.embeddingNearDupPairs(vecs, topN = 5, exactThreshold = 100L)
      .select("tier").distinct().collect().map(_.getString(0)).toSeq
      == Seq("exact-crossjoin"))
  }

  test("embeddingNearDupPairs: forced-exact past maxExactRows refuses with a named error (r16 item 1)") {
    val ss = spark
    import ss.implicits._
    val vecs = (0L until 40L).map { i =>
      val base = Array.fill(8)(0f); base((i % 7 + 1).toInt) = 1f + i * 0.05f
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
    // unconditionally-forced exact (the "give me the O(n²) truth"
    // spelling) over a corpus past the cap: refused off the bounded
    // probe, before any full count or crossJoin launches
    val e1 = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupPairs(vecs, topN = 5,
        exactThreshold = Long.MaxValue, maxExactRows = 10L).collect()
    }
    assert(e1.getMessage.contains("maxExactRows"), e1.getMessage)
    assert(e1.getMessage.contains("docSample"), e1.getMessage)
    // a moderately-raised threshold that still routes exact hits the
    // same cap at the tier branch
    val e2 = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupPairs(vecs, topN = 5,
        exactThreshold = 50L, maxExactRows = 10L).collect()
    }
    assert(e2.getMessage.contains("maxExactRows"), e2.getMessage)
    // at or under the cap the forced-exact contract is unchanged
    assert(Dedup.embeddingNearDupPairs(vecs, topN = 5,
        exactThreshold = Long.MaxValue, maxExactRows = 40L)
      .select("tier").distinct().collect().map(_.getString(0)).toSeq
      == Seq("exact-crossjoin"))
    // and the SRP tier is untouched by the cap (it never crossJoins)
    assert(Dedup.embeddingNearDupPairs(vecs, topN = 5,
        exactThreshold = 10L, maxExactRows = 10L)
      .select("tier").distinct().collect().map(_.getString(0)).toSeq
      == Seq("srp-banded-32bit"))
  }

  test("SRP tier widens to 64-bit/16-bit blocks past srpWideThreshold; low 32 bits agree") {
    val ss = spark
    import ss.implicits._
    val vecs = (0L until 30L).map { i =>
      val base = Array.fill(8)(0f)
      if (i < 3) { base(0) = 1f; base(1) = 0.005f * i } // planted near-dups
      else base((i % 7 + 1).toInt) = 1f + i * 0.05f
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
    // the 64-bit signature's low 32 bits are EXACTLY the 32-bit
    // signature (same (b, j) plane formula per bit) — widening only
    // appends planes, it never re-keys existing ones
    val sigs = vecs.select(
      graft.operators.Similarity.srpSignature(col("embedding"), 32).as("s32"),
      graft.operators.Similarity.srpSignature(col("embedding"), 64).as("s64"))
      .as[(Long, Long)].collect()
    sigs.foreach { case (s32, s64) =>
      assert((s64 & 0xFFFFFFFFL) === s32, f"low bits diverge: $s32%x vs $s64%x")
    }
    // forcing the wide tier still finds the planted pairs through the
    // 16-bit-block banding (same output shape, no cross join)
    val wide = Dedup.embeddingNearDupPairs(vecs, topN = 5,
      exactThreshold = 0L, srpWideThreshold = 10L)
    val plan = wide.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join Cross") && !plan.contains("CrossJoin"), plan)
    val got = wide.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)) || got.contains((0L, 2L)) || got.contains((1L, 2L)),
      s"wide SRP tier missed every planted near-dup pair: $got")
  }

  test("containmentPairs: a doc quoted whole inside a longer doc scores 1.0 containment where Jaccard stays low") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "a b c d e"), // 3 distinct 3-shingles, all inside doc 2
      (2L, "x a b c d e y z w q"), // 8 distinct 3-shingles
      (3L, "p q r s t u v")) // disjoint
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, k = 3, minContainmentPer10k = 8000L,
        maxShingleFreq = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == Set((1L, 2L)), s"only the quote pair ships: $got")
    val (ni, sa, sb, ab, ba) = got((1L, 2L))
    assert(ni == 3L && sa == 3L && sb == 8L)
    assert(ab == 10000L, "containment of the quoted doc is exactly 1.0")
    assert(ba == (3L * 20000L + 8L) / 16L) // 3750 — the Jaccard-ish direction
    // the symmetric measure would NOT have shipped this pair at 0.8:
    // jaccard = 3/8 = 0.375 — this asymmetry is the operator's point
    assert(ba < 8000L)
  }

  test("evalPairSets: hand-computed precision/recall; empty tier reports NULL precision") {
    val ss = spark
    import ss.implicits._
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val tierA = Seq((1L, 2L), (3L, 4L), (7L, 8L), (7L, 8L)).toDF("doc_a", "doc_b") // dup row dedups
    val tierB = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.evalPairSets(Seq(("a", tierA), ("b", tierB)), truth)
      .orderBy("tier").collect()
    // a: truth 3, pred 3 (dup collapsed), tp 2, fp 1, fn 1
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3)) == ((3L, 3L, 2L)))
    assert((got(0).getLong(4), got(0).getLong(5)) == ((1L, 1L)))
    // precision = recall = HALF_UP(2/3 * 10000) = 6667
    assert(got(0).getLong(6) == 6667L && got(0).getLong(7) == 6667L)
    // b: no predictions -> NULL precision, 0 recall
    assert((got(1).getLong(1), got(1).getLong(2), got(1).getLong(3)) == ((3L, 0L, 0L)))
    assert(got(1).isNullAt(6) && got(1).getLong(7) == 0L)
    // both tiers carry the default deliberate gate
    assert(got.forall(_.getAs[Long]("recall_per_10k_gate")
      == Dedup.DefaultRecallGatePer10k))
  }

  test("evalPairSets refuses an oversized truth with a named error, never a broadcast OOM") {
    val ss = spark
    import ss.implicits._
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val tier = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.evalPairSets(Seq(("a", tier)), truth, maxTruthPairs = 2L)
    }
    assert(e.getMessage.contains("docSample") && e.getMessage.contains("3 distinct pairs"))
    // at the bound it builds fine
    assert(Dedup.evalPairSets(Seq(("a", tier)), truth, maxTruthPairs = 3L)
      .count() == 1L)
  }

  test("evalPairSets per-tier gates: a degraded tier fails ITS OWN margin, not the default") {
    val ss = spark
    import ss.implicits._
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).toDF("doc_a", "doc_b")
    val good = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")    // 0.75
    val partial = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")           // 0.50
    val card = Dedup.evalPairSets(
        Seq(("good", good), ("partial", partial)), truth,
        gatesPer10k = Map("partial" -> 4000L))
      .orderBy("tier").collect()
    def margin(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("recall_per_10k") - r.getAs[Long]("recall_per_10k_gate")
    // good: 7500 vs default 7000 -> +500; partial: 5000 vs deliberate
    // 4000 -> +1000 — both pass their own bars
    assert(margin(card(0)) == 500L && margin(card(1)) == 1000L)
    // DEGRADE the partial tier (drop to 1/4 recall): its margin goes
    // negative — the Verify/oracle_check sibling-gate rule (min over
    // rows of recall - gate >= 0) now FAILS the card
    val degraded = Dedup.evalPairSets(
        Seq(("good", good), ("partial", Seq((1L, 2L)).toDF("doc_a", "doc_b"))), truth,
        gatesPer10k = Map("partial" -> 4000L))
    val worst = degraded
      .agg(org.apache.spark.sql.functions.min(
        col("recall_per_10k") - col("recall_per_10k_gate"))).head().getLong(0)
    assert(worst == 2500L - 4000L)
  }

  test("evalPairSets plan: truth broadcast (tier scoring map-side), one aggregate exchange") {
    val ss = spark
    import ss.implicits._
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val tierA = Seq((1L, 2L), (7L, 8L)).toDF("doc_a", "doc_b")
    val tierB = Seq((3L, 4L)).toDF("doc_a", "doc_b")
    val card = Dedup.evalPairSets(Seq(("a", tierA), ("b", tierB)), truth)
    card.collect() // finalize the adaptive plan before inspecting
    // the candidate union must never shuffle for the scoring join —
    // at 100 TB it is corpus-sized for a loose tier while the truth
    // is a sampled artifact by contract (docSample): broadcast join
    val bcast = collectPlanNodes(card) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bcast.nonEmpty, "tier-vs-truth scoring must be a broadcast join")
    // the only exchanges are aggregate-shaped (tier key or distinct) —
    // a sort-merge join of the union would add join exchanges here
    val shuffles = collectShuffles(card)
    assert(shuffles.size <= 3,
      s"expected only the distinct/aggregate exchanges, got ${shuffles.size}")
    assert(collectPlanNodes(card) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }.isEmpty, "no sort-merge join in the eval card")
  }

  test("docSample: deterministic, seed-sensitive, full-frac is identity") {
    val ss = spark
    import ss.implicits._
    val docs = (0L until 400L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val s1 = Dedup.docSample(docs, 5000L, "q198").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Dedup.docSample(docs, 5000L, "q198").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same seed+frac must select the same docs")
    // roughly half (md5 is uniform; 400 trials, generous bounds)
    assert(s1.size > 120 && s1.size < 280, s"got ${s1.size}/400 at frac 0.5")
    val other = Dedup.docSample(docs, 5000L, "other-seed").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 != other, "a different seed must select a different sample")
    // monotone: a smaller frac selects a subset of the larger one
    val s3 = Dedup.docSample(docs, 2000L, "q198").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s3.subsetOf(s1))
    assert(Dedup.docSample(docs, 10000L, "q198").count() == 400L)
  }

  // ------------------------------------------------ content-defined chunking

  test("cdcChunks: chunks concatenated in pos order reconstruct the text exactly (incl. multibyte)") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "s1", "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "s1", "short"),
      (3L, "s2", "数据 管理 系统 的 内容 定义 分块 测试 数据 管理 系统"),
      (4L, "s2", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"))
      .toDF("doc_id", "source", "text")
    val rebuilt = Dedup.cdcChunks(docs)
      .orderBy("doc_id", "pos")
      .select("doc_id", "chunk").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).mkString).toMap
    val orig = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rebuilt == orig)
    // a doc shorter than the window is one whole-text chunk
    val short = Dedup.cdcChunks(docs.filter(col("doc_id") === 2L)).collect()
    assert(short.length == 1 && short(0).getString(3) == "short")
  }

  test("cdcChunks boundaries are content-defined: a prefix insertion leaves the tail chunks intact") {
    val ss = spark
    import ss.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
    val docs = Seq((1L, "a", base), (2L, "b", "ZZZ " + base))
      .toDF("doc_id", "source", "text")
    val byDoc = Dedup.cdcChunks(docs)
      .select("doc_id", "chunk").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val (c1, c2) = (byDoc(1L), byDoc(2L))
    assert(c1.size >= 3, s"base text should split into several chunks, got ${c1.size}")
    // every chunk after the insertion-affected head must realign:
    // the shifted doc's tail chunks are a suffix of... and vice versa
    val shared = c1.toSet.intersect(c2.toSet)
    assert(shared.size >= c1.size - 2,
      s"content-defined boundaries must resync after the head: ${c1.size} vs shared ${shared.size}")
  }

  test("cdcChunks: 200 randomized unicode texts all reconstruct exactly (one batched pass)") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(0xCDC13L)
    val alphabets = Seq("abc ", "αβγδ ε", "数据系统 分块", "a\tb\nc d", "!@#$%^&*()_+ ")
    val rows = (1L to 200L).map { i =>
      val alpha = alphabets((i % alphabets.size).toInt)
      val len = rnd.nextInt(120)
      val text = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (i, "s", text)
    }.filter(_._3.nonEmpty)
    val df = rows.toDF("doc_id", "source", "text")
    val rebuilt = Dedup.cdcChunks(df)
      .orderBy("doc_id", "pos")
      .select("doc_id", "chunk").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).mkString).toMap
    val orig = rows.map(r => r._1 -> r._3).toMap
    assert(rebuilt == orig,
      s"${rebuilt.count { case (k, v) => orig(k) != v }} of ${orig.size} texts failed to reconstruct")
  }

  test("cdcChunkStats: duplicated doc collapses in distinct/novel accounting; ratios exact") {
    val ss = spark
    import ss.implicits._
    val text = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq((1L, "orig", text), (2L, "copy", text))
      .toDF("doc_id", "source", "text")
    val got = Dedup.cdcChunkStats(docs).orderBy("source").collect()
    val copy = got(0); val orig = got(1)
    assert(copy.getString(0) == "copy" && orig.getString(0) == "orig")
    // both sources chunk the identical text identically
    assert(copy.getLong(1) == orig.getLong(1) &&
      copy.getLong(2) == orig.getLong(2) && copy.getLong(2) == text.length.toLong)
    // all first occurrences belong to doc 1 ("orig"): the copy contributes ZERO novel volume
    assert(copy.getLong(5) == 0L && copy.getLong(6) == 0L)
    assert(orig.getLong(5) == orig.getLong(3) && orig.getLong(6) == orig.getLong(4))
    // per-source ratio: within one doc chunks may still repeat, but
    // distinct <= total always, and the fixed-point ratio matches the
    // HALF_UP arithmetic exactly
    val (d, t) = (orig.getLong(4), orig.getLong(2))
    assert(orig.getLong(7) == (d * 20000L + t) / (t * 2L))
  }
}
