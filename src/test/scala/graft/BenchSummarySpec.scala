package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench summary line against the driver's stdout tail
  * window. The driver keeps only the LAST ~2000 chars of stdout and
  * json-parses what it finds there; the trailing sbt "[success] ..."
  * line eats ~75 of those, so the summary must stay under ~1925 or
  * the head of the JSON falls off and the round's 2x perf gate goes
  * dark (BENCH_r07.json "parsed": null). Budget here is 1850 to leave
  * slack for query-set growth between the test run and the round run. */
class BenchSummarySpec extends AnyFunSuite {

  private val TailBudget = 1850

  test("short query keys are unique across the real query set") {
    val keys = SparkEntry.queries.keys.toSeq
    val short = keys.map(Bench.shortKey)
    assert(short.distinct.size === keys.size,
      s"colliding short keys: ${short.diff(short.distinct).distinct.mkString(",")}")
  }

  test("summary line with worst-case widths fits the tail window") {
    // worst-case numeric widths: 8884.88 renders "8884.9" (6 chars) per
    // query and for builds_sec — a 4-digit-seconds ceiling, so a query
    // running into the thousands of seconds still fits the budget
    // checked here; five-digit QPS renders 7 chars
    val results = SparkEntry.queries.keys.toSeq.sorted.map(k => k -> 8884.88)
    val line = Bench.summaryLine(results, Some(8884.88),
      88888.8, 88888.8, 88888.8, 8884.88, 88888.8,
      Seq(8884.88, 8884.88, 8884.88, 8884.88), contended = true,
      "sf0.001", Some(8884.88), parRatio = 888.88, minMerged = 8888,
      ctnClass = 2, fiLoadInbenchSec = 8884.88, rpcQps = 88888.8)
    assert(line.length < TailBudget,
      s"summary line is ${line.length} chars (budget $TailBudget) for " +
        s"${results.size} queries — shorten keys before adding more queries")
    // the cap is what makes that budget independent of query-set size
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    val qKeys = (parsed \ "queries").asInstanceOf[org.json4s.JObject].obj.map(_._1)
    assert(qKeys.size === math.min(Bench.TopQueriesOnLine, results.size))
    assert((parsed \ "nq").asInstanceOf[org.json4s.JInt].num.toInt === results.size)
  }

  test("listed top queries + rest reconcile with the total") {
    val results = (1 to 40).map(i => f"q$i%02d_x" -> i.toDouble)
    val line = Bench.summaryLine(results, None, 1, 1, 1, 1, 1, Seq(1, 1, 1, 1), contended = false, "sf")
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    val qs = (parsed \ "queries").asInstanceOf[org.json4s.JObject].obj
    // slowest TopQueriesOnLine entries: 40 down to 17
    assert(qs.map(_._1).head === "q40")
    assert(qs.size === Bench.TopQueriesOnLine)
    def num(v: org.json4s.JValue): Double = v match {
      case org.json4s.JDouble(d) => d
      case org.json4s.JInt(i) => i.toDouble // r2 renders 40.0 as "40"
      case other => fail(s"non-numeric $other")
    }
    val listed = qs.map(kv => num(kv._2)).sum
    val rest = num(parsed \ "rest")
    val total = num(parsed \ "value")
    assert(math.abs(listed + rest - total) < 0.2) // r2 rounding slack
  }

  test("summary line is valid JSON with the expected metric keys") {
    val results = Seq("q01_pricing_summary" -> 0.5, "q41_ngram_jaccard" -> 1.975)
    val line = Bench.summaryLine(results, Some(22.24),
      398.44, 600.4, 572.0, 7.9, 370.81, Seq(0.31, 0.42, 0.33, 0.44),
      contended = false, "sf0.1", Some(8.37), parRatio = 1.13, minMerged = 12,
      ctnClass = 1, fiLoadInbenchSec = 11.9, rpcQps = 412.3)
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    val keys = parsed.asInstanceOf[org.json4s.JObject].obj.map(_._1)
    assert(keys === List("metric", "value", "unit", "nq", "rawv", "rr",
      "queries", "rest",
      "builds_sec", "qps", "pq_qps", "shard_qps", "rpc_qps", "fi_load_sec",
      "fi_load_inb", "fi_qps", "cal", "ctn", "ctc", "cpr", "mm", "rk", "sr", "sf"))
    assert((parsed \ "rpc_qps").asInstanceOf[org.json4s.JDouble].num === 412.3)
    assert((parsed \ "ctn").asInstanceOf[org.json4s.JInt].num.toInt === 0)
    assert((parsed \ "ctc").asInstanceOf[org.json4s.JInt].num.toInt === 1)
    assert((parsed \ "fi_load_inb").asInstanceOf[org.json4s.JDouble].num === 11.9)
    assert((parsed \ "cpr").asInstanceOf[org.json4s.JDouble].num === 1.1)
    assert((parsed \ "mm").asInstanceOf[org.json4s.JInt].num.toInt === 12)
    assert((parsed \ "sr").asInstanceOf[org.json4s.JDouble].num === 8.4)
    val qKeys = (parsed \ "queries").asInstanceOf[org.json4s.JObject].obj.map(_._1)
    assert(qKeys === List("q41", "q01")) // slowest first
    val cal = (parsed \ "cal").asInstanceOf[org.json4s.JArray].arr
    assert(cal.size === 4)
  }

  test("colliding short keys fall back to full names, never drop a metric") {
    val results = Seq("q01_a" -> 0.1, "q01_b" -> 0.2)
    val line = Bench.summaryLine(results, None, 1, 1, 1, 1, 1, Seq(1, 1, 1, 1), contended = false, "sf")
    assert(line.contains("\"q01_a\":0.1") && line.contains("\"q01_b\":0.2"))
  }

  test("calibration spin loop returns a positive bounded time") {
    val t = Bench.calSpin()
    assert(t > 0.0 && t < 60.0, s"calSpin returned $t sec")
  }

  test("parallel calibration: ratio math and the 2x trip bar") {
    // perfect scaling: N threads of 1/N work finish in spin/N -> ratio 1
    // (N is host-derived, capped at 8 — a hardcoded 8 on a 4-core host
    // would read ratio 2 on a healthy machine, the r14 advisor note)
    val n = Bench.ParallelCalThreads
    assert(n >= 2 && n <= 8)
    assert(math.abs(Bench.parallelRatio(0.40 / n, 0.40) - 1.0) < 1e-9)
    // halved parallel capacity (the r13 blind spot: serial spin quiet,
    // parallel wall doubled) -> ratio 2, trips
    assert(Bench.parNoisy(Bench.parallelRatio(0.40 / n * 2.02, 0.40)))
    // mild oversubscription does not trip
    assert(!Bench.parNoisy(Bench.parallelRatio(0.40 / n * 1.4, 0.40)))
    // degenerate spin -> sentinel, never a divide-by-zero trip
    assert(Bench.parallelRatio(0.05, 0.0) === -1.0)
    assert(!Bench.parNoisy(-1.0))
    // and the real probe completes with a sane wall time on this host
    val spin = Bench.calSpin()
    val par = Bench.calSpinParallel()
    val r = Bench.parallelRatio(par, spin)
    assert(par > 0.0 && r > 0.0, s"par=$par ratio=$r")
  }

  test("bracketNoisy: relative disagreement rule, plus optional absolute pin") {
    // agreeing samples are quiet regardless of absolute value
    assert(!Bench.bracketNoisy(0.36, 0.41, None))
    assert(!Bench.bracketNoisy(0.17, 0.19, None))
    // the r11 failure shape: 0.36 before vs 0.57 after -> noisy
    assert(Bench.bracketNoisy(0.36, 0.57, None))
    assert(Bench.bracketNoisy(0.57, 0.36, None)) // symmetric
    // absolute pin: agreeing-but-inflated samples turn noisy only when
    // the env baseline says the host's quiet constant is far below
    assert(!Bench.bracketNoisy(0.40, 0.42, Some(0.35)))
    assert(Bench.bracketNoisy(0.40, 0.42, Some(0.18)))
  }

  test("closing bracket: injected late load trips, quiet close does not") {
    // the BENCH_r14 shape verbatim: mid 0.38 quiet, after 1.14 — the
    // (before, mid) rule stamped `contended: false` and the 301 s
    // artifact cost a fourth hand-adjudication round; the closing
    // bracket must trip on exactly these samples
    assert(Bench.closingTrips(0.38, 1.14, prPost = 1.5, None))
    // serial legs agreeing but parallel capacity halved also trips
    assert(Bench.closingTrips(0.38, 0.40, prPost = 2.3, None))
    // quiet close: neither leg trips
    assert(!Bench.closingTrips(0.38, 0.41, prPost = 1.4, None))
    // absolute pin: agreeing-but-inflated close trips when the env
    // baseline says the host's quiet constant is far below
    assert(Bench.closingTrips(0.80, 0.82, prPost = 1.0, Some(0.35)))
  }

  test("contended stamp: false as soon as one sweep was quiet-bracketed") {
    assert(!Bench.contendedStamp(Seq(false)))
    assert(!Bench.contendedStamp(Seq(true, false)))
    assert(!Bench.contendedStamp(Seq(false, true))) // r14 replay: quiet
    // opening bracket, noisy close -> late resweep ran contended; the
    // min-merge still contains sweep-1's (bracket-quiet) numbers
    assert(Bench.contendedStamp(Seq(true)))
    assert(Bench.contendedStamp(Seq(true, true, true)))
  }

  test("contention class: quiet / late-trip / contended three-way") {
    // provably quiet: the last sweep that ran was quiet-bracketed
    assert(Bench.contentionClass(Seq(false)) === 0)
    assert(Bench.contentionClass(Seq(true, false)) === 0)
    assert(Bench.contentionClass(Seq(false, false)) === 0)
    assert(Bench.contentionClass(Seq(true, false, false)) === 0)
    // the r15 advisor gap, verbatim: quiet opening bracket, tripped
    // close whose resweep was itself noisy — min(poisoned, poisoned)
    // must NOT read as host-clean
    assert(Bench.contentionClass(Seq(false, true)) === 1)
    assert(Bench.contentionClass(Seq(true, false, true)) === 1)
    // every sweep noisy
    assert(Bench.contentionClass(Seq(true)) === 2)
    assert(Bench.contentionClass(Seq(true, true, true)) === 2)
    // the boolean stamp stays consistent with the class: contended
    // (class 2) iff contendedStamp true
    for (s <- Seq(Seq(false), Seq(true), Seq(false, true), Seq(true, false)))
      assert((Bench.contentionClass(s) === 2) === Bench.contendedStamp(s))
  }

  test("forced recheck: late-trip rounds recheck the slowest N without a prev baseline") {
    val sweep = Seq("q1" -> 10.0, "q2" -> 5.0, "q3" -> 0.4, "q4" -> 2.0, "q5" -> 7.0)
    // no prev record at all: the 3x rule alone selects nothing...
    assert(Bench.recheckTargets(sweep, Map.empty) === Nil)
    // ...but a late-trip round forces the slowest N (>0.5s floor holds)
    assert(Bench.recheckTargets(sweep, Map.empty, forceTopSlowest = 3)
      === Seq("q1", "q5", "q2"))
    // union with the 3x outliers, deduped, slowest first, capped
    val prev = Map("q4" -> 0.5)
    assert(Bench.recheckTargets(sweep, prev, forceTopSlowest = 2)
      === Seq("q1", "q5", "q4"))
    assert(Bench.recheckTargets(sweep, prev, cap = 2, forceTopSlowest = 2)
      === Seq("q1", "q5"))
  }

  test("recheck bar is 1.5x prev: mid-pack inflation selects itself (r17 item 2)") {
    // replayed r17-shaped profile: a uniform ~1.3-2.5x inflation of
    // the mid-pack (q3/q4) with the slowest entries (q1/q2) inside
    // their band — the old 3x bar selected NOTHING here and the
    // round's verdict had to be rebuilt from c8/solo side-channels
    val sweep = Seq(
      "q1" -> 12.0, "q2" -> 8.0, // slow but ~1.1x prev: not inflated
      "q3" -> 2.5, "q4" -> 1.3, // mid-pack, ~2.5x prev: inflated
      "q5" -> 0.4, // 4x prev but under the 0.5s absolute floor
      "q6" -> 0.9) // 1.38x prev: inside the band
    val prev = Map("q1" -> 11.0, "q2" -> 7.5, "q3" -> 1.0, "q4" -> 0.52,
      "q5" -> 0.1, "q6" -> 0.65)
    assert(Bench.recheckTargets(sweep, prev) === Seq("q3", "q4"))
    // the cap still bounds a fully-inflated record
    val wide = (1 to 40).map(i => s"w$i" -> 5.0)
    val widePrev = wide.map { case (k, _) => k -> 1.0 }.toMap
    assert(Bench.recheckTargets(wide, widePrev, cap = 24).size === 24)
  }

  test("rest-bucket drift: a uniform ambient inflation classifies as not-provably-quiet (r17 item 2)") {
    // replayed r17 profile in miniature: every tail query ~1.25x its
    // prev — no single query trips any per-query bar, but the rest
    // SUM moves 25%. top = 2 here stands in for TopQueriesOnLine.
    val prev = (1 to 30).map(i => s"q$i" -> 1.0).toMap
    val inflated = (1 to 30).map(i => s"q$i" -> 1.25)
    val r = Bench.restDriftRatio(inflated, prev, top = 2)
    assert(math.abs(r - 1.25) < 1e-9)
    assert(Bench.restDrifted(r))
    // a quiet replay reads ~1.0 and does not trip
    val quiet = (1 to 30).map(i => s"q$i" -> 1.05)
    val rq = Bench.restDriftRatio(quiet, prev, top = 2)
    assert(math.abs(rq - 1.05) < 1e-9 && !Bench.restDrifted(rq))
    // improvements never trip (ratio < 1), and the comparison uses
    // the same tail definition on BOTH sides (top slowest excluded)
    val better = (1 to 30).map(i => s"q$i" -> 0.8)
    assert(!Bench.restDrifted(Bench.restDriftRatio(better, prev, top = 2)))
    // no prev record / empty sweep -> sentinel, never a trip
    assert(Bench.restDriftRatio(inflated, Map.empty, top = 2) === -1.0)
    assert(Bench.restDriftRatio(Nil, prev, top = 2) === -1.0)
    assert(!Bench.restDrifted(-1.0))
  }

  test("soloFiLoad: reads the pinned warm load + round tag, sentinels and corrupt files -> None") {
    val tmp = java.nio.file.Files.createTempFile("bench-qps", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"repeat":5,"fi_load_warm_sec":6.42,"qps_warm":{"single":364.2}}""")
    assert(Bench.soloFiLoad(tmp.toString) === Some((6.42, None)))
    java.nio.file.Files.writeString(tmp,
      """{"round_tag":"r16","fi_load_warm_sec":6.42}""")
    assert(Bench.soloFiLoad(tmp.toString) === Some((6.42, Some("r16"))))
    java.nio.file.Files.writeString(tmp, """{"fi_load_warm_sec":-1}""")
    assert(Bench.soloFiLoad(tmp.toString) === None)
    assert(Bench.soloFiLoad("/nonexistent/BENCH_QPS.json") === None)
    java.nio.file.Files.writeString(tmp, "{not json")
    assert(Bench.soloFiLoad(tmp.toString) === None)
    java.nio.file.Files.deleteIfExists(tmp)
  }

  test("soloFiLoadFresh: stale cross-round artifacts never headline (r16 advisor)") {
    // untagged dev run: old behavior, any pinned artifact headlines
    assert(Bench.soloFiLoadFresh(Some("r16"), 0L, currRound = "", benchStartMs = 100L))
    assert(Bench.soloFiLoadFresh(None, 0L, currRound = "", benchStartMs = 100L))
    // tagged round, artifact from the SAME round: fresh
    assert(Bench.soloFiLoadFresh(Some("r17"), 0L, "r17", 100L))
    // tagged round, artifact from an OLDER round + pre-start mtime:
    // STALE — the masked-regression shape the advisor flagged
    assert(!Bench.soloFiLoadFresh(Some("r16"), 50L, "r17", 100L))
    assert(!Bench.soloFiLoadFresh(None, 50L, "r17", 100L))
    // mtime escape: a re-pin written after this bench started counts
    // regardless of its tag
    assert(Bench.soloFiLoadFresh(Some("r16"), 150L, "r17", 100L))
    assert(Bench.soloFiLoadFresh(None, 150L, "r17", 100L))
  }

  test("r2OrNull renders unmeasured sentinels as JSON null") {
    assert(Bench.r2OrNull(-1.0) === "null")
    assert(Bench.r2OrNull(0.38) === "0.38")
  }

  test("solo-recheck selection: >1.5x prev, >0.5s floor, capped, slowest first") {
    val prev = Map("q124" -> 1.5, "q103" -> 0.44, "q01" -> 0.1, "q88" -> 1.4)
    val sweep = Seq(
      "q124" -> 34.4, // 23x prev -> recheck (the r14 poster child)
      "q103" -> 9.43, // 21x prev -> recheck
      "q88" -> 2.0,   // 1.43x prev -> inside the band
      "q01" -> 0.4,   // 4x prev but under the 0.5s floor -> skip
      "q07" -> 9.9)   // no prev record -> nothing to compare against
    assert(Bench.recheckTargets(sweep, prev) === Seq("q124", "q103"))
    // cap: a fully-poisoned sweep rechecks only the `cap` slowest
    val many = (1 to 30).map(i => f"q$i%03d" -> (10.0 + i))
    val prevAll = many.map { case (k, _) => k -> 1.0 }.toMap
    assert(Bench.recheckTargets(many, prevAll, cap = 5).size === 5)
    assert(Bench.recheckTargets(many, prevAll, cap = 5).head === "q030")
    // first round / missing file -> empty prev -> no rechecks
    assert(Bench.recheckTargets(sweep, Map.empty) === Nil)
  }

  test("prevQueryTimes: reads queries_sec, tolerates a missing file") {
    val tmp = java.nio.file.Files.createTempFile("bench-prev", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"sf_dir":"x","queries_sec":{"q01_a":0.5,"q02_b":34},"contended":false}""")
    val m = Bench.prevQueryTimes(tmp.toString)
    assert(m === Map("q01_a" -> 0.5, "q02_b" -> 34.0))
    assert(Bench.prevQueryTimes("/nonexistent/BENCH_QUERIES.json") === Map.empty)
    java.nio.file.Files.deleteIfExists(tmp)
  }

  test("numeric rendering trims trailing zeros and keeps JSON validity") {
    assert(Bench.r2(0.50) === "0.5")
    assert(Bench.r2(1.00) === "1")
    assert(Bench.r2(27.4) === "27.4")
    assert(Bench.r2(884.88) === "884.9")
    assert(Bench.r1(398.44) === "398.4")
    assert(Bench.r1(-1.0) === "-1")
  }
}
