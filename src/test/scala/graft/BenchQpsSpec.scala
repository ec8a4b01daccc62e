package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the solo serving-QPS trend artifact's drift gate (r14 verdict
  * item 3): serving QPS "wobbled" 364→301 across rounds r12–r14 with
  * a host caveat each time — the gate is what makes a real erosion
  * impossible to file under wobble. */
class BenchQpsSpec extends AnyFunSuite {

  test("drift gate: >= 85% of previous passes, below fails, sentinels total") {
    assert(BenchQps.driftOk(301.0, Some(350.0)))   // wobble band: 0.86x
    assert(!BenchQps.driftOk(295.0, Some(350.0)))  // real erosion: 0.84x
    assert(BenchQps.driftOk(500.0, Some(350.0)))   // improvement
    assert(BenchQps.driftOk(301.0, None))          // first pinned run
    assert(BenchQps.driftOk(301.0, Some(-1.0)))    // prev loop failed
    assert(!BenchQps.driftOk(-1.0, Some(350.0)))   // current loop failed
    assert(!BenchQps.driftOk(-1.0, None))
  }

  test("cold/warm split: head vs median-of-rest, repeat=1 fallback") {
    assert(BenchQps.split(Seq(200.0, 300.0, 310.0, 320.0)) === ((200.0, 310.0, 305.0)))
    assert(BenchQps.split(Seq(250.0)) === ((250.0, 250.0, 250.0)))
    assert(BenchQps.split(Nil) === ((-1.0, -1.0, -1.0)))
  }

  test("quiet-side merge keeps the pass with the best warm QPS") {
    // the r15 motivating shape: sharded read 595 then 126 across two
    // settled-host passes — the quiet-side pass is the record
    assert(BenchQps.quietSide(Seq((526.1, 595.5, 563.3), (126.0, 129.9, 126.0)))
      === ((526.1, 595.5, 563.3)))
    assert(BenchQps.quietSide(Seq((302.0, 290.9, 293.2))) === ((302.0, 290.9, 293.2)))
    assert(BenchQps.quietSide(Nil) === ((-1.0, -1.0, -1.0)))
    // a failed pass (-1 warm) never beats a real one
    assert(BenchQps.quietSide(Seq((-1.0, -1.0, -1.0), (100.0, 120.0, 110.0)))._2 === 120.0)
  }

  test("prevArtifact: reads tags + both warm maps, tolerates missing/corrupt files") {
    val tmp = java.nio.file.Files.createTempFile("bench-qps", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"repeat":5,"round_tag":"r16","baseline_round_tag":"r15",""" +
        """"qps_warm":{"single":364.2,"pq":515},""" +
        """"prev_qps_warm":{"single":311.0},"drift_all_ok":true}""")
    assert(BenchQps.prevArtifact(tmp.toString) ===
      ((Some("r16"), Some("r15"),
        Map("single" -> 364.2, "pq" -> 515.0), Map("single" -> 311.0))))
    // pre-r16 artifact: no tags, prev map present
    java.nio.file.Files.writeString(tmp,
      """{"repeat":5,"qps_warm":{"single":364.2},"prev_qps_warm":{"single":311.0}}""")
    assert(BenchQps.prevArtifact(tmp.toString) ===
      ((None, None, Map("single" -> 364.2), Map("single" -> 311.0))))
    assert(BenchQps.prevArtifact("/nonexistent/BENCH_QPS.json") ===
      ((None, None, Map.empty, Map.empty)))
    java.nio.file.Files.writeString(tmp, "{not json")
    assert(BenchQps.prevArtifact(tmp.toString) ===
      ((None, None, Map.empty, Map.empty)))
    java.nio.file.Files.deleteIfExists(tmp)
  }

  test("chooseBaseline: same-round re-run inherits, new round rebases") {
    val warm = Map("single" -> 364.2)
    val base = Map("single" -> 311.0)
    // a second run of round r16 gates against what the first run gated
    // against (round r15's numbers), never its own sibling
    assert(BenchQps.chooseBaseline("r16", Some("r16"), Some("r15"), warm, base)
      === ((Some("r15"), base)))
    // a new round gates against the previous round's fresh numbers
    assert(BenchQps.chooseBaseline("r17", Some("r16"), Some("r15"), warm, base)
      === ((Some("r16"), warm)))
    // untagged current run: old run-over-run behavior
    assert(BenchQps.chooseBaseline("", Some("r16"), Some("r15"), warm, base)
      === ((Some("r16"), warm)))
    // untagged previous artifact: nothing to match, rebase on its warm
    // — and the inherited-from-untagged baseline says so explicitly
    // instead of a null the next reader must re-derive (r16 trivia)
    assert(BenchQps.chooseBaseline("r16", None, None, warm, base)
      === ((Some("untagged"), warm)))
    // no baseline at all stays null, never a misleading "untagged"
    assert(BenchQps.chooseBaseline("r16", None, None, Map.empty, Map.empty)
      === ((None, Map.empty)))
    // same tag but prev run recorded no baseline (first-ever run that
    // round): fall back to its warm rather than an empty gate-nothing
    assert(BenchQps.chooseBaseline("r16", Some("r16"), None, warm, Map.empty)
      === ((Some("r16"), warm)))
  }
}
