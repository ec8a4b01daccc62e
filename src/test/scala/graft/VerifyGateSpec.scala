package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the recall-artifact gating rules (RecallGate) — the r13
  * units bug class: a fixed-point `*_per_10k` recall gating against
  * the fractional 0.70 bar without normalization passes trivially
  * ("6863 >= 0.70"), which is exactly how a sub-gate tier hid for a
  * round. These rules also back scripts/oracle_check.py's rows-only
  * loop (kept in sync by hand — the conventions are documented at
  * RecallGate's Scaladoc and in the script). */
class VerifyGateSpec extends AnyFunSuite {
  import RecallGate._

  test("per-10k columns normalize by 10^4 before gating — the r13 bug shape") {
    assert(normalize("recall_per_10k", 6863.0) === 0.6863)
    // 6863 raw would trivially pass 0.70; normalized it must FAIL
    assert(!passes(normalize("recall_per_10k", 6863.0), gateValue("recall_per_10k", hasSiblingGate = false)))
    assert(passes(normalize("recall_per_10k", 7100.0), 0.70))
    // fractional columns pass through untouched
    assert(normalize("avg_recall_at_10", 0.79) === 0.79)
    assert(normalize("pair_recall", 1.0) === 1.0)
  }

  test("legacy raw prev values normalize for drift; already-normalized stay") {
    // r13 RECALL.json recorded q198.recall_per_10k = 6863 raw
    assert(normalizePrev("recall_per_10k", 6863.0) === 0.6863)
    // a genuinely normalized prev (<= 1.0) must NOT be divided again
    assert(normalizePrev("recall_per_10k", 0.6863) === 0.6863)
    // non-per-10k columns never rescale
    assert(normalizePrev("avg_recall_at_10", 0.98) === 0.98)
  }

  test("gated column selection: recall + pass_*, never *_gate declarations") {
    val cols = Seq("tier", "recall_per_10k", "recall_per_10k_gate",
      "precision_per_10k", "pass_recall_monotone", "min_recall_at_10")
    assert(gatedColumns(cols) ===
      Seq("recall_per_10k", "pass_recall_monotone", "min_recall_at_10"))
    // precision is informational; the gate declaration is never gated
    assert(!gatedColumns(cols).contains("recall_per_10k_gate"))
  }

  test("sibling gate switches a column to margin gating at 0.0") {
    val cols = Seq("recall_per_10k", "recall_per_10k_gate")
    assert(siblingGate(cols, "recall_per_10k") === Some("recall_per_10k_gate"))
    assert(siblingGate(Seq("recall_per_10k"), "recall_per_10k") === None)
    assert(entryKey("recall_per_10k", hasSiblingGate = true) === "recall_per_10k_margin")
    assert(entryKey("recall_per_10k", hasSiblingGate = false) === "recall_per_10k")
    assert(gateValue("recall_per_10k", hasSiblingGate = true) === 0.0)
    // a degraded tier: recall 2500 vs its own 4000 bar -> margin -0.15 FAILS
    val margin = normalize("recall_per_10k", 2500.0 - 4000.0)
    assert(margin === -0.15 && !passes(margin, 0.0))
    // a tier riding its documented lower bar: 5732 vs 5000 -> +0.0732 passes
    assert(passes(normalize("recall_per_10k", 5732.0 - 5000.0), 0.0))
  }

  test("absolute gates: pass_* at 1.0, min_* at 0.30, default 0.70; NaN always fails") {
    assert(gateValue("pass_monotone", hasSiblingGate = false) === 1.0)
    assert(gateValue("min_recall_at_10", hasSiblingGate = false) === 0.30)
    assert(gateValue("avg_recall_at_10", hasSiblingGate = false) === 0.70)
    assert(!passes(Double.NaN, 0.0))
    assert(!passes(Double.NaN, 0.70))
  }

  test("drift: >0.05 drop fails, improvements and small wobble pass") {
    assert(driftOk(0.99, 0.95))
    assert(driftOk(0.95, 0.99)) // -0.04: inside tolerance
    assert(!driftOk(0.72, 0.99)) // the erosion shape the gate exists for
    assert(!driftOk(Double.NaN, 0.5))
  }
}
