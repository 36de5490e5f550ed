package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r10 bench artifact defect, replayed as data: BENCH_r10 recorded
  * q_semantic_dedup 8.19/8.83 s and q_sessionize 6.45/3.83 s (code
  * unchanged, 0.75 s / 0.33 s isolated at the same sha) with
  * degraded:0 — a host stall window spanned both passes, so neither
  * min-of-N nor the cross-pass spread check fired. BenchGuard's
  * diag-reference comparison must flag exactly that shape.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("parseRefMins reads per-query mins out of a committed diag line") {
    val diag = """{"sha":"87c11e9ab","sf":"/root/testdata/sf0.1","passes":2,""" +
      """"calib":[0.21,0.19,0.22],"degraded":0,"total_min":96.2,"n_queries":150,""" +
      """"headline_total":50.4,"passes_per_query":{"q1_pricing_summary":[1.40,1.09],""" +
      """"q_semantic_dedup":[0.87,0.74],"q_sessionize":[0.45,0.37],""" +
      """"q_setsim_join":[4.66,3.55]},"errors":{"q_bogus":"SomeError: [1.0,2.0] msg"}}"""
    val mins = BenchGuard.parseRefMins(diag)
    assert(mins("q_semantic_dedup") == 0.74)
    assert(mins("q_sessionize") == 0.37)
    assert(mins("q1_pricing_summary") == 1.09)
    // the calib array (before passes_per_query) and error strings
    // (after) must not parse as queries
    assert(!mins.contains("calib") && !mins.contains("q_bogus"))
    assert(mins.size == 4)
    // junk in: nothing out
    assert(BenchGuard.parseRefMins("") == Map.empty)
    assert(BenchGuard.parseRefMins("{\"no_passes\":1}") == Map.empty)
    // scale-factor gate: a diag from another SF is no reference
    assert(BenchGuard.parseRefMins(diag, Some("/root/testdata/sf0.1")).size == 4)
    assert(BenchGuard.parseRefMins(diag, Some("/tmp/sf10")) == Map.empty)
  }

  test("the r10 stall window (both passes inflated) is flagged; healthy rows are not") {
    val ref = Map("q_semantic_dedup" -> 0.74, "q_sessionize" -> 0.37,
      "q_setsim_join" -> 3.55, "q_pagerank" -> 1.17, "q_fast" -> 0.05)
    // the three r10 rows, verbatim
    assert(BenchGuard.isSuspect(Seq(8.19, 8.83), ref.get("q_semantic_dedup")))
    assert(BenchGuard.isSuspect(Seq(6.45, 3.83), ref.get("q_sessionize")))
    // q_setsim_join's window pass was already repassed in-run: min 5.09
    // is only 1.4x its committed 3.55 — healthy, not flagged
    assert(!BenchGuard.isSuspect(Seq(38.0, 5.35, 5.09), ref.get("q_setsim_join")))
    // a real code change inside 3x (the r10 pagerank mass fix,
    // 1.17 -> 1.85) stays unflagged
    assert(!BenchGuard.isSuspect(Seq(1.91, 1.85), ref.get("q_pagerank")))
    // sub-second noise on a tiny query never trips the ratio
    assert(!BenchGuard.isSuspect(Seq(0.22, 0.31), ref.get("q_fast")))
    // no reference (new query, renamed query): nothing to compare
    assert(!BenchGuard.isSuspect(Seq(9.0, 9.0), None))
    // a >3x ratio that is ALSO >0.5s absolute: flagged even at 4 passes
    assert(BenchGuard.isSuspect(Seq(2.2, 1.9, 2.4, 2.0), Some(0.5)))
  }

  test("r11 sub-threshold residue (2.4x at multi-second scale) is flagged by the 2x tier") {
    // the exact shape BENCH_r11 recorded vs the same-sha committed
    // diag: q_embed_neardup [3.76, 4.62] against ref min 1.54 (2.4x)
    // and q_dup_coverage [2.59, 2.48] against 0.88 (2.8x) — both sat
    // under the single 3x bar and shipped ~4-5 s of stall residue
    assert(BenchGuard.isSuspect(Seq(3.76, 4.62), Some(1.54)))
    assert(BenchGuard.isSuspect(Seq(2.59, 2.48), Some(0.88)))
    // but the 2x tier needs >=1 s observed: a 0.9 s min at 2.5x stays
    // with the 3x rule (sub-second scheduling noise is real)
    assert(!BenchGuard.isSuspect(Seq(0.95, 0.9), Some(0.36)))
    // and a genuine 1.8x drift on a heavy query still does not flag
    assert(!BenchGuard.isSuspect(Seq(6.5, 6.4), Some(3.55)))
  }
}
