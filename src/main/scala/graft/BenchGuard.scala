package graft

/** Stall-window defenses for the bench harness, extracted as pure
  * functions so the r10 failure mode is a unit test, not a hope.
  *
  * BENCH_r10 recorded 12x inflation on three alphabetically
  * consecutive queries (q_semantic_dedup 8.19/8.83 s vs 0.75 s
  * isolated, same sha) with degraded:0: the host stall window spanned
  * BOTH measurement passes, so min-of-N kept a stalled number, the
  * cross-pass spread check saw spread 1.08, and the 3-point
  * calibration probe straddled the window without sampling it. Two
  * additions close the blind spot:
  *
  *  - every query's min is compared against the COMMITTED
  *    bench_diag.json's min for the same query ([[isSuspect]]); a >3x
  *    inflation earns an end-of-run re-probe appended to its pass
  *    list, so a transient window cannot be the only observation;
  *  - the calibration probe runs every ~12 queries instead of 3x per
  *    run, so a multi-minute window lands ON a probe and flips
  *    `degraded:1`.
  */
object BenchGuard {
  /** Per-query min from a bench_diag.json's `passes_per_query`
    * object. Tolerant of the surrounding keys (calib arrays before,
    * error strings after) — only `"name":[nums]` pairs inside the
    * passes object parse. When `sfDir` is given, a diag recorded at a
    * DIFFERENT scale factor yields no reference at all: comparing an
    * sf0.1 diag against an sf10 soak would flag every query.
    */
  def parseRefMins(diagJson: String, sfDir: Option[String] = None): Map[String, Double] = {
    val sfOk = sfDir.forall(d => diagJson.contains(s""""sf":"$d""""))
    val i = diagJson.indexOf("\"passes_per_query\":")
    if (i < 0 || !sfOk) Map.empty
    else {
      val re = """"([A-Za-z0-9_]+)":\[([0-9eE+\-.,]+)\]""".r
      re.findAllMatchIn(diagJson.substring(i))
        .flatMap { m =>
          val vs = m.group(2).split(",").flatMap(s => s.toDoubleOption)
          if (vs.isEmpty) None else Some(m.group(1) -> vs.min)
        }
        .toMap
    }
  }

  /** A query is SUSPECT when every observed pass is inflated vs the
    * committed reference min — i.e. min-of-N itself rode a stall
    * window. Two tiers: >3x for anything over 0.5 s, and >2x once the
    * observed min is >=1 s — r11's artifact recorded 2.4-2.9x stall
    * residue on multi-second queries (q_embed_neardup 3.76 vs ref
    * 1.54) that sat just under the single 3x bar; at >=1 s a 2x ratio
    * is far outside scheduler noise and the re-probe costs one cheap
    * extra pass. Genuine code regressions also trip this; the re-probe
    * just buys them one clean confirmation pass, which is what a
    * regression read wants anyway.
    */
  def isSuspect(passes: Seq[Double], refMin: Option[Double]): Boolean =
    refMin.exists { r =>
      passes.nonEmpty && {
        val mn = passes.min
        (mn > 3.0 * r && mn > 0.5) || (mn > 2.0 * r && mn >= 1.0)
      }
    }
}
