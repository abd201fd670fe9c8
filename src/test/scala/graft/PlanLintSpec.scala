package graft

/** Suite enforcement of the all-inventory plan lint (r13 verdict #3):
  * PlanLint.lintAll runs every SparkEntry key's plan through the global
  * structural invariants — no CartesianProduct outside join_cross, no
  * Expand outside the grouping-set family, no unbounded global Window,
  * no broadcast hint over a growing table — at sf0.001 (the invariants
  * are structural, so the smallest fixture is the cheapest witness; the
  * sf0.01 PLANS_r14.json artifact from `runMain graft.PlanLint` is the
  * judged record). A regression in ANY key's plan now fails `sbt test`
  * instead of surfacing as bench noise.
  */
class PlanLintSpec extends SparkSpec {

  test("all-inventory plan lint: zero structural flags at sf0.001") {
    val reports = PlanLint.lintAll(spark, sf)
    assert(reports.length == SparkEntry.queries.size)
    val flagged = reports.filter(_.flags.nonEmpty)
    assert(flagged.isEmpty, flagged.map(r => s"${r.key}: ${r.flags.mkString(",")}")
      .mkString("\n  ", "\n  ", ""))
  }

  test("bcast budget bar: decision table pinned (r16 verdict #1)") {
    // the bar is a pure decision over (key, measured deserialized bytes,
    // budget) — pin the table so the enforcement semantics can't drift:
    // under budget → silent; over budget → adjudicated keys record their
    // reason, everything else flags and fails the lint run
    val b = PlanLint.BcastBudgetDefault
    assert(b == 100L * 1024 * 1024)
    assert(PlanLint.bcastVerdict("join_shuffle_inner", b, b).isEmpty,
      "exactly at budget is under the bar")
    assert(PlanLint.bcastVerdict("join_shuffle_inner", b + 1, b) ==
      Some(Right("bcast_deser_over_budget")),
      "an unadjudicated exceedance must flag")
    assert(PlanLint.bcastVerdict("join_broadcast_inner", 192L << 20, b)
      .exists(_.isLeft), "the standing sf10 instance is adjudicated")
    assert(PlanLint.bcastVerdict("join_theta_range", 192L << 20, b)
      .exists(_.isLeft), "the standing sf10 instance is adjudicated")
    // join_skew_salted is deliberately NOT adjudicated: its r16 1.5 GB
    // broadcast was a real defect (fixed with a pinned SMJ); if it ever
    // broadcasts over budget again the bar must fire
    assert(PlanLint.bcastVerdict("join_skew_salted", 1_510L << 20, b) ==
      Some(Right("bcast_deser_over_budget")))
    // adjudications must name real inventory keys, and reasons must be
    // JSON-safe (they are inlined verbatim into the PLANS artifact)
    PlanLint.BcastAdjudicated.foreach { case (k, reason) =>
      assert(SparkEntry.queries.contains(k), s"stale adjudication: $k")
      assert(!reason.exists(c => c == '"' || c == '\\' || c.isControl),
        s"reason for $k must be JSON-safe")
    }
  }

  test("lint allowlists stay tied to real plans: join_cross is cartesian, rollup is Expand") {
    // the allowlist entries must keep EARNING their exemption — if
    // join_cross stops planning a cartesian or agg_rollup stops using
    // Expand, the allowlist is stale and should shrink
    val cross = PlanLint.lintKey(spark, sf, "join_cross")(
      SparkEntry.queries("join_cross"))
    assert(cross.flags.isEmpty, s"join_cross flags: ${cross.flags}")
    val rollup = PlanLint.lintKey(spark, sf, "agg_rollup")(
      SparkEntry.queries("agg_rollup"))
    assert(rollup.flags.isEmpty, s"agg_rollup flags: ${rollup.flags}")
  }
}
