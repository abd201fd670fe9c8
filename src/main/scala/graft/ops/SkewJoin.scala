package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §7.4.5): a hot key that
  * would land a whole shuffle partition on one task is split across
  * `salts` sub-partitions; the build side is replicated once per salt.
  *
  * The salt on the probe side must spread ROWS of the same key, so it
  * hashes the probe's full row id-ish columns (deterministic — no
  * rand()). Result is row-identical to a plain join: each probe row
  * meets each matching build row exactly once (the build row carrying
  * the probe's salt).
  *
  * AQE's skew-join split handles sort-merge skew automatically at
  * runtime, and MEASURED (BASELINE.md §aqe-vs-salting: 33%-hot-key
  * 20 M-row join, broadcast disabled) it beats this device outright —
  * 1.18 s vs 2.45 s — because the split touches only the oversized
  * partition while salting replicates the build side salts× for
  * every row, hot or not. Explicit salting remains the tool when AQE
  * can't see the skew: skewed AGGREGATIONS (no join to split),
  * non-equi/interval joins, or when the plan must be deterministic
  * (AQE decisions depend on runtime stats).
  */
object SkewJoin {

  def saltedEquiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, salts: Int, probeSpread: Seq[String]): DataFrame = {
    val spreadCols: Seq[Column] = probeSpread.map(col)
    val salted = probe.withColumn("__salt",
      pmod(hash(spreadCols: _*), lit(salts)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    // PIN the shuffle regime (r16 — caught by PLANS' bcast_bytes_max
    // column): Catalyst's size estimate of the pruned build scan can
    // sit under the broadcast threshold even after the explode, and a
    // salted BROADCAST join is a contradiction twice over — a broadcast
    // join has no shuffle skew to salt, and what actually shipped was
    // the ×salts-REPLICATED side (1.5 GB deserialized at sf1, ~15 GB
    // at sf10 — per-executor memory a real cluster does not have).
    // The device exists for the shuffle regime, so the hint makes that
    // regime the plan at every size; callers in the broadcast regime
    // should join plain and skip salting entirely.
    salted.join(replicated.hint("merge"),
        salted("__salt") === replicated("__salt") &&
          col(probeKey) === col(buildKey))
      .drop("__salt")
  }
}
