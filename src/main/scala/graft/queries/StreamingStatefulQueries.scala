package graft.queries

import graft.QueryPack
import graft.streaming.StreamingJobs

/** SURVEY.md §2B category J — the three TEST-only stateful streaming
  * rows. No SQL oracles by design (watermark/late semantics are
  * trigger-dependent); the driver records a rows-only check and the
  * ScalaTest suite asserts the semantic invariants (late rows dropped,
  * duplicates removed, state counts == batch counts).
  */
object StreamingStatefulQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "stream_watermark_late" -> ((s, d) => StreamingJobs.watermarkLate(s, d)),
    "stream_dedup_stateful" -> ((s, d) => StreamingJobs.dedupStateful(s, d)),
    "stream_stateful_count" -> ((s, d) => StreamingJobs.statefulCount(s, d)),
    "stream_stream_join" -> ((s, d) => StreamingJobs.streamStreamJoin(s, d)),
    "stream_tws_agg" -> ((s, d) => StreamingJobs.transformWithStateAgg(s, d)),
    // TEST-only: TTL expiry is processing-time (wall-clock) dependent;
    // the key runs an unexpirable 1-h TTL for determinism and
    // SemanticsSpec pins the expiry semantics with a ms TTL + real gap
    "stream_tws_ttl" -> ((s, d) => StreamingJobs.twsTtl(s, d)),
    "stream_foreachbatch_sink" -> ((s, d) => StreamingJobs.foreachBatchSink(s, d)),
    "stream_available_now" -> ((s, d) => StreamingJobs.availableNowDrain(s, d)),
    "stream_static_join" -> ((s, d) => StreamingJobs.streamStaticJoin(s, d))
  )

  /** The inner stream–stream join IS oracled: inner joins emit matches
    * as soon as both sides arrive (no watermark wait), and the in-order
    * replay keeps every needed click in state (10-min join window <
    * 30-min watermark), so the result equals the batch interval join
    * exactly. The other three rows stay TEST-only (trigger-dependent).
    */
  val oracleSql: Map[String, String] = Map(
    "stream_stream_join" ->
      """SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 10 MINUTES AND c.ts < p.ts
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin,

    // stream-static enrichment: the static side is stateless and the
    // in-order Append replay emits every closed window, so the
    // union-of-batches equals the batch join+aggregate (window start ==
    // hour trunc for aligned 1 h windows — the stream_tumbling
    // precedent); the flush sentinels never match the dimension
    "stream_static_join" ->
      """SELECT date_trunc('hour', ts) AS ws, c_nationkey AS nation,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // transformWithState running aggregate: the final state equals the
    // batch aggregate (counts/sums fold the same rows), so it hash-
    // matches a plain GROUP BY oracle despite streaming execution.
    // Both engines sum `value` as EXACT 2-dp decimal (streaming side:
    // Long cents in state) — a double fold accumulated in per-batch
    // order vs DuckDB's scan order could flip a 2-dp round on a
    // half-cent boundary.
    "stream_tws_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sv
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Append-mode watermark emission over an in-order replay emits every
    // finalized window exactly once, so the external parquet sink's
    // union-of-batches equals the batch tumbling aggregate.
    "stream_foreachbatch_sink" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    // the AvailableNow drain replays the same in-order backlog through
    // bounded micro-batches (maxFilesPerTrigger=1) and self-terminates;
    // Append-mode emission parity gives the identical batch aggregate.
    "stream_available_now" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin
  )
}
