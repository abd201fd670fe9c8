package graft.queries

import graft.QueryPack
import graft.streaming.StreamingJobs

/** SURVEY.md §2B category J — the stateful streaming rows. All but
  * stream_tws_ttl are DuckDB-oracled: the file replay is deterministic
  * (one staged file per chunk, processAllAvailable between chunks), so
  * even the watermark late-drop schedule is replayable in SQL. The one
  * TEST-only hold-out is TTL expiry, which is processing-time
  * (wall-clock) dependent; SemanticsSpec pins it instead.
  */
object StreamingStatefulQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "stream_watermark_late" -> ((s, d) => StreamingJobs.watermarkLate(s, d)),
    "stream_dedup_stateful" -> ((s, d) => StreamingJobs.dedupStateful(s, d)),
    "stream_stateful_count" -> ((s, d) => StreamingJobs.statefulCount(s, d)),
    "stream_stream_join" -> ((s, d) => StreamingJobs.streamStreamJoin(s, d)),
    "stream_tws_agg" -> ((s, d) => StreamingJobs.transformWithStateAgg(s, d)),
    "stream_tws_list" -> ((s, d) => StreamingJobs.transformWithStateList(s, d)),
    // TEST-only: TTL expiry is processing-time (wall-clock) dependent;
    // the key runs an unexpirable 1-h TTL for determinism and
    // SemanticsSpec pins the expiry semantics with a ms TTL + real gap
    "stream_tws_ttl" -> ((s, d) => StreamingJobs.twsTtl(s, d)),
    "stream_session_tws" -> ((s, d) => StreamingJobs.twsSessionize(s, d)),
    "stream_foreachbatch_sink" -> ((s, d) => StreamingJobs.foreachBatchSink(s, d)),
    "stream_available_now" -> ((s, d) => StreamingJobs.availableNowDrain(s, d)),
    "stream_restart_recovery" -> ((s, d) => StreamingJobs.restartRecovery(s, d)),
    "stream_static_join" -> ((s, d) => StreamingJobs.streamStaticJoin(s, d)),
    "stream_ingest_dedup" -> ((s, d) => StreamingJobs.ingestDedup(s, d))
  )

  /** The inner stream–stream join is oracled the same way: inner joins
    * emit matches as soon as both sides arrive (no watermark wait), and
    * the in-order replay keeps every needed click in state (10-min join
    * window < 30-min watermark), so the result equals the batch
    * interval join exactly.
    */
  val oracleSql: Map[String, String] = Map(
    // Batch equivalence IS the streaming correctness property for these
    // three (the replay is deterministic: one staged parquet file per
    // chunk, processAllAvailable between chunks, so micro-batch
    // boundaries and watermark advances are reproducible):
    //
    // dedupStateful's injected duplicates (the %10 slice re-sent one
    // chunk later) are removed either as duplicates (state for the
    // original is retained at least the 30-min watermark delay, and a
    // non-late dup implies the original's state is still live) or as
    // late rows (ts below watermark) — dropped on both paths, so the
    // final Complete-mode counts equal exact per-type counts.
    "stream_dedup_stateful" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // statefulCount emits cumulative per-user state every batch (Update
    // mode); the read-back takes max over batches, so the final rows
    // equal the batch aggregate regardless of chunking. last_seen_us is
    // µs-of-epoch on both sides (state keeps getTime*1000 + sub-ms µs).
    "stream_stateful_count" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(max(epoch_us(ts)) AS BIGINT) AS last_seen_us
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // watermarkLate replayed in SQL: on-time rows (event_id %40 ≠ 0)
    // are never late — event_id is time-ordered, so every chunk-k row
    // outruns the batch-k watermark (max ts through chunk k−1, −10 min).
    // Moved rows (%40 = 0, shifted two chunks later, capped into the
    // first flush chunk 4) arrive at batch base+2: base ≤ 1 rows are
    // ~7.5 event-days stale — always dropped; base ∈ {2,3} rows land in
    // batch 4, whose watermark is (max ts over everything that arrived
    // through batch 3, i.e. all rows except the %40-moved slice of
    // chunks ≥ 2) − 10 min — kept iff their 1-h window end outruns it.
    // Spark drops window_end ≤ watermark; no row sits exactly on the
    // boundary at any SF (verified), so the replay is exact.
    "stream_watermark_late" ->
      """WITH p AS (SELECT CAST(ceil(count(*)/4.0) AS BIGINT) per FROM events),
        |wm AS (SELECT max(ts) - INTERVAL 10 MINUTE w FROM events, p
        |       WHERE NOT (event_id % 40 = 0 AND event_id >= 2*per)),
        |keep AS (SELECT e.* FROM events e, p, wm
        |         WHERE event_id % 40 <> 0
        |            OR (CAST(floor(event_id / per) AS BIGINT) >= 2
        |                AND date_trunc('hour', ts) + INTERVAL 1 HOUR > wm.w))
        |SELECT date_trunc('hour', ts) AS ws, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM keep GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

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

    // The ListState buffer keeps the 3 LARGEST event_ids per user —
    // order-independent, so the final state equals the batch
    // rank-by-event_id picks regardless of micro-batch boundaries.
    "stream_tws_list" ->
      """WITH r AS (
        |  SELECT user_id, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY event_id DESC) AS rk,
        |         COUNT(*) OVER (PARTITION BY user_id) AS n_seen
        |  FROM events)
        |SELECT user_id, CAST(n_seen AS BIGINT) AS n_seen,
        |       MAX(CASE WHEN rk = 1 THEN event_id END) AS id1,
        |       MAX(CASE WHEN rk = 1 THEN value END) AS v1,
        |       MAX(CASE WHEN rk = 2 THEN event_id END) AS id2,
        |       MAX(CASE WHEN rk = 2 THEN value END) AS v2,
        |       MAX(CASE WHEN rk = 3 THEN event_id END) AS id3,
        |       MAX(CASE WHEN rk = 3 THEN value END) AS v3
        |FROM r WHERE rk <= 3
        |GROUP BY user_id, n_seen ORDER BY user_id""".stripMargin,

    // Custom event-time sessionization (transformWithState + timers):
    // the in-order replay plus the terminal flush chunk closes EVERY
    // session exactly once (in-fold when the next event exceeds the
    // gap, by watermark timer when the user goes idle), so the session
    // table equals batch gaps-islands sessionization with the same
    // strict > 1-day gap. Ties in ts are ordered by event_id in both
    // the processor's intra-batch sort and the oracle's windows.
    "stream_session_tws" ->
      """WITH d AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
        |                ORDER BY ts, event_id) > INTERVAL 1 DAY
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM d)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

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
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    // checkpoint recovery: two AvailableNow drains over one checkpoint
    // with a crash between — recovered state + the source's seen-file
    // log make the union-of-batches equal the batch aggregate exactly
    // (dropped state under-counts, re-read files double-count; both
    // would break this hash match).
    "stream_restart_recovery" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    // ingest-time dedup replayed batch-wise: the SAME deterministic
    // minhash band CTEs as dedup_minhash_lsh (one source of truth —
    // DedupQueries.minhashBandCtes), with candidates restricted to
    // corpus (doc_id % 5 < 3, the persisted index side) × incoming
    // (% 5 ≥ 3, the streamed side). The stream replay changes nothing:
    // candidate generation is stateless per micro-batch and each
    // incoming doc arrives exactly once, so the union over batches IS
    // this batch join.
    "stream_ingest_dedup" ->
      s"""WITH ${DedupQueries.minhashBandCtes},
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bd x JOIN bd y ON x.band = y.band AND x.key = y.key
         |  WHERE x.doc_id % 5 < 3 AND y.doc_id % 5 >= 3),
         |${DedupQueries.minhashVerifyCte}
         |SELECT a, b, j FROM vj WHERE j >= 0.5 ORDER BY a, b""".stripMargin
  )
}
