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
    "stream_stateful_count" -> ((s, d) => StreamingJobs.statefulCount(s, d))
  )

  val oracleSql: Map[String, String] = Map.empty
}
