package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** SURVEY.md §2B category J — event-time windowing.
  *
  * These three rows use Spark's window()/session_window() operators whose
  * batch and streaming semantics are identical, so they are declared as
  * batch queries with SQL oracles; the genuinely trigger-dependent rows
  * (watermark late-drop, streaming dedup, stream–stream join, arbitrary
  * state) live in graft.streaming, replayed through the production
  * parquet FILE source with ScalaTest semantic coverage (the
  * non-oracle-able ones TEST-only per the harness contract).
  *
  * Scale: windowed aggregation shuffles once on (window, key); session
  * windows shuffle on user and merge sorted runs — both streaming-state
  * compatible (RocksDB state store at production scale).
  */
object StreamQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "stream_tumbling" -> ((s, d) => {
      T.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sv"))
        .orderBy("ws", "event_type")
    }),

    "stream_sliding" -> ((s, d) => {
      T.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"))
        .orderBy("ws", "event_type")
    }),

    "stream_session" -> ((s, d) => {
      T.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
        .select(col("user_id"), col("w.start").as("sess_start"),
          col("w.end").as("sess_end"), col("n"), col("sv"))
        .orderBy("user_id", "sess_start")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    // each event belongs to the two 1h windows starting at the two
    // preceding 30-min grid points (epoch-aligned, same as Spark window())
    "stream_sliding" ->
      """WITH g AS (
        |  SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 1800000000) AS ws, event_type FROM events
        |  UNION ALL
        |  SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 1800000000 - 1800000000) AS ws, event_type FROM events)
        |SELECT ws, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM g GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,

    // gaps-and-islands with a 30-min gap; session end = last event + gap
    "stream_session" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN LAG(ts) OVER w IS NULL
        |                OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts, value,
        |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, MIN(ts) AS sess_start,
        |       MAX(ts) + INTERVAL 30 MINUTES AS sess_end,
        |       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS sv
        |FROM y GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin
  )
}
