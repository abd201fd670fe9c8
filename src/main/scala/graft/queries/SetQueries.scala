package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** SURVEY.md §2B category G — set operations over user-id sets derived
  * from `events` (buyers vs clickers). union/intersect/except all
  * hash-partition by the full row — single shuffle each.
  */
object SetQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "set_union_all" -> ((s, d) => {
      val ev = T.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), lit("click").as("src"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), lit("purchase").as("src"))
      clicks.unionAll(buys).orderBy("src", "user_id")
    }),

    "set_union_distinct" -> ((s, d) => {
      val ev = T.events(s, d)
      val clicks = ev.filter(col("event_type") === "click").select("user_id")
      val buys = ev.filter(col("event_type") === "purchase").select("user_id")
      clicks.union(buys).distinct().orderBy("user_id")
    }),

    "set_intersect" -> ((s, d) => {
      // (user, day) grain so the overlap is non-trivial at every SF
      val ev = T.events(s, d)
      def days(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"), col("ts").cast("date").as("day"))
      days("click").intersect(days("purchase")).orderBy("user_id", "day")
    }),

    "set_except" -> ((s, d) => {
      val ev = T.events(s, d)
      def days(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"), col("ts").cast("date").as("day"))
      days("click").except(days("purchase")).orderBy("user_id", "day")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "set_union_all" ->
      """SELECT user_id, 'click' AS src FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT user_id, 'purchase' AS src FROM events WHERE event_type = 'purchase'
        |ORDER BY src, user_id""".stripMargin,

    "set_union_distinct" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,

    "set_intersect" ->
      """SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin,

    "set_except" ->
      """SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin
  )
}
