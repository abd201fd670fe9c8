package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** SURVEY.md §2B category E — window functions.
  *
  * Every window partitions by a stable key (customer / user / nation) so
  * at scale the only movement is one hash shuffle into window partitions;
  * frames then evaluate streaming within each sorted partition. Event
  * time is compared in integer microseconds (unix_micros ≡ DuckDB
  * epoch_us) to avoid float/timestamp-precision drift.
  */
object WindowQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "win_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    "win_rank_dense_ntile" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      T.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("tile"))
        .orderBy("c_nationkey", "c_custkey")
    }),

    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      T.events(s, d)
        .select(col("event_id"), col("user_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_prev_us"),
          (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))).as("gap_next_us"))
        .orderBy("event_id")
    }),

    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, d)
        .select(col("event_id"), col("user_id"),
          round(sum("value").over(w), 2).as("rsum"))
        .orderBy("event_id")
    }),

    "win_range_frame" -> ((s, d) => {
      // preceding-1h sum, range frame over integer µs epoch
      val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0)
      T.events(s, d)
        .select(col("event_id"), col("user_id"),
          round(sum("value").over(w), 2).as("hour_sum"))
        .orderBy("event_id")
    }),

    "win_linreg" -> ((s, d) => {
      // trailing least-squares slope per user — the local-trend signal
      // a metric stream feeds into drift alerts: over the last 6
      // events (5 preceding + current, full frames only), regress
      // value on the per-user sequence index. EXACT parity by
      // construction: x is an integer index, y is the 2-dp value
      // recovered into DECIMAL (the Sql.lineNet precedent), so every
      // windowed sum (Σx, Σy, Σxy, Σx², all decimal/integer) is exact
      // and associative on both engines; the single double division at
      // the end consumes identical operands. One hash shuffle into
      // user partitions; frames evaluate streaming within each sorted
      // partition.
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wf = w.rowsBetween(-5, 0)
      val e = T.events(s, d).select(col("user_id"), col("ts"),
          col("event_id"), col("value").cast("decimal(12,2)").as("y"))
        .withColumn("x", (row_number().over(w) - 1).cast("long"))
      e.select(col("user_id"), col("event_id"), col("x"),
          count(lit(1)).over(wf).as("n"),
          sum(col("x")).over(wf).as("sx"),
          sum(col("y")).over(wf).as("sy"),
          sum(col("x") * col("y")).over(wf).as("sxy"),
          sum(col("x") * col("x")).over(wf).as("sxx"))
        .filter(col("x") >= 5)
        .select(col("user_id"), col("event_id"), col("x"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 4)
            .as("slope"))
        .orderBy("user_id", "x")
    }),

    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          first_value(col("o_orderkey")).over(w).as("first_k"),
          last_value(col("o_orderkey")).over(w).as("last_k"))
        .orderBy("o_orderkey")
    }),

    "win_gaps_islands" -> ((s, d) => {
      // gaps-and-islands: longest streak of consecutive ACTIVE DAYS per
      // user. Classic rewrite: within a user's distinct-day sequence,
      // (day - row_number days) is constant across a consecutive run,
      // so the run collapses under a groupBy — one window over the
      // per-user day list (tiny after distinct), no self-join.
      val days = T.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("dy")).distinct()
      val w = Window.partitionBy("user_id").orderBy("dy")
      days.withColumn("grp", date_sub(col("dy"), row_number().over(w)))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(sum("len").as("n_days"), max("len").as("max_streak"))
        .orderBy("user_id")
    }),

    "win_attribution" -> ((s, d) => {
      // last-touch marketing attribution: each purchase credits its
      // full value to the user's most recent PRECEDING marketing touch
      // (click/view) within a 7-day lookback, else 'direct' — the
      // revenue-attribution shape every growth pipeline runs. The
      // touch carry is a frame last(_, ignoreNulls) over
      // (unbounded, -1): ONE hash shuffle into user window partitions,
      // the per-user stream evaluated in a single sorted pass, then a
      // ≤3-row channel rollup. Value micro-quantized BEFORE summation
      // (the text_perplexity integer rule); event time compared in
      // integer microseconds (unix_micros ≡ epoch_us); (us, event_id)
      // is a total order so the carried touch is engine-deterministic.
      val lookbackUs = 7L * 86400L * 1000000L
      val ev = T.events(s, d).select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"),
        expr("CAST(ROUND(value * 1e6) AS BIGINT)").as("val_micro"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type").isin("click", "view"),
        struct(col("us").as("tus"), col("event_type").as("ttype")))
      ev.withColumn("lastTouch", last(touch, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          when(col("lastTouch").isNotNull &&
              col("lastTouch.tus") >= col("us") - lookbackUs,
            col("lastTouch.ttype")).otherwise(lit("direct")).as("channel"),
          col("val_micro"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_conversions"),
          round(sum(col("val_micro")).cast("double") / 1e6, 2)
            .as("attributed_value"))
        .orderBy("channel")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "win_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "win_rank_dense_ntile" ->
      """SELECT c_nationkey, c_custkey,
        |       CAST(RANK() OVER w AS INT) AS rnk,
        |       CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        |       CAST(NTILE(4) OVER w AS INT) AS tile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,

    "win_lag_lead" ->
      """SELECT event_id, user_id,
        |       epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) AS gap_prev_us,
        |       epoch_us(LEAD(ts, 1) OVER w) - epoch_us(ts) AS gap_next_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "win_running_sum" ->
      """SELECT event_id, user_id,
        |       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS UNBOUNDED PRECEDING), 2) AS rsum
        |FROM events ORDER BY event_id""".stripMargin,

    "win_range_frame" ->
      """SELECT event_id, user_id,
        |       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |                              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS hour_sum
        |FROM events ORDER BY event_id""".stripMargin,

    "win_linreg" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(value AS DECIMAL(12,2)) AS y,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS x
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, x,
        |         COUNT(*) OVER w AS n,
        |         SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
        |         SUM(x * y) OVER w AS sxy, SUM(x * x) OVER w AS sxx
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY x
        |               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, x,
        |       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |             / CAST(n * sxx - sx * sx AS DOUBLE), 4) AS slope
        |FROM f WHERE x >= 5 ORDER BY user_id, x""".stripMargin,

    "win_first_last" ->
      """SELECT o_orderkey, o_custkey,
        |       FIRST_VALUE(o_orderkey) OVER w AS first_k,
        |       LAST_VALUE(o_orderkey) OVER w AS last_k
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "win_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dy FROM events),
        |isl AS (
        |  SELECT user_id, dy,
        |         dy - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dy) AS INT) AS grp
        |  FROM days),
        |st AS (SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
        |       CAST(MAX(len) AS BIGINT) AS max_streak
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin,

    // two IGNORE NULLS last_values carry (touch time, touch type) from
    // the SAME row (both null exactly when the row is not a touch), so
    // the pair equals the Spark side's single ignoreNulls struct carry
    "win_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
        |         CAST(ROUND(value * 1e6) AS BIGINT) AS val_micro
        |  FROM events),
        |t AS (
        |  SELECT user_id, us, event_type, val_micro,
        |         LAST_VALUE(CASE WHEN event_type IN ('click','view') THEN us END IGNORE NULLS)
        |           OVER w AS tus,
        |         LAST_VALUE(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
        |           OVER w AS ttype
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (
        |  SELECT CASE WHEN tus IS NOT NULL AND tus >= us - 604800000000
        |              THEN ttype ELSE 'direct' END AS channel,
        |         val_micro
        |  FROM t WHERE event_type = 'purchase')
        |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |       ROUND(CAST(SUM(val_micro) AS DOUBLE) / 1e6, 2) AS attributed_value
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
