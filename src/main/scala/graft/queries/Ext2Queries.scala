package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryPack, Tables => T}

/** Round-1 breadth extensions, batch 2:
  *
  *   - bag-semantics set ops (INTERSECT ALL / EXCEPT ALL — multiplicity
  *     preserved, the form dedup pipelines actually need when counting
  *     repeated observations)
  *   - lateral join (correlated top-N per outer row; Catalyst plans a
  *     DomainJoin → the scalable decorrelated form)
  *   - regex functions (extract_all / replace / rlike)
  *   - ANSI-safe try_* arithmetic (ANSI mode is on engine-wide: errors
  *     become NULLs only where explicitly requested)
  *   - nth_value window
  *   - unpivot / melt (wide→long, the layout normalizer for feature
  *     tables)
  *   - histogram via shared floor-arithmetic bucketing (width_bucket
  *     isn't in DuckDB 1.0, so the bucket expr is shared verbatim)
  */
object Ext2Queries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "set_intersect_all" -> ((s, d) => {
      val ev = T.events(s, d).select(col("user_id"),
        date_trunc("day", col("ts")).as("day"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click").drop("event_type")
      val buys = ev.filter(col("event_type") === "purchase").drop("event_type")
      clicks.intersectAll(buys).orderBy("user_id", "day")
    }),

    "set_except_all" -> ((s, d) => {
      val ev = T.events(s, d).select(col("user_id"),
        date_trunc("day", col("ts")).as("day"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click").drop("event_type")
      val buys = ev.filter(col("event_type") === "purchase").drop("event_type")
      clicks.exceptAll(buys).orderBy("user_id", "day")
    }),

    "join_lateral_topn" -> ((s, d) => {
      // correlated top-2 orders per customer — LATERAL keeps the per-row
      // limit inside the subquery; Catalyst decorrelates it
      T.customer(s, d).createOrReplaceTempView("ext2_customer")
      T.orders(s, d).createOrReplaceTempView("ext2_orders")
      s.sql("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
              |FROM ext2_customer c,
              |LATERAL (SELECT o_orderkey, o_totalprice FROM ext2_orders
              |         WHERE o_custkey = c.c_custkey
              |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
              |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin)
    }),

    "fn_regex" -> ((s, d) => {
      // array output flattened to a space-joined string: the driver's
      // comparator hashes scalar cells only (round-1 FAIL was its pandas
      // factorizer dying on array columns), and ' '-joining is lossless
      // here because the extracted words are [a-z]+ (no spaces).
      T.part(s, d)
        .select(col("p_partkey"),
          array_join(expr("regexp_extract_all(p_name, '[a-z]+', 0)"), " ").as("words"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          col("p_name").rlike("^[a-f]").as("starts_af"))
        .orderBy("p_partkey")
    }),

    "fn_try_ansi" -> ((s, d) => {
      T.orders(s, d)
        .select(col("o_orderkey"),
          // divisor ∈ {NULL,1,2} → quotient has ≤3 decimal digits, so a
          // 4-dp round never sits on a half-tie (2-dp did: x.xx5 / 2)
          expr("round(try_divide(o_totalprice, o_custkey % 3), 4)").as("td"),
          expr("try_cast(CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey AS STRING) ELSE o_orderpriority END AS BIGINT)").as("tc"))
        .orderBy("o_orderkey")
    }),

    "win_nth_value" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "fn_unpivot" -> ((s, d) => {
      T.lineitem(s, d)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "v")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // corpus — v completes the total order
        .orderBy("l_orderkey", "l_linenumber", "measure", "v")
    }),

    "fn_date_extra" -> ((s, d) => {
      T.orders(s, d)
        .select(col("o_orderkey"),
          last_day(col("o_orderdate")).as("ld"),
          weekofyear(col("o_orderdate")).as("w"),
          dayofyear(col("o_orderdate")).as("doy"),
          unix_timestamp(col("o_orderdate")).as("es"))
        .orderBy("o_orderkey")
    }),

    "fn_array_setops" -> ((s, d) => {
      // set-semantics array ops; results sorted so element order is
      // engine-independent (Spark keeps first-occurrence order, DuckDB's
      // list_distinct doesn't guarantee one), then space-joined to a
      // scalar string because the driver comparator can't hash array
      // cells (round-1 FAIL; tokens contain no spaces, so lossless).
      val probe = array(lit("the"), lit("data"))
      T.documents(s, d)
        .withColumn("head5", slice(split(col("text"), " "), 1, 5))
        .select(col("doc_id"),
          array_join(sort_array(array_union(col("head5"), probe)), " ").as("u"),
          array_join(sort_array(array_intersect(col("head5"), probe)), " ").as("i"),
          array_join(sort_array(array_except(col("head5"), probe)), " ").as("e"))
        .orderBy("doc_id")
    }),

    "agg_histogram" -> ((s, d) => {
      T.orders(s, d)
        .groupBy(expr("CAST(FLOOR(o_totalprice / 60000) AS BIGINT)").as("bucket"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE)").as("lo"),
          expr("CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE)").as("hi"))
        .orderBy("bucket")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "set_intersect_all" ->
      """SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'click'
        |INTERSECT ALL
        |SELECT user_id, date_trunc('day', ts) FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin,

    "set_except_all" ->
      """SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'click'
        |EXCEPT ALL
        |SELECT user_id, date_trunc('day', ts) FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin,

    "join_lateral_topn" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin,

    "fn_regex" ->
      """SELECT p_partkey,
        |       array_to_string(regexp_extract_all(p_name, '[a-z]+'), ' ') AS words,
        |       regexp_replace(p_name, ' ', '_', 'g') AS snake,
        |       regexp_matches(p_name, '^[a-f]') AS starts_af
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_try_ansi" ->
      """SELECT o_orderkey,
        |       round(o_totalprice / NULLIF(o_custkey % 3, 0), 4) AS td,
        |       TRY_CAST(CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey AS VARCHAR)
        |                     ELSE o_orderpriority END AS BIGINT) AS tc
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "win_nth_value" ->
      """SELECT o_custkey, o_orderkey,
        |       nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "fn_unpivot" ->
      """SELECT l_orderkey, l_linenumber, k.measure,
        |       CASE k.measure WHEN 'l_quantity' THEN l_quantity
        |                      WHEN 'l_discount' THEN l_discount
        |                      ELSE l_tax END AS v
        |FROM lineitem
        |CROSS JOIN (SELECT unnest(['l_quantity','l_discount','l_tax']) AS measure) k
        |ORDER BY l_orderkey, l_linenumber, k.measure, v""".stripMargin,

    "fn_date_extra" ->
      """SELECT o_orderkey,
        |       last_day(o_orderdate) AS ld,
        |       CAST(weekofyear(o_orderdate) AS INT) AS w,
        |       CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS es
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_array_setops" ->
      """SELECT doc_id,
        |       COALESCE(array_to_string(list_sort(list_distinct(list_concat(string_split(text,' ')[1:5], ['the','data']))), ' '), '') AS u,
        |       COALESCE(array_to_string(list_sort(list_distinct(list_filter(string_split(text,' ')[1:5], x -> list_contains(['the','data'], x)))), ' '), '') AS i,
        |       COALESCE(array_to_string(list_sort(list_distinct(list_filter(string_split(text,' ')[1:5], x -> NOT list_contains(['the','data'], x)))), ' '), '') AS e
        |FROM documents ORDER BY doc_id""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 60000) AS BIGINT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE) AS lo,
        |       CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin
  )
}
