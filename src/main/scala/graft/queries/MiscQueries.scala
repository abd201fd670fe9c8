package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** Breadth extensions: exact percentiles, ordered collect, distribution
  * window functions, bitwise ops, and a partitioned-parquet sink with
  * partition-pruned readback (the layout a 100 TB table actually uses —
  * the pruning filter must hit PartitionFilters, not row filters).
  */
object MiscQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "agg_percentiles" -> ((s, d) => {
      T.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"))
        .orderBy("o_orderstatus")
    }),

    "agg_collect_ordered" -> ((s, d) => {
      // deterministic list aggregation: collect_list is order-unstable
      // by contract, so sort before joining into the output string.
      T.customer(s, d)
        .groupBy("c_nationkey")
        .agg(
          array_join(slice(sort_array(collect_list(col("c_name"))), 1, 5), ",").as("first5"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    }),

    // TEST-only (no oracle): approx_percentile is a KLL/GK-style sketch —
    // the 100 TB path where exact percentile's full sort is not viable.
    // SemanticsSpec pins it to ≤1% rank error vs the exact quantile.
    "agg_approx_quantile" -> ((s, d) => {
      T.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          expr("percentile_approx(o_totalprice, array(0.5, 0.9, 0.99), 10000)").as("q"))
        .select(col("o_orderstatus"),
          round(element_at(col("q"), 1), 2).as("p50"),
          round(element_at(col("q"), 2), 2).as("p90"),
          round(element_at(col("q"), 3), 2).as("p99"))
        .orderBy("o_orderstatus")
    }),

    "win_cume_pctrank" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(cume_dist().over(w), 6).as("cd"),
          round(percent_rank().over(w), 6).as("pr"))
        .orderBy("o_orderkey")
    }),

    "fn_bitwise" -> ((s, d) => {
      T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey").bitwiseAND(col("l_partkey"))).as("b_and"),
          (col("l_orderkey").bitwiseOR(col("l_linenumber"))).as("b_or"),
          (col("l_orderkey").bitwiseXOR(col("l_suppkey"))).as("b_xor"),
          shiftleft(col("l_linenumber").cast("long"), 3).as("b_shl"),
          shiftright(col("l_orderkey"), 2).as("b_shr"))
        // b_and/b_xor break the non-unique (orderkey, linenumber) ties;
        // every other output is a function of the sort keys
        .orderBy("l_orderkey", "l_linenumber", "b_and", "b_xor")
    }),

    "join_dpp_pruned" -> ((s, d) => {
      // DYNAMIC partition pruning — the runtime half of what
      // sink_partitioned_pruning exercises statically. The fact side is
      // hive-partitioned by event_type; the dim side is an aggregate +
      // limit (top-2 types by rounded total value), which NO static rule
      // can fold into the fact scan — at execution the broadcast dim's
      // keys are injected into the scan's PartitionFilters
      // (DynamicPruningExpression, pinned in PlanSpec) and 3 of 5
      // partition directories are never read. At 100 TB this is the
      // fact-dim join shape: the 60%+ of the fact you don't join is
      // skipped at the source. Result == the plain join (the oracle).
      // layout write is setup (the read-side DPP shape is the point) —
      // materialized once per (sfDir, JVM), reused across invocations
      val tmp = graft.Tmp.cachedLayout("dpp", d) { p =>
        T.events(s, d).write.mode(SaveMode.Overwrite)
          .partitionBy("event_type").parquet(p)
      }
      // the tv > 0 filter is semantically inert (event values are
      // positive) but load-bearing for the plan: Spark's PartitionPruning
      // rule only injects DPP when the dim side carries a
      // likely-selective predicate — aggregate+limit alone doesn't count
      val dim = T.events(s, d)
        .groupBy("event_type").agg(round(sum("value"), 2).as("tv"))
        .filter(col("tv") > 0)
        .orderBy(col("tv").desc, col("event_type"))
        .limit(2)
        .select("event_type")
      s.read.parquet(tmp)
        .join(broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("event_type")
    }),

    "sink_partitioned_pruning" -> ((s, d) => {
      // hive-style partition layout + pruned readback: the status filter
      // prunes directories (PartitionFilters), never touching other
      // partitions' row groups. Unlike join_dpp_pruned, the SINK is part
      // of the declared semantics here, so each invocation times
      // write+read by design (no cachedLayout).
      val tmp = graft.Tmp.dir("part").toString
      T.orders(s, d).write.mode(SaveMode.Overwrite)
        .partitionBy("o_orderstatus").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "agg_percentiles" ->
      """SELECT o_orderstatus,
        |       ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |       ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |       ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "agg_collect_ordered" ->
      """SELECT c_nationkey,
        |       array_to_string(list_sort(list(c_name))[1:5], ',') AS first5,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "win_cume_pctrank" ->
      """SELECT o_orderkey, o_orderstatus,
        |       ROUND(CUME_DIST() OVER w, 6) AS cd,
        |       ROUND(PERCENT_RANK() OVER w, 6) AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_orderkey & l_partkey AS b_and,
        |       l_orderkey | CAST(l_linenumber AS BIGINT) AS b_or,
        |       xor(l_orderkey, l_suppkey) AS b_xor,
        |       CAST(l_linenumber AS BIGINT) << 3 AS b_shl,
        |       l_orderkey >> 2 AS b_shr
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, b_and, b_xor""".stripMargin,

    "sink_partitioned_pruning" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "join_dpp_pruned" ->
      """WITH top2 AS (
        |  SELECT event_type FROM events GROUP BY 1
        |  HAVING ROUND(SUM(value), 2) > 0
        |  ORDER BY ROUND(SUM(value), 2) DESC, event_type LIMIT 2)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(value), 2) AS total
        |FROM events JOIN top2 USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
