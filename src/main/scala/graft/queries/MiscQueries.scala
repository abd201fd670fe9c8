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

    "sink_partitioned_pruning" -> ((s, d) => {
      // hive-style partition layout + pruned readback: the status filter
      // prunes directories (PartitionFilters), never touching other
      // partitions' row groups.
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
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
