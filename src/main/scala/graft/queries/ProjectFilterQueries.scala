package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** SURVEY.md §2B category B — projection / filter / null semantics.
  *
  * All pure narrow transformations: no shuffle except the final sort.
  * Filters and projections are plain Catalyst expressions, so at scale
  * they push into the parquet scan (PushedFilters / ReadSchema pruning).
  */
object ProjectFilterQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "project_exprs" -> ((s, d) => {
      T.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          expr(graft.Sql.lineNet).as("net"),
          expr(graft.Sql.qtyTax).as("qty_tax"))
        // net/qty_tax break the non-unique (orderkey, linenumber) ties
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("net"), col("qty_tax"))
    }),

    "filter_pred" -> ((s, d) => {
      T.orders(s, d)
        .filter(col("o_totalprice").between(50000, 150000) &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_orderstatus") =!= "P" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderpriority").like("%-%"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    }),

    "filter_null_semantics" -> ((s, d) => {
      // NULLIF introduces NULLs; count both branches of three-valued logic.
      T.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          sum(when(expr("nullif(o_orderstatus, 'P')").isNull, 1).otherwise(0)).as("n_null"),
          sum(when(expr("nullif(o_orderstatus, 'P')").isNotNull, 1).otherwise(0)).as("n_not_null"))
        .orderBy("o_orderstatus")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "project_exprs" ->
      s"""SELECT l_orderkey, l_linenumber,
        |       ${graft.Sql.lineNet} AS net,
        |       ${graft.Sql.qtyTax} AS qty_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, net, qty_tax""".stripMargin,

    "filter_pred" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_totalprice BETWEEN 50000 AND 150000
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_orderstatus <> 'P'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderpriority LIKE '%-%'
        |ORDER BY o_orderkey""".stripMargin,

    "filter_null_semantics" ->
      """SELECT o_orderstatus,
        |       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
