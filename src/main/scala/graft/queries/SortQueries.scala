package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** SURVEY.md §2B category F — global sort / top-k / pagination.
  *
  * `orderBy` is a range-partitioned global sort (sampled boundaries);
  * `orderBy.limit` collapses to TakeOrderedAndProject (per-partition
  * top-k + merge — no full sort, the right plan at 100 TB).
  */
object SortQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "sort_multikey" -> ((s, d) => {
      T.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderdate").asc, col("o_orderkey"))
    }),

    "topk_limit" -> ((s, d) => {
      // r18: measured and left alone. The single-row-group scan makes
      // TakeOrdered a one-task pass (sf1: 6 M rows in one 4.2 s task),
      // but spreading was WORSE — the round-robin exchange serialized
      // 104 MB from the same single scan task (9.2 s) while the work it
      // parallelized (one expr + a top-100 heap) is cheaper than the
      // serialization. Profiled both at sf1 (plans/r18 note); the
      // 1-task decode is the fixture layout's irreducible floor here.
      T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr(graft.Sql.lineNet).as("net"))
        .orderBy(col("net").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    "limit_offset" -> ((s, d) => {
      // page 3 (20/page) of customers by key
      T.customer(s, d)
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .offset(40)
        .limit(20)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "sort_multikey" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey""".stripMargin,

    "topk_limit" ->
      s"""SELECT l_orderkey, l_linenumber,
        |       ${graft.Sql.lineNet} AS net
        |FROM lineitem
        |ORDER BY net DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "limit_offset" ->
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey LIMIT 20 OFFSET 40""".stripMargin
  )
}
