package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** SURVEY.md §2B category C — joins over the TPC-H-ish star schema.
  *
  * Scale notes (100 TB): dimension tables (region/nation/customer at
  * low SF) are explicitly `broadcast()`-hinted so the big fact side never
  * shuffles for them; the lineitem⋈orders join shuffles on the join key
  * and is left to the planner + AQE (sort-merge vs shuffled-hash, skew
  * split). No driver-side collection anywhere.
  */
object JoinQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "join_5way_flagship" -> ((s, d) => {
      // TPC-H Q5-shaped: revenue by nation for ASIA customers.
      // customer→orders→lineitem fact chain; nation/region broadcast.
      val rev = T.lineitem(s, d)
        .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      rev.groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("n_name"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "join_5way_flagship" ->
      """SELECT n_name,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin
  )
}
