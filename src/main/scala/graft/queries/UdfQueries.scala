package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}
import graft.udaf.GeometricMean

/** SURVEY.md §2B category K — user-defined function surface.
  *
  * `udf_scalar` demonstrates the escape hatch (and its cost: a Scala UDF
  * is Catalyst-opaque — no pushdown through it, no codegen fusion; the
  * same logic is expressible as built-ins, which the oracle shows).
  * `udaf_aggregator` is a typed Aggregator registered with udaf() —
  * partial-aggregating like a built-in. `udtf_generator` is the
  * generator (UDTF) shape via posexplode over a tokenized column.
  */
object UdfQueries extends QueryPack {

  /** Parse the leading digit of 'N-NAME' order priorities. */
  private val priorityRank = udf((p: String) => p.split("-")(0).toInt)

  val queries: Map[String, QueryFn] = Map(
    "udf_scalar" -> ((s, d) => {
      T.orders(s, d)
        .withColumn("pr", priorityRank(col("o_orderpriority")))
        .groupBy("pr")
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
        .orderBy("pr")
    }),

    "udaf_aggregator" -> ((s, d) => {
      val gm = udaf(GeometricMean)
      T.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(round(gm(col("o_totalprice")), 4).as("geo_mean"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    "udtf_generator" -> ((s, d) => {
      // generator (UDTF) shape: one row per (part, word position)
      T.part(s, d)
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .withColumnRenamed("pos", "pos")
        .withColumnRenamed("col", "word")
        .orderBy("p_partkey", "pos")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS pr,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(AVG(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY pr""".stripMargin,

    // geometric mean == exp(avg(ln x))
    "udaf_aggregator" ->
      """SELECT o_orderstatus,
        |       ROUND(EXP(AVG(LN(o_totalprice))), 4) AS geo_mean,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "udtf_generator" ->
      """SELECT p_partkey, pos, word FROM (
        |  SELECT p_partkey,
        |         UNNEST(list_transform(range(1, len(w) + 1),
        |                               i -> {'pos': CAST(i - 1 AS INT), 'tok': w[i]}), recursive := true)
        |  FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)) t(p_partkey, pos, word)
        |ORDER BY p_partkey, pos""".stripMargin
  )
}
