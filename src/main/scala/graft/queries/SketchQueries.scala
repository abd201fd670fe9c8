package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** Sketch operators beyond HLL/quantile (SURVEY.md §2B cat D, TEST-only
  * like the other sketches — engine sketch internals differ by design,
  * so these are property-tested in ScalaTest, not DuckDB-oracled):
  *
  *   - Bloom filter: the join-pruning primitive at 100 TB (ship a
  *     ~100 KB filter of the build side's keys to the probe side's scan
  *     instead of shuffling non-matching rows). Spark's own runtime
  *     row-group filtering uses this exact aggregate.
  *   - approx_top_k: heavy hitters without an exact full groupBy — the
  *     corpus-vocabulary primitive when distinct counts explode.
  */
object SketchQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    // customers probed against a Bloom filter of order-holding keys;
    // output = flag counts (TEST asserts zero false negatives + low FPR)
    "agg_bloom_filter" -> ((s, d) => {
      // catalyst's internal Bloom pair, surfaced as graft_bloom_agg /
      // graft_might_contain via GraftExtensions (GraftExtensions.scala).
      // might_contain demands its filter as a constant/scalar subquery
      // (so the plan ships one ~100 KB value, never a joined column) —
      // exactly the shape a runtime join-pruning filter takes.
      graft.GraftFunctions.register(s)
      T.orders(s, d).createOrReplaceTempView("sk_orders")
      T.customer(s, d).createOrReplaceTempView("sk_customer")
      s.sql("""SELECT maybe, CAST(COUNT(*) AS BIGINT) AS n FROM (
              |  SELECT graft_might_contain(
              |    (SELECT graft_bloom_agg(o_custkey, CAST(50000 AS LONG),
              |                            CAST(400000 AS LONG)) FROM sk_orders),
              |    c_custkey) AS maybe
              |  FROM sk_customer)
              |GROUP BY maybe ORDER BY maybe""".stripMargin)
    }),

    // sketched top-10 document tokens (estimate, not exact groupBy)
    "agg_approx_topk" -> ((s, d) => {
      T.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .agg(expr("approx_top_k(w, 10, 1000)").as("tk"))
        .select(explode(col("tk")).as("t"))
        .select(col("t.item").as("w"), col("t.count").as("n"))
        .orderBy(col("n").desc, col("w"))
    })
  )

  val oracleSql: Map[String, String] = Map.empty
}
