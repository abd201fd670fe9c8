package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}
import graft.ops.SkewJoin

/** Scale-technique operators: salted skew join and bucketed co-located
  * join. Both are declared with ordinary SQL oracles — the TECHNIQUE
  * changes the physical plan, never the result.
  */
object ScaleQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "join_skew_salted" -> ((s, d) => {
      // salted lineitem ⋈ orders: the salt splits each order key's line
      // items across 8 sub-keys, the orders side replicates 8×. Result
      // must equal the plain join (oracle), aggregated per status.
      SkewJoin.saltedEquiJoin(
        probe = T.lineitem(s, d), build = T.orders(s, d),
        probeKey = "l_orderkey", buildKey = "o_orderkey", salts = 8,
        probeSpread = Seq("l_orderkey", "l_linenumber"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("o_orderstatus")
    }),

    "join_bloom_pruned" -> ((s, d) => {
      // Bloom-pruned join: the probe side (lineitem) is pre-filtered by
      // a ~100 KB Bloom filter of the SELECTIVE build side's keys
      // before the join shuffle — at 100 TB this drops ~all
      // non-matching probe rows at the scan, shipping a filter instead
      // of shuffling the rows it would discard. False positives are
      // removed by the join itself, so the RESULT equals the plain
      // join — which is the oracle (same contract as join_skew_salted:
      // the technique changes the plan, never the answer). Spark's AQE
      // runtime filters apply this pattern automatically in some plans;
      // here it is explicit and composable (graft_bloom_agg ships as a
      // scalar-subquery constant).
      graft.GraftFunctions.register(s)
      T.orders(s, d).filter(col("o_totalprice") > 400000)
        .createOrReplaceTempView("bp_orders")
      T.lineitem(s, d).createOrReplaceTempView("bp_lineitem")
      s.sql("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
              |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
              |FROM (SELECT l_orderkey, l_quantity FROM bp_lineitem
              |      WHERE graft_might_contain(
              |        (SELECT graft_bloom_agg(o_orderkey, CAST(100000 AS LONG),
              |                                CAST(800000 AS LONG)) FROM bp_orders),
              |        l_orderkey)) l
              |JOIN bp_orders o ON l.l_orderkey = o.o_orderkey
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    "join_bucketed_colocated" -> ((s, d) => {
      // bucket both fact tables by the join key: the join then reads
      // co-located buckets with NO shuffle exchange on either side —
      // the physical layout a 100 TB fact⋈fact join needs.
      s.sql("CREATE DATABASE IF NOT EXISTS graft_buckets")
      // a fresh session's metastore doesn't know tables left on disk by
      // a previous run — drop AND remove the location before writing.
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      Seq("orders_b", "lineitem_b").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS graft_buckets.$t")
        val loc = java.nio.file.Paths.get(wh, "graft_buckets.db", t)
        if (java.nio.file.Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }
      // bucket only the columns the downstream join/aggregate reads: a
      // real bucketed fact layout prunes at WRITE time too — and the
      // demo's cost is the two writes, which round 3 measured inflating
      // 4.9→12.1 s when the full-width tables hit a contended disk.
      T.orders(s, d).select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_buckets.orders_b")
      T.lineitem(s, d).select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_buckets.lineitem_b")
      s.table("graft_buckets.lineitem_b")
        .join(s.table("graft_buckets.orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "join_skew_salted" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "join_bucketed_colocated" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(l_extendedprice), 2) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the PLAIN join — the bloom prune must not change the answer
    "join_bloom_pruned" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
        |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
