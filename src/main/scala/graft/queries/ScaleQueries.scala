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
      // r17: repartition(8, key) before each bucketed write — the write
      // uses the SAME murmur3 hash as the bucket spec, so every task
      // holds exactly one bucket (still 8 files, one per bucket) but the
      // encode+sort+write runs 8-way instead of on the single-row-group
      // scan's one task (measured: the two writes were 2.2 s 1-task jobs
      // each). At scale the pre-write repartition is exactly the
      // clustering shuffle a bucketed fact write performs anyway.
      T.orders(s, d).select("o_orderkey", "o_orderpriority")
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_buckets.orders_b")
      T.lineitem(s, d).select("l_orderkey", "l_extendedprice")
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_buckets.lineitem_b")
      s.table("graft_buckets.lineitem_b")
        .join(s.table("graft_buckets.orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        // DECIMAL cents, one final double conversion: a raw double SUM
        // is shuffle-order-dependent and lost its last cent digit at
        // sf1 (6.4e10 magnitude over 6 M addends — the first 2^53-class
        // fluke the sf1 gate caught); the exact decimal sum is
        // order-invariant in both engines (sink_zorder device).
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("total"))
        .orderBy("o_orderpriority")
    }),

    "sink_zorder_layout" -> ((s, d) => {
      // Z-order clustered sink + 2-dim data-skipping readback: lineitem
      // written clustered on the Morton key of (l_orderkey, l_partkey)
      // (ops/ZOrder — 8-bit min/max codes, bit interleave, range-
      // partitioned sorted write; both dims are DENSE at every SF, so
      // the code grid fills), then a box predicate on BOTH dims — an
      // order-era slice × a part range, the two-axis probe an ingest
      // audit runs — reads it back. Every file's stats envelope is a
      // tight box in both dimensions, so parquet row-group pruning
      // skips most of the table — what a linear sort can only do for
      // one dim (SemanticsSpec measures the z-vs-sorted scan-row
      // asymmetry). Like the other layout keys, the technique changes
      // the files read, never the answer: the oracle is the same box
      // aggregate on the raw table. Box bounds are integer arithmetic
      // on the key ranges, shared verbatim with the oracle — ALIGNED
      // to the 8-bit code grid (codes [64,95] on each dim, the second
      // octant: x in [mn + ceil(64·rng/255), mn + ceil(96·rng/255)),
      // exactly how a platform aligns scan predicates to its declared
      // clustering resolution; a grid-straddling box would drag in
      // every boundary square's files. Only the 1-row bounds aggregate
      // crosses to the driver (the filter needs literal bounds to
      // reach the parquet scan as PushedFilters).
      val li = T.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      val tmp = graft.Tmp.dir("zorder").toString
      graft.ops.ZOrder.writeClustered(li, "l_orderkey", "l_partkey", 16, tmp)
      val r = li.agg(min("l_orderkey"), max("l_orderkey"),
        min("l_partkey"), max("l_partkey")).head()
      def lv(i: Int) = r.getAs[Number](i).longValue
      val (omn, omx, pmn, pmx) = (lv(0), lv(1), lv(2), lv(3))
      val (oLo, oHi) = (omn + (64 * (omx - omn) + 254) / 255,
        omn + (96 * (omx - omn) + 254) / 255 - 1)
      val (pLo, pHi) = (pmn + (64 * (pmx - pmn) + 254) / 255,
        pmn + (96 * (pmx - pmn) + 254) / 255 - 1)
      s.read.parquet(tmp)
        .filter(col("l_orderkey").between(oLo, oHi) &&
          col("l_partkey").between(pLo, pHi))
        .groupBy(pmod(col("l_partkey"), lit(10)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum("l_quantity").cast("long").as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double").as("total"))
        .orderBy("bucket")
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
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the raw-table box aggregate — the z-order layout must not change
    // the answer, only the files a scan touches
    "sink_zorder_layout" ->
      """WITH b AS (SELECT min(l_orderkey) omn, max(l_orderkey) omx,
        |                  min(l_partkey) pmn, max(l_partkey) pmx
        |           FROM lineitem)
        |SELECT CAST(l_partkey % 10 AS INT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        |FROM lineitem, b
        |WHERE l_orderkey BETWEEN omn + (64 * (omx - omn) + 254) // 255
        |                     AND omn + (96 * (omx - omn) + 254) // 255 - 1
        |  AND l_partkey BETWEEN pmn + (64 * (pmx - pmn) + 254) // 255
        |                    AND pmn + (96 * (pmx - pmn) + 254) // 255 - 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the PLAIN join — the bloom prune must not change the answer
    "join_bloom_pruned" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
        |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
