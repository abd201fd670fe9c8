package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** SURVEY.md §2B category D — aggregations.
  *
  * All hash aggregates with automatic partial (map-side) + final phases —
  * Spark's built-in equivalent of the reference's in-mapper combining
  * ([IPDPS17] §IV.C). ROLLUP/CUBE/GROUPING SETS expand then hash-agg;
  * the HLL sketch row is TEST-only (engine sketches differ by design).
  * Grouping keys that can be NULL are coalesced to the sentinel 'ALL'
  * so result ordering needs no cross-engine NULLS FIRST/LAST alignment.
  */
/** agg_spatial_octree refinement parameters, shared by the Spark loop
  * and the generated DuckDB oracle. */
object OctreeParams {
  /** octants with more points than this split (until MaxDepth). */
  val SplitThreshold = 32
  /** depth bound: 2^3d octants max; the loop unrolls to a fixed plan. */
  val MaxDepth = 4
}

object AggQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "agg_group_pricing" -> ((s, d) => {
      // TPC-H Q1-shaped pricing summary.
      T.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          expr(graft.Sql.sumNet).as("sum_disc"),
          expr(graft.Sql.sumCharge).as("sum_charge"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "agg_global" -> ((s, d) => {
      T.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        round(min("l_extendedprice"), 2).as("min_price"),
        round(max("l_extendedprice"), 2).as("max_price"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(avg("l_extendedprice"), 2).as("avg_price"))
    }),

    "agg_distinct_exact" -> ((s, d) => {
      // Two distinct groups in one agg — countDistinct(user) and
      // countDistinct(user, day) — plan via RewriteDistinctAggregates
      // as an Expand ×3 of the event stream before the shuffle (the
      // quality_profile trap: 25.6× at ×16 data). Narrow subtrees
      // instead: each distinct count is its own dedup-then-count pass
      // (map-side partial agg collapses duplicates before the
      // exchange), joined on the 5-row event_type dimension. Three
      // passes over the scan beat one 3×-expanded shuffle at any SF.
      // NULL semantics (r14 ADVICE): distinct().count() would COUNT a
      // NULL user as one value where COUNT(DISTINCT user_id) ignores
      // it — the explicit isNotNull filters keep the rewrite exactly
      // COUNT DISTINCT under any future data. The GROUP KEY
      // (event_type) is a different story: an inner join on it drops
      // a NULL-key group the single-groupBy oracle would keep — that
      // invariant (no NULL group keys in the fixtures) is pinned by
      // NullSemanticsSpec rather than papered over with <=> joins.
      val ev = T.events(s, d)
      val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      val users = ev.filter(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id")).distinct()
        .groupBy("event_type").agg(count(lit(1)).as("cd_users"))
      val userDays = ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("event_type"), col("user_id"),
          col("ts").cast("date").as("day")).distinct()
        .groupBy("event_type").agg(count(lit(1)).as("cd_user_days"))
      users.join(userDays, "event_type").join(n, "event_type")
        .select("event_type", "cd_users", "cd_user_days", "n")
        .orderBy("event_type")
    }),

    // TEST-only: HLL++ sketches are engine-specific; ScalaTest asserts
    // ≤5% relative error vs the exact distinct count instead.
    "agg_approx_hll" -> ((s, d) => {
      T.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type")
    }),

    "agg_rollup" -> ((s, d) => {
      T.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("g_status"), col("g_prio"))
        .orderBy("g_status", "g_prio", "status", "priority")
    }),

    "agg_cube" -> ((s, d) => {
      T.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"), col("g_rf"), col("g_ls"))
        .orderBy("g_rf", "g_ls", "returnflag", "linestatus")
    }),

    "agg_grouping_sets" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
          |       COALESCE(o_orderpriority, 'ALL') AS priority,
          |       COUNT(*) AS n,
          |       ROUND(SUM(o_totalprice), 2) AS total
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority""".stripMargin)
    }),

    "agg_stats" -> ((s, d) => {
      T.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          round(stddev_samp(col("o_totalprice")), 2).as("sd"),
          round(var_samp(col("o_totalprice")), 2).as("vr"),
          round(min("o_totalprice"), 2).as("mn"),
          round(max("o_totalprice"), 2).as("mx"),
          round(avg("o_totalprice"), 2).as("av"))
        .orderBy("o_orderstatus")
    }),

    "agg_spatial_octree" -> ((s, d) => {
      // ITERATIVE octree refinement (Mimir examples/octree*.cpp ⚠UNV:
      // refine until octant count ≤ threshold) — the depth loop
      // agg_spatial_bin's fixed-depth binning lacked.
      //
      // Clamped floor binning nests exactly (bin_{d+1} >> 1 == bin_d),
      // so a depth-d octant's count over ALL points equals its count
      // over the points of its hot ancestors — the points therefore
      // shuffle ONCE (explode to (depth, cell), one hash aggregate) and
      // the refine loop runs over the tiny per-cell count table:
      // leaves at depth d = cells ≤ T whose whole ancestor chain was
      // hot, via broadcast parent joins (shiftright = parent cell).
      // A naive per-level loop re-scanned the points MaxDepth times.
      import OctreeParams._
      def bin(c: org.apache.spark.sql.Column, dep: Int) =
        least(greatest(floor((c + lit(0.5)) * (1L << dep)).cast("long"), lit(0L)),
          lit((1L << dep) - 1))
      val pts = T.embeddings(s, d).select(
        (0 until 3).map(i => element_at(col("embedding"), i + 1)
          .cast("double").as(s"x$i")): _*)
      val levelStructs = (1 to MaxDepth).map(dep => struct(lit(dep).as("depth"),
        bin(col("x0"), dep).as("cx"), bin(col("x1"), dep).as("cy"),
        bin(col("x2"), dep).as("cz")))
      val counts = pts.select(explode(array(levelStructs: _*)).as("c"))
        .groupBy(col("c.depth").as("depth"), col("c.cx").as("cx"),
          col("c.cy").as("cy"), col("c.cz").as("cz"))
        .agg(count(lit(1)).as("n"))
      var hot = counts.filter(col("depth") === 1 && col("n") > SplitThreshold)
      var leaves = List(counts.filter(col("depth") === 1 && col("n") <= SplitThreshold))
      for (dep <- 2 to MaxDepth) {
        val parents = hot.select(col("cx").as("px"), col("cy").as("py"), col("cz").as("pz"))
        val cand = counts.filter(col("depth") === dep)
          .join(broadcast(parents),
            shiftright(col("cx"), 1) === col("px") &&
              shiftright(col("cy"), 1) === col("py") &&
              shiftright(col("cz"), 1) === col("pz"))
          .select("depth", "cx", "cy", "cz", "n")
        leaves ::= (if (dep == MaxDepth) cand
          else cand.filter(col("n") <= SplitThreshold))
        hot = cand.filter(col("n") > SplitThreshold)
      }
      leaves.reduce(_ unionAll _)
        .select("depth", "cx", "cy", "cz", "n")
        .orderBy("depth", "cx", "cy", "cz")
    }),

    "agg_spatial_bin" -> ((s, d) => {
      // Octree-app equivalent (SURVEY.md §2A): depth-3 grid (8 bins/dim)
      // over the first 3 embedding dims in [-0.5, 0.5] → 9-bit cell id,
      // keep dense cells. Pure arithmetic + hash aggregate: scales as a
      // single map + shuffle-by-cell, identical shape to Mimir's octree
      // density clustering.
      def bin(i: Int) = least(greatest(
        floor((element_at(col("embedding"), i).cast("double") + lit(0.5)) * 8).cast("long"),
        lit(0L)), lit(7L))
      T.embeddings(s, d)
        .select((bin(1) * 64 + bin(2) * 8 + bin(3)).as("cell"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .orderBy("cell")
    })
  )

  private val spatialBinSql = {
    def bin(i: Int) =
      s"LEAST(GREATEST(CAST(FLOOR((CAST(embedding[$i] AS DOUBLE) + 0.5) * 8) AS BIGINT), 0), 7)"
    s"""SELECT ${bin(1)} * 64 + ${bin(2)} * 8 + ${bin(3)} AS cell,
       |       CAST(COUNT(*) AS BIGINT) AS n
       |FROM embeddings
       |GROUP BY cell HAVING COUNT(*) >= 2 ORDER BY cell""".stripMargin
  }

  /** the Spark driver loop, unrolled to MaxDepth chained CTEs: level d
    * groups the points that survived every hot (n > T) ancestor. */
  private val octreeSql: String = {
    import OctreeParams._
    def b(dep: Int, dim: Int) =
      s"LEAST(GREATEST(CAST(FLOOR((CAST(embedding[$dim] AS DOUBLE) + 0.5) * ${1L << dep}) AS BIGINT), 0), ${(1L << dep) - 1})"
    val pCols = (1 to MaxDepth).flatMap(dp =>
      Seq(s"${b(dp, 1)} AS b${dp}x", s"${b(dp, 2)} AS b${dp}y", s"${b(dp, 3)} AS b${dp}z"))
      .mkString(", ")
    val sb = new StringBuilder(s"WITH p1 AS (SELECT $pCols FROM embeddings)")
    for (dp <- 1 to MaxDepth) {
      sb.append(s", c$dp AS (SELECT b${dp}x AS cx, b${dp}y AS cy, b${dp}z AS cz," +
        s" CAST(COUNT(*) AS BIGINT) AS n FROM p$dp GROUP BY 1, 2, 3)")
      if (dp < MaxDepth)
        sb.append(s", p${dp + 1} AS (SELECT p$dp.* FROM p$dp JOIN c$dp" +
          s" ON p$dp.b${dp}x = c$dp.cx AND p$dp.b${dp}y = c$dp.cy AND p$dp.b${dp}z = c$dp.cz" +
          s" WHERE c$dp.n > $SplitThreshold)")
    }
    val selects = (1 to MaxDepth).map { dp =>
      val w = if (dp < MaxDepth) s" WHERE n <= $SplitThreshold" else ""
      s"SELECT $dp AS depth, cx, cy, cz, n FROM c$dp$w"
    }.mkString(" UNION ALL ")
    sb.append(s" $selects ORDER BY depth, cx, cy, cz").toString
  }

  val oracleSql: Map[String, String] = Map(
    "agg_spatial_octree" -> octreeSql,

    "agg_group_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       ROUND(SUM(l_extendedprice), 2) AS sum_base,
        |       ${graft.Sql.sumNet} AS sum_disc,
        |       ${graft.Sql.sumCharge} AS sum_charge,
        |       ROUND(AVG(l_quantity), 2) AS avg_qty,
        |       ROUND(AVG(l_extendedprice), 2) AS avg_price,
        |       ROUND(AVG(l_discount), 4) AS avg_disc,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_global" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(MIN(l_extendedprice), 2) AS min_price,
        |       ROUND(MAX(l_extendedprice), 2) AS max_price,
        |       ROUND(SUM(l_extendedprice), 2) AS sum_price,
        |       ROUND(AVG(l_extendedprice), 2) AS avg_price
        |FROM lineitem""".stripMargin,

    "agg_distinct_exact" ->
      """SELECT event_type,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS cd_users,
        |       CAST(COUNT(DISTINCT (user_id, CAST(ts AS DATE))) AS BIGINT) AS cd_user_days,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio, status, priority""".stripMargin,

    "agg_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, returnflag, linestatus""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    "agg_stats" ->
      """SELECT o_orderstatus,
        |       ROUND(STDDEV_SAMP(o_totalprice), 2) AS sd,
        |       ROUND(VAR_SAMP(o_totalprice), 2) AS vr,
        |       ROUND(MIN(o_totalprice), 2) AS mn,
        |       ROUND(MAX(o_totalprice), 2) AS mx,
        |       ROUND(AVG(o_totalprice), 2) AS av
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "agg_spatial_bin" -> spatialBinSql
  )
}
