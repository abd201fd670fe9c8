package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** SURVEY.md §2B category C — joins over the TPC-H-ish star schema.
  *
  * Scale notes (100 TB): dimension tables (region/nation/customer at low
  * SF) are explicitly `broadcast()`-hinted so the fact side never
  * shuffles for them; fact⋈fact joins shuffle on their keys and are left
  * to the planner + AQE (sort-merge vs shuffled-hash, skew split). The
  * as-of join is a window over pruned candidates, not a custom strategy;
  * the interval self-join is bounded per-user. No driver-side loops.
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
        .agg(expr(graft.Sql.sumNet).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "join_broadcast_inner" -> ((s, d) => {
      // no explicit broadcast() hint: customer GROWS with the corpus,
      // so a pinned hint is exactly the driver-OOM path at 100 TB.
      // Catalyst's size estimate picks BroadcastHashJoin at every test
      // SF (PlanSpec pins it) and falls back to a shuffled join when
      // the dim outgrows the threshold — the correct posture is the
      // optimizer's size-aware choice, not a hardcoded hint.
      T.orders(s, d)
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    "join_shuffle_inner" -> ((s, d) => {
      // fact ⋈ fact: both sides shuffle on the order key (or AQE picks
      // broadcast at low SF) — the declared plan is key-partitioned.
      T.lineitem(s, d)
        .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
          round(col("l_extendedprice"), 2).as("price"))
        // (l_orderkey, l_linenumber) is not unique — price completes the
        // order over everything emitted, so remaining ties are identical rows
        .orderBy("l_orderkey", "l_linenumber", "price")
    }),

    "join_left_outer" -> ((s, d) => {
      // customers with zero orders kept; count(o_orderkey) skips nulls.
      T.customer(s, d)
        .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("spend"))
        .orderBy("c_custkey")
    }),

    "join_full_outer" -> ((s, d) => {
      val hv = T.customer(s, d).filter(col("c_acctbal") > 7000)
        .select(col("c_custkey"))
      val recent = T.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey")).distinct()
      hv.join(recent, col("c_custkey") === col("o_custkey"), "full")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("k"),
          col("c_custkey").isNotNull.as("has_high_bal"),
          col("o_custkey").isNotNull.as("has_recent"))
        .orderBy("k")
    }),

    "join_semi" -> ((s, d) => {
      val urgent = T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      T.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "join_anti" -> ((s, d) => {
      val big = T.orders(s, d).filter(col("o_totalprice") > 300000)
      T.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    }),

    "join_cross" -> ((s, d) => {
      T.region(s, d).crossJoin(T.nation(s, d))
        .select(col("r_regionkey"), col("n_nationkey"),
          concat_ws("-", col("r_name"), col("n_name")).as("label"))
        .orderBy("r_regionkey", "n_nationkey")
    }),

    "join_theta_range" -> ((s, d) => {
      // equi key + theta residual; aggregated so output stays bounded.
      // No broadcast() hint — part grows with the corpus; Catalyst
      // broadcasts it at test SFs on size stats and switches to a
      // shuffled hash join with the same residual when it outgrows the
      // threshold.
      T.lineitem(s, d)
        .join(T.part(s, d),
          col("l_partkey") === col("p_partkey") && col("l_quantity") > col("p_size"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("p_brand")
    }),

    "join_asof" -> ((s, d) => {
      // Most recent prior click per purchase (event-time as-of), expressed
      // as candidate-join + per-purchase row_number — scales as a
      // user-partitioned shuffle, no custom strategy needed.
      val ev = T.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      val w = Window.partitionBy("purchase_id")
        .orderBy(col("c_ts").desc, col("click_id").desc)
      p.join(c, col("user_id") === col("c_user") && col("c_ts") <= col("p_ts"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("purchase_id"), col("user_id"), col("click_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
        .orderBy("purchase_id")
    }),

    "join_interval" -> ((s, d) => {
      // same-user event pairs within 10 minutes, counted per user;
      // the self-join shuffles once on user_id, range residual after.
      val ev = T.events(s, d)
      val a = ev.select(col("user_id"), col("ts").as("a_ts"))
      val b = ev.select(col("user_id").as("b_user"), col("ts").as("b_ts"))
      a.join(b, col("user_id") === col("b_user") &&
          col("a_ts") < col("b_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    "join_interval_bucketed" -> ((s, d) => {
      // Same semantics as join_interval, restructured for scale: bucket
      // timestamps into 10-minute cells and join on (user, cell) with the
      // left side duplicated into its own cell and the next one — every
      // qualifying pair (b.ts in (a.ts, a.ts+10m]) lands in exactly one
      // of the two cells, so the equi-join is exact after the range
      // filter. Turns a per-user range cross-join (O(k²) per user, skew
      // hostage) into a keyed hash join whose buckets stay small no
      // matter how active a user is.
      val ev = T.events(s, d).select(col("user_id"), col("ts"),
        floor(unix_micros(col("ts")) / lit(600000000L)).as("cell"))
      val a = ev.select(col("user_id"), col("ts").as("a_ts"),
          explode(array(col("cell"), col("cell") + 1)).as("jcell"))
      val b = ev.select(col("user_id").as("b_user"), col("ts").as("b_ts"),
          col("cell").as("b_cell"))
      a.join(b, col("user_id") === col("b_user") && col("jcell") === col("b_cell") &&
          col("a_ts") < col("b_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    "join_spatial_grid" -> ((s, d) => {
      // nearest-neighbor-within-R spatial join via DENSITY-ADAPTIVE
      // grid bucketing — the spatial twin of join_interval_bucketed.
      // A single R-sized grid is NOT scale-safe: cell population grows
      // linearly with n over a fixed domain, so the 3×3 bucket join's
      // candidate count grows QUADRATICALLY (the r14 sf1 bench caught
      // it — 58× wall at 10× points, ~176 M candidate pairs). Since
      // each point keeps only its NEAREST in-radius neighbor, the
      // candidate radius can shrink with density: a FINE grid with
      // cell F ≈ √2× the mean point spacing resolves the true NN for
      // any point whose fine-ring rank-1 lands at d ≤ F (every
      // potential closer point is within d ≤ F, hence inside the 3×3
      // fine neighborhood — provable acceptance, not a heuristic);
      // under Poisson density that accepts 1−e^(−2π) ≈ 99.8 % of
      // points with ~2-point cells, and only the sparse remainder
      // falls back to the coarse R grid (still keyed, now with a tiny
      // left side). Both passes are keyed equi-joins + rank-1 over
      // exact integer d² (WindowGroupLimit) — never an all-pairs
      // distance pass, and the union is byte-identical to the
      // single-grid result (same (d2, b) tie order), so the oracle
      // replays the straightforward coarse definition. Points are
      // md5-seeded integers in [0, 10⁶)² (no corpus coordinates);
      // dx²+dy² ≤ R² exact integer — no sqrt, no libm exposure.
      import graft.ops.TextOps
      val R = 30000L
      val D = 1000000L
      val pts = T.customer(s, d).select(col("c_custkey").as("id"))
        .withColumn("x",
          pmod(TextOps.md5Long(concat(lit("px:"), col("id"))), lit(D)))
        .withColumn("y",
          pmod(TextOps.md5Long(concat(lit("py:"), col("id"))), lit(D)))
      // rank-1 within-R neighbors of `aSide` against `all`, both
      // bucketed at `cell` (aSide exploded into its 3×3 neighborhood)
      def nnPass(cell: Long, aSide: DataFrame, all: DataFrame): DataFrame = {
        def bucketed(df: DataFrame) = df
          .withColumn("cx", floor(col("x") / lit(cell.toDouble)).cast("long"))
          .withColumn("cy", floor(col("y") / lit(cell.toDouble)).cast("long"))
        val nbrs = for (dx <- -1 to 1; dy <- -1 to 1)
          yield struct((col("cx") + dx).as("jx"), (col("cy") + dy).as("jy"))
        val a = bucketed(aSide).select(col("id").as("a"), col("x").as("ax"),
            col("y").as("ay"), explode(array(nbrs: _*)).as("c"))
          .select(col("a"), col("ax"), col("ay"),
            col("c.jx").as("jx"), col("c.jy").as("jy"))
        val b = bucketed(all).select(col("id").as("b"), col("x").as("bx"),
          col("y").as("yb"), col("cx").as("jx"), col("cy").as("jy"))
        val dd = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("yb")) * (col("ay") - col("yb"))
        val wnn = Window.partitionBy("a").orderBy(col("d2"), col("b"))
        a.join(b, Seq("jx", "jy"))
          .filter(col("a") =!= col("b"))
          .withColumn("d2", dd)
          .filter(col("d2") <= lit(R * R))
          .withColumn("rk", row_number().over(wnn))
          .filter(col("rk") === 1)
          .select(col("a"), col("b").as("nn"), col("d2"))
      }
      // one scalar to the driver (the ZOrder-bounds precedent): the
      // fine cell size from measured density — F s.t. E[pts/cell] ≈ 2
      val n = math.max(1L, pts.count())
      val f = math.min(R, math.max(1L, (D * math.sqrt(2.0 / n)).toLong))
      if (f >= R) // sparse regime: the coarse grid already has ~2-pt cells
        nnPass(R, pts, pts).orderBy("a")
      else {
        val fine = nnPass(f, pts, pts)
        val accepted = fine.filter(col("d2") <= lit(f * f))
        val rest = pts.join(accepted.select(col("a").as("id")), Seq("id"), "left_anti")
        accepted.unionByName(nnPass(R, rest, pts)).orderBy("a")
      }
    }),

    "join_ip_lpm" -> ((s, d) => {
      // longest-prefix-match enrichment — the geo/ASN join every log
      // pipeline runs, expressed as EQUI-joins (no custom strategy):
      // each address explodes into its 3 candidate prefixes (/8, /16,
      // /24), candidates equi-join the network table on (plen, pfx),
      // and the most specific match wins via a rank-1 filter that
      // compiles to WindowGroupLimit. The network table is an
      // aggregate (bounded by prefix space — broadcastable at any
      // corpus size); candidates are 3 rows per address — linear. The
      // corpus has no IPs, so addresses are seeded deterministically
      // WITH LOCALITY (the PII-scrub seeding precedent): ~50 /8 nets,
      // ~500 /16 subnets, random host bits — md5-derived, replayed
      // verbatim in the oracle; the network table itself is
      // data-derived (observed /8s always route; /16 and /24 blocks
      // need ≥2 distinct addresses — how a traffic-built table looks).
      import graft.ops.TextOps
      def h(tag: String, c: org.apache.spark.sql.Column, m: Long) =
        pmod(TextOps.md5Long(concat(lit(tag), c)), lit(m))
      // r18 (recompute elimination + guide §2.5): pfx feeds FOUR
      // consumers (three per-plen block aggregates + the candidate
      // explode) and each re-ran the events scan + distinct (sf1: three
      // 2.9 s jobs doing identical work). Spread the projected 8-byte
      // user_id so the distinct's partial fold runs wide, and pin the
      // |users|-bounded pfx table once (eager executor-block
      // checkpoint — dimension-sized at any corpus scale).
      val users = T.spread(T.events(s, d).select(col("user_id"))).distinct()
      val pfx = users
        .withColumn("ip",
          h("net:", pmod(col("user_id"), lit(50L)), 256L) * lit(16777216L) +
          h("sub:", pmod(col("user_id"), lit(500L)), 256L) * lit(65536L) +
          h("host:", col("user_id"), 65536L))
        .select(col("user_id"),
          shiftright(col("ip"), 24).as("p8"),
          shiftright(col("ip"), 16).as("p16"),
          shiftright(col("ip"), 8).as("p24"))
        .localCheckpoint(true)
      def blocks(c: String, plen: Int, minUsers: Long) = {
        val g = pfx.groupBy(col(c).as("pfx"))
          .agg(countDistinct("user_id").as("nu"))
        (if (minUsers > 1) g.filter(col("nu") >= minUsers) else g)
          .select(lit(plen).as("plen"), col("pfx"))
      }
      val nets = blocks("p8", 8, 1)
        .unionByName(blocks("p16", 16, 2))
        .unionByName(blocks("p24", 24, 2))
      val cand = pfx.select(col("user_id"), explode(array(
          struct(lit(8).as("plen"), col("p8").as("pfx")),
          struct(lit(16).as("plen"), col("p16").as("pfx")),
          struct(lit(24).as("plen"), col("p24").as("pfx")))).as("c"))
        .select(col("user_id"), col("c.plen").as("plen"), col("c.pfx").as("pfx"))
      val w = Window.partitionBy("user_id").orderBy(col("plen").desc)
      cand.join(broadcast(nets), Seq("plen", "pfx"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .groupBy("plen", "pfx")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("plen", "pfx")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "join_spatial_grid" ->
      """WITH pts AS (
        |  SELECT c_custkey AS id,
        |         CAST(('0x' || substring(md5('px:' || c_custkey), 1, 15)) AS BIGINT) % 1000000 AS x,
        |         CAST(('0x' || substring(md5('py:' || c_custkey), 1, 15)) AS BIGINT) % 1000000 AS y
        |  FROM customer),
        |cells AS (
        |  SELECT id, x, y,
        |         CAST(floor(x / 30000.0) AS BIGINT) AS cx,
        |         CAST(floor(y / 30000.0) AS BIGINT) AS cy
        |  FROM pts),
        |la AS (
        |  SELECT id AS a, x AS ax, y AS ay,
        |         cx + dx.d AS jx, cy + dy.d AS jy
        |  FROM cells,
        |       (SELECT unnest([-1, 0, 1]) AS d) dx,
        |       (SELECT unnest([-1, 0, 1]) AS d) dy),
        |rb AS (SELECT id AS b, x AS bx, y AS yb, cx AS jx, cy AS jy FROM cells),
        |cand AS (
        |  SELECT a, b,
        |         (ax - bx) * (ax - bx) + (ay - yb) * (ay - yb) AS d2
        |  FROM la JOIN rb ON la.jx = rb.jx AND la.jy = rb.jy AND la.a <> rb.b
        |  WHERE (ax - bx) * (ax - bx) + (ay - yb) * (ay - yb) <= 900000000),
        |rk AS (
        |  SELECT a, b, d2,
        |         row_number() OVER (PARTITION BY a ORDER BY d2, b) AS rk
        |  FROM cand)
        |SELECT a, b AS nn, d2 FROM rk WHERE rk = 1 ORDER BY a""".stripMargin,

    "join_ip_lpm" ->
      """WITH users AS (SELECT DISTINCT user_id FROM events),
        |ips AS (
        |  SELECT user_id,
        |         (CAST(('0x' || substring(md5('net:' || (user_id % 50)), 1, 15)) AS BIGINT) % 256) * 16777216
        |       + (CAST(('0x' || substring(md5('sub:' || (user_id % 500)), 1, 15)) AS BIGINT) % 256) * 65536
        |       + (CAST(('0x' || substring(md5('host:' || user_id), 1, 15)) AS BIGINT) % 65536) AS ip
        |  FROM users),
        |pfx AS (SELECT user_id, ip >> 24 AS p8, ip >> 16 AS p16, ip >> 8 AS p24
        |        FROM ips),
        |nets AS (
        |  SELECT 8 AS plen, p8 AS pfx FROM pfx GROUP BY p8
        |  UNION ALL
        |  SELECT 16, p16 FROM pfx GROUP BY p16 HAVING COUNT(DISTINCT user_id) >= 2
        |  UNION ALL
        |  SELECT 24, p24 FROM pfx GROUP BY p24 HAVING COUNT(DISTINCT user_id) >= 2),
        |cand AS (
        |  SELECT user_id, 8 AS plen, p8 AS pfx FROM pfx
        |  UNION ALL SELECT user_id, 16, p16 FROM pfx
        |  UNION ALL SELECT user_id, 24, p24 FROM pfx),
        |mt AS (
        |  SELECT c.user_id, c.plen, c.pfx,
        |         row_number() OVER (PARTITION BY c.user_id
        |                            ORDER BY c.plen DESC) AS rk
        |  FROM cand c JOIN nets n ON c.plen = n.plen AND c.pfx = n.pfx)
        |SELECT plen, pfx, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM mt WHERE rk = 1 GROUP BY plen, pfx ORDER BY plen, pfx""".stripMargin,

    "join_5way_flagship" ->
      s"""SELECT n_name,
        |       ${graft.Sql.sumNet} AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "join_broadcast_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "join_shuffle_inner" ->
      """SELECT l_orderkey, l_linenumber, o_custkey,
        |       ROUND(l_extendedprice, 2) AS price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber, price""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey,
        |       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
        |       ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "join_full_outer" ->
      """SELECT COALESCE(hv.c_custkey, r.o_custkey) AS k,
        |       hv.c_custkey IS NOT NULL AS has_high_bal,
        |       r.o_custkey IS NOT NULL AS has_recent
        |FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 7000) hv
        |FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders
        |                 WHERE o_orderdate >= TIMESTAMP '2000-01-01') r
        |  ON hv.c_custkey = r.o_custkey
        |ORDER BY k""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "join_cross" ->
      """SELECT r_regionkey, n_nationkey, r_name || '-' || n_name AS label
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "join_theta_range" ->
      """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(l_quantity), 2) AS qty
        |FROM lineitem JOIN part
        |  ON l_partkey = p_partkey AND l_quantity > p_size
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "join_asof" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
        |           FROM events WHERE event_type = 'click'),
        |     j AS (SELECT purchase_id, user_id, click_id,
        |                  epoch_us(p_ts) - epoch_us(c_ts) AS gap_us,
        |                  ROW_NUMBER() OVER (PARTITION BY purchase_id
        |                                     ORDER BY c_ts DESC, click_id DESC) AS rn
        |           FROM p JOIN c ON user_id = c_user AND c_ts <= p_ts)
        |SELECT purchase_id, user_id, click_id, gap_us
        |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin,

    "join_interval" ->
      """SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.ts < b.ts AND b.ts <= a.ts + INTERVAL 10 MINUTES
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    "join_interval_bucketed" ->
      """SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.ts < b.ts AND b.ts <= a.ts + INTERVAL 10 MINUTES
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin
  )
}
