package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** Trailing-N-day active users (WAU/MAU): EXACT rolling distinct —
  * which no window frame can express — via the bounded offset explode:
  * each (user, day) pair votes into the N window-ends it falls in, then
  * countDistinct per window-end; window-ends land only on days that
  * actually occur (semi join back onto the day set).
  *
  * Expansion-factor cost model: the explode multiplies the AGGREGATED
  * (user, day) table — ≤ users × days rows, never raw events — by N, so
  * cost is N × |distinct (user, day)|, independent of event volume.
  * N=7 (WAU) and N=30 (MAU) keep that well under one raw-event scan for
  * any realistic events-per-user-day ratio; for windows much beyond ~30
  * (quarterly/annual actives) prefer per-day HLL partials merged across
  * the window and accept sketch error — the exact explode's N× starts
  * rivaling the raw scan it exists to avoid.
  */
private object TrailingActive {
  def spark(s: org.apache.spark.sql.SparkSession, d: String, n: Int,
      out: String): org.apache.spark.sql.DataFrame = {
    val ud = T.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val days = ud.select("day").distinct()
    ud.select(col("user_id"),
        explode(expr(s"sequence(day, date_add(day, ${n - 1}))")).as("win_end"))
      .join(days.withColumnRenamed("day", "win_end"), Seq("win_end"), "left_semi")
      .groupBy("win_end")
      .agg(countDistinct("user_id").as(out))
      .orderBy("win_end")
  }

  /** the same semantics as [[spark]], generated from the same (n, out). */
  def sql(n: Int, out: String): String =
    s"""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
       |days AS (SELECT DISTINCT day FROM ud),
       |g AS (SELECT user_id, day + CAST(i AS INTEGER) AS win_end
       |      FROM ud, range(0, $n) AS t(i))
       |SELECT win_end, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS $out
       |FROM g JOIN days ON g.win_end = days.day
       |GROUP BY 1 ORDER BY 1""".stripMargin
}

/** Round-1 breadth extensions (SURVEY.md §2B additions):
  *
  *   - ORC source/sink roundtrip (the other columnar format Spark ships)
  *   - scalar + correlated subqueries (Catalyst decorrelation:
  *     RewriteCorrelatedScalarSubquery turns them into aggregate+join —
  *     the shape that scales, vs a per-row re-scan)
  *   - pivot (conditional aggregation; one shuffle, map-side partials)
  *   - higher-order array lambdas (filter/transform/aggregate/exists —
  *     all codegen-free but expression-tree-native, no UDF)
  *   - corr/covar bivariate stats (single-pass partial+final aggregation)
  *   - levenshtein edit distance
  *   - time-series hourly gap-fill (sequence+explode grid, left join —
  *     the grid is tiny (types × hours) so Spark broadcasts it)
  *   - 7-day moving revenue window (exact DECIMAL window sum)
  *   - deterministic hash sampling (portable md5-derived bucket: the
  *     scale-out way to sample reproducibly across engines/runs,
  *     unlike rand()-based TABLESAMPLE)
  *   - Spark 4 VARIANT JSON path (parse_json/variant_get) checked
  *     against DuckDB's json_extract
  */
object ExtQueries extends QueryPack {

  /** Portable engine-independent 60-bit hash of a string (SURVEY §7.4):
    * Spark `conv(substring(md5(x),1,15),16,10)` equals DuckDB
    * `CAST('0x'||substring(md5(x),1,15) AS BIGINT)`.
    */
  private def md5Bucket(colSql: String, buckets: Int): String =
    s"CAST(conv(substring(md5($colSql), 1, 15), 16, 10) AS BIGINT) % $buckets"

  /** Exact DECIMAL-cents daily revenue series — the shared input of the
    * ts_ewma / ts_holt_linear dyadic devices (one definition per
    * engine, so the cents cast can never diverge between the keys).
    */
  private def dailyCents(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("d"))
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100)
        .cast("long").as("cents"))

  private val dailyCentsCte =
    """daily AS (
      |  SELECT o_orderdate AS d,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1)""".stripMargin

  /** Unit-impulse weights of the 10-step zero-init Holt recursion
    * (α = β = ½): l_t = (x_t + l + b)/2, b_t = (l_t − l + b)/2. Index
    * j = 0 is the OLDEST of the 10 observations; the pair is the
    * coefficient of x_j in the final (level, trend), exact integers at
    * scale 2^20. Every intermediate in the fold below is a dyadic
    * rational with a ≤ 21-bit numerator, so the Double arithmetic is
    * EXACT (halving never rounds, and the adds stay within one ulp
    * span); the require proves integrality at class-init time. The
    * driver-computed-constants device (the JL sign-matrix precedent):
    * both engines get the same inlined literals, zero cross-libm
    * exposure.
    */
  private val (holtWl, holtWb) = {
    val k = 10
    val (wl, wb) = (0 until k).map { j =>
      var l = 0.0
      var b = 0.0
      for (t <- 0 until k) {
        val x = if (t == j) 1.0 else 0.0
        val nl = (x + l + b) / 2.0
        b = (nl - l + b) / 2.0
        l = nl
      }
      (l * (1L << 20), b * (1L << 20))
    }.unzip
    def toLongs(ws: Seq[Double]): Seq[Long] = ws.map { w =>
      require(w == math.rint(w), s"non-integral Holt weight $w")
      w.toLong
    }
    (toLongs(wl), toLongs(wb))
  }

  val queries: Map[String, QueryFn] = Map(
    "scan_orc_roundtrip" -> ((s, d) => {
      val tmp = graft.Tmp.dir("orc").toString
      T.supplier(s, d).write.mode(SaveMode.Overwrite).orc(tmp)
      s.read.orc(tmp).orderBy("s_suppkey")
    }),

    "subquery_scalar" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("ext_orders")
      s.sql("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
              |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
              |FROM ext_orders
              |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM ext_orders)
              |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    "subquery_correlated" -> ((s, d) => {
      // correlated scalar subquery; Catalyst decorrelates to an
      // aggregate-then-join — one shuffle on the correlation key.
      T.customer(s, d).createOrReplaceTempView("ext_customer")
      s.sql("""SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_above,
              |       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS bal_above
              |FROM ext_customer c
              |WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM ext_customer c2
              |                   WHERE c2.c_nationkey = c.c_nationkey)
              |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    }),

    "agg_pivot" -> ((s, d) => {
      // explicit pivot values => no extra distinct-values job at scale
      val p = T.orders(s, d)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .count()
      p.select(col("o_orderstatus"),
          coalesce(col("`1-URGENT`"), lit(0L)).as("p1_urgent"),
          coalesce(col("`2-HIGH`"), lit(0L)).as("p2_high"),
          coalesce(col("`3-MEDIUM`"), lit(0L)).as("p3_medium"),
          coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("p4_notspec"),
          coalesce(col("`5-LOW`"), lit(0L)).as("p5_low"))
        .orderBy("o_orderstatus")
    }),

    "fn_higher_order" -> ((s, d) => {
      T.documents(s, d)
        .withColumn("tokens", split(col("text"), " "))
        .select(col("doc_id"),
          expr("CAST(size(filter(tokens, x -> length(x) > 3)) AS BIGINT)").as("n_long"),
          expr("aggregate(transform(tokens, x -> CAST(length(x) AS BIGINT)), 0L, (a, x) -> a + x)").as("sum_len"),
          expr("exists(tokens, x -> x = 'the')").as("has_the"))
        .orderBy("doc_id")
    }),

    "agg_corr" -> ((s, d) => {
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("r"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_s"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("cov_p"))
        .orderBy("l_returnflag")
    }),

    "fn_levenshtein" -> ((s, d) => {
      T.part(s, d)
        .select(col("p_partkey"),
          levenshtein(col("p_name"), lit("forest green")).as("lev_fixed"),
          levenshtein(col("p_name"), col("p_brand")).as("lev_brand"))
        .orderBy("p_partkey")
    }),

    "ts_gapfill" -> ((s, d) => {
      // hourly grid per event_type spanning [min,max] hour, zero-filled.
      // The grid (types × hours) is tiny relative to the fact side at any
      // scale, so the join broadcasts; counts aggregate before joining.
      val ev = T.events(s, d)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      val counts = ev.groupBy("event_type", "h").agg(count(lit(1)).as("n"))
      val grid = ev.groupBy("event_type")
        .agg(min("h").as("h0"), max("h").as("h1"))
        .select(col("event_type"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      grid.join(counts, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("event_type", "h")
    }),

    "ts_backtest_naive" -> ((s, d) => {
      // forecast backtest on the daily event-count series: the
      // seasonal-naive model (forecast(d) = actual(d − 7), the
      // always-computed floor every real forecaster must beat) scored
      // per event_type with MAE / MAPE / bias over all days with a
      // 7-back observation. EXACT parity: forecasts and errors are
      // integer differences via lag(7) — the only doubles are the
      // final rounded ratios of exact integer sums. Aggregate-then-
      // window: the lagged series lives on types × days rows.
      val daily = T.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily.withColumn("fc", lag("n", 7).over(w))
        .filter(col("fc").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          round(avg(abs(col("n") - col("fc"))), 4).as("mae"),
          round(avg(abs(col("n") - col("fc")).cast("double") / col("n")), 4)
            .as("mape"),
          round(avg(col("n") - col("fc")), 4).as("bias"))
        .orderBy("event_type")
    }),

    "ts_anomaly" -> ((s, d) => {
      // trailing z-score anomaly flags on the daily event-count series
      // — the volume-spike alert an ingest pipeline runs per source.
      // Daily counts are uniform by construction, so a deterministic
      // spike slice is seeded identically on both engines first (the
      // glitch-seeding precedent): day-of-month 13 triples. Mean/std
      // come from the 7 STRICTLY PRECEDING days over INTEGER counts —
      // the day under test is excluded from its own baseline, else the
      // spike inflates its own std and masks itself (measured: the
      // trailing-inclusive frame flags nothing). Σn and Σn² are exact
      // longs, so mean, the sample-variance rational, and the IEEE
      // sqrt are identical doubles on both engines, and the
      // |n−mean| > 3σ decision is exact. Full frames only (x ≥ 7);
      // the aggregate-then-window shape keeps the windowed stream at
      // types × days rows, never raw events.
      val daily = T.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n0"))
        .withColumn("n",
          when(dayofmonth(col("day")) === 13, col("n0") * 3).otherwise(col("n0")))
      val w = Window.partitionBy("event_type").orderBy("day")
      val wf = w.rowsBetween(-7, -1)
      daily.select(col("event_type"), col("day"), col("n"),
          (row_number().over(w) - 1).as("x"),
          sum("n").over(wf).as("s1"),
          sum(col("n") * col("n")).over(wf).as("s2"))
        .filter(col("x") >= 7)
        .withColumn("mean", col("s1").cast("double") / 7.0)
        .withColumn("std", sqrt((lit(7) * col("s2") - col("s1") * col("s1"))
          .cast("double") / (7.0 * 6.0)))
        .select(col("event_type"), col("day"), col("n"),
          round(col("mean"), 4).as("mean"), round(col("std"), 4).as("std"),
          (abs(col("n").cast("double") - col("mean")) > lit(3) * col("std"))
            .cast("int").as("is_anomaly"))
        .orderBy("event_type", "day")
    }),

    // trailing-7-day (WAU) and trailing-30-day (MAU) active users —
    // the deliberate pair, one shape, window length the only knob
    // (the r7 verdict's watch item: the 30-day variant must adopt the
    // bounded-explode shape consciously, not by copy-paste).
    "ts_active_users" -> ((s, d) => TrailingActive.spark(s, d, 7, "wau")),
    "ts_active_monthly" -> ((s, d) => TrailingActive.spark(s, d, 30, "mau")),

    "ts_active_hll" -> ((s, d) => {
      // the scale path TrailingActive's scaladoc prescribes for windows
      // beyond ~30 days, delivered as a key: ONE mergeable DataSketches
      // HLL partial per day (hll_sketch_agg over that day's users), then
      // the trailing-30 window unions the ≤30 per-day partials per
      // window end (hll_union_agg) and reads the estimate. The exact
      // variant explodes N × |distinct (user, day)| rows; this explodes
      // N × |days| SKETCHES (~KB each) — window cost independent of user
      // cardinality, which is what makes quarterly/annual actives
      // tractable at 100 TB. TEST-only by nature (sketch bytes are
      // implementation-defined — no DuckDB parity); SemanticsSpec pins
      // the estimate within 5% of the exact ts_active_monthly, window
      // for window.
      val daily = T.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy("day").agg(expr("hll_sketch_agg(user_id)").as("sk"))
      val days = daily.select("day")
      daily
        .select(col("sk"),
          explode(expr("sequence(day, date_add(day, 29))")).as("win_end"))
        .join(days.withColumnRenamed("day", "win_end"), Seq("win_end"), "left_semi")
        .groupBy("win_end")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("mau_est"))
        .orderBy("win_end")
    }),

    "ts_retention_cohort" -> ((s, d) => {
      // signup-cohort retention (the other half of the engagement pair
      // with ts_active_users): cohort = users by first-signup day;
      // D+1/D+7 retention = distinct cohort users active exactly those
      // days. One distinct-day activity table joined back on user_id —
      // both sides hash-partition on the same key — and conditional
      // countDistinct per cohort day; ratios on 4-dp rounds.
      // No countDistinct needed (three distinct groups in one agg
      // would Expand ×4 the activity join pre-shuffle — the
      // quality_profile trap): `act` is already distinct per
      // (user, day) and `cohort` carries exactly one row per user, so
      // a user contributes at most ONE joined row per day — plain
      // conditional counts ARE the distinct counts, map-side
      // combinable. Cohort sizes come straight off the cohort table
      // (no join needed); the retained counts left-join back so
      // zero-retention cohort days keep their row.
      val ev = T.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("day").as("d0"))
      val act = ev.select("user_id", "day").distinct()
      val sizes = cohort.groupBy("d0").agg(count(lit(1)).as("cohort_users"))
      val retained = cohort.join(act, Seq("user_id"))
        .groupBy("d0")
        .agg(count(when(col("day") === date_add(col("d0"), 1), 1))
            .as("d1_retained"),
          count(when(col("day") === date_add(col("d0"), 7), 1))
            .as("d7_retained"))
      sizes.join(retained, Seq("d0"), "left")
        .select(col("d0"), col("cohort_users"),
          coalesce(col("d1_retained"), lit(0L)).as("d1_retained"),
          coalesce(col("d7_retained"), lit(0L)).as("d7_retained"))
        .withColumn("d1_rate", round(col("d1_retained") / col("cohort_users"), 4))
        .withColumn("d7_rate", round(col("d7_retained") / col("cohort_users"), 4))
        .orderBy("d0")
    }),

    "win_moving_sum" -> ((s, d) => {
      // daily revenue + 7-day trailing window, all in exact DECIMAL
      val daily = T.orders(s, d)
        .groupBy(col("o_orderdate").as("d"))
        .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("rev_dec"))
      val w = Window.orderBy("d").rowsBetween(-6, 0)
      daily.select(col("d"),
          col("rev_dec").cast("double").as("rev"),
          sum(col("rev_dec")).over(w).cast("double").as("mv7"))
        .orderBy("d")
    }),

    "ts_ewma" -> ((s, d) => {
      // dyadic-decay smoothing of the daily revenue series: EWMA with
      // α = 1/2 over the trailing 10 OBSERVED order dates — lag(cents,k)
      // is row-offset, so a calendar gap shifts the weights to the last
      // 10 rows, not the last 10 days (gap-fill the series first, as
      // ts_gapfill does, if true calendar-day EWMA is wanted; parity is
      // unaffected — both engines compute the identical row-based form).
      // The textbook recursive form s_t = αx_t + (1−α)s_{t−1}
      // carries libm pow and an unbounded fold of doubles — engine-
      // hostile twice over. With DYADIC weights the window form is
      // exact: revenue is exact DECIMAL cents (the win_moving_sum rule),
      // scaling numerator and denominator by 2^9 makes every weighted
      // term cents·2^(9−k) — a BIGINT — and the full-frame denominator
      // is the constant 2^10−1 = 1023. The whole state is integer; the
      // single double division at the end is correctly rounded AS LONG
      // AS num = Σ cents·2^(9−k) stays ≤ 2^53 (daily revenue below
      // ~$176B; roughly SF≲1000) — past that the long→double cast
      // itself rounds, so the quotient is no longer the correctly-
      // rounded exact ratio. Parity holds regardless (both engines
      // perform the same cast), per the ts_anomaly integer-state
      // rule. Aggregate-then-window: the windowed stream
      // is |days| rows, never raw orders; full frames only (x ≥ 9).
      val daily = dailyCents(s, d)
      val w = Window.orderBy("d")
      val num = (0 until 10).map(k =>
          coalesce(lag(col("cents"), k).over(w), lit(0L)) * lit(1L << (9 - k)))
        .reduce(_ + _)
      daily.select(col("d"), col("cents"),
          (row_number().over(w) - 1).as("x"), num.as("num"))
        .filter(col("x") >= 9)
        .select(col("d"),
          round(col("cents").cast("double") / 100.0, 2).as("revenue"),
          round(col("num").cast("double") / 102300.0, 4).as("ewma"))
        .orderBy("d")
    }),

    "ts_holt_linear" -> ((s, d) => {
      // Holt double exponential smoothing (level + linear trend) of the
      // daily revenue series, α = β = ½, initialized 10 observed days
      // back from zero state — the ts_ewma dyadic device extended to
      // TWO coupled recurrences, yielding the thing EWMA cannot give: a
      // trend estimate and an h-step forecast. Unrolling the recursion
      // ten steps from zero init makes each output an EXACT fixed
      // dyadic convolution of the last 10 daily cents (unit-impulse
      // weights holtWl/holtWb, exact integers at scale 2^20, computed
      // once at class init and inlined into BOTH engines), so the
      // whole state is integer; the only doubles are final correctly-
      // rounded divisions (exact while Σ|w|·cents ≤ 2^53 — daily
      // revenue below ~$430 M, roughly SF ≲ 40; past that both engines
      // round the same long→double cast identically, the ts_ewma
      // rule). Forecast fc7 = level + 7·trend stays in the same
      // integer state. Aggregate-then-window: the windowed stream is
      // |days| rows, never raw orders; full frames only (x ≥ 9).
      val daily = dailyCents(s, d)
      val w = Window.orderBy("d")
      def conv(ws: Seq[Long]) = (0 until 10).map(k =>
          coalesce(lag(col("cents"), k).over(w), lit(0L)) * lit(ws(9 - k)))
        .reduce(_ + _)
      daily.select(col("d"), col("cents"),
          (row_number().over(w) - 1).as("x"),
          conv(holtWl).as("numL"), conv(holtWb).as("numB"))
        .filter(col("x") >= 9)
        .select(col("d"),
          round(col("cents").cast("double") / 100.0, 2).as("revenue"),
          round(col("numL").cast("double") / 104857600.0, 4).as("level"),
          round(col("numB").cast("double") / 104857600.0, 4).as("trend"),
          round((col("numL") + lit(7L) * col("numB")).cast("double")
            / 104857600.0, 4).as("fc7"))
        .orderBy("d")
    }),

    "ts_changepoint" -> ((s, d) => {
      // CUSUM changepoint detection on the daily event-count series —
      // the level-shift locator that tells an ingest pipeline WHEN a
      // source changed behavior (vs ts_anomaly's point spikes). The
      // statistic is the running sum of deviations from the global
      // mean; its extremum is the most likely changepoint. EXACT
      // integer state: deviations are scaled by |days| (n·D − N per
      // day, both exact BIGINTs) so the cumulative sum never touches a
      // double; the peak flag is an integer comparison. The windows
      // run over the |days| aggregate (aggregate-then-window), and the
      // (N, D) totals ride in as one broadcast row.
      val daily = T.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = daily.agg(sum("n").as("nn"), count(lit(1)).as("dd"))
      val wc = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      daily.crossJoin(broadcast(tot))
        .withColumn("cusum", sum(col("n") * col("dd") - col("nn")).over(wc))
        .withColumn("mx", max(abs(col("cusum"))).over(wall))
        .select(col("day"), col("n"), col("cusum"),
          (abs(col("cusum")) === col("mx")).cast("int").as("is_peak"))
        .orderBy("day")
    }),

    "ts_seasonal_decompose" -> ((s, d) => {
      // classical additive decomposition of the daily event-count
      // series — trend = centered 7-row moving average (full frames
      // only), seasonal = per-day-of-week mean of the detrended
      // series, residual = the rest; the series-health view a pipeline
      // reads before alerting on ts_anomaly's spikes. EXACT parity by
      // the ts_anomaly/ts_ewma integer-state rule: everything is
      // integer micro-units (×10⁴) — the only doubles are two SINGLE
      // divisions (sum·10⁴/7 and Σdetr/cnt), each floor'd; a single
      // IEEE division is identically rounded in both engines, unlike a
      // multi-term double fold. dow = days-since-epoch mod 7
      // (Thursday=0) — portable, no locale/week-start exposure.
      // Aggregate-then-window: both windows run over the |days| table.
      val daily = T.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val t = daily
        .withColumn("c7", count(lit(1)).over(w7))
        .withColumn("trend_u", when(col("c7") === 7,
          floor(sum(col("n")).over(w7) * lit(10000.0) / 7).cast("long")))
        .withColumn("dow",
          pmod((unix_timestamp(col("day")) / lit(86400)).cast("long"), lit(7)))
        .withColumn("detr_u", col("n") * lit(10000L) - col("trend_u"))
      val wd = Window.partitionBy("dow")
      t.withColumn("seasonal_u",
          floor(sum(col("detr_u")).over(wd).cast("double")
            / count(col("detr_u")).over(wd)).cast("long"))
        .select(col("day"), col("n"), col("trend_u"), col("seasonal_u"),
          (col("detr_u") - col("seasonal_u")).as("resid_u"))
        .orderBy("day")
    }),

    "sample_hash" -> ((s, d) => {
      // reproducible 5% sample: portable md5 bucket of the key — the
      // deterministic, engine-independent alternative to TABLESAMPLE
      T.orders(s, d)
        .filter(expr(md5Bucket("CAST(o_orderkey AS STRING)", 20) + " = 0"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)").as("total"))
        .orderBy("o_orderstatus")
    }),

    "fn_variant" -> ((s, d) => {
      // Spark 4 VARIANT: parse once, typed path extraction — the open
      // JSON column pattern for semi-structured data at scale
      T.events(s, d)
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k_val"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k_val").as("sum_k"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "scan_orc_roundtrip" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",

    "subquery_scalar" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "subquery_correlated" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_above,
        |       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS bal_above
        |FROM customer c
        |WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "agg_pivot" ->
      """SELECT o_orderstatus,
        |       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS p1_urgent,
        |       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS p2_high,
        |       COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS p3_medium,
        |       COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_notspec,
        |       COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS p5_low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "fn_higher_order" ->
      """SELECT doc_id,
        |       CAST(length(list_filter(string_split(text, ' '), x -> length(x) > 3)) AS BIGINT) AS n_long,
        |       CAST(list_aggregate(list_transform(string_split(text, ' '), x -> length(x)), 'sum') AS BIGINT) AS sum_len,
        |       list_contains(string_split(text, ' '), 'the') AS has_the
        |FROM documents ORDER BY doc_id""".stripMargin,

    "agg_corr" ->
      """SELECT l_returnflag,
        |       ROUND(corr(l_quantity, l_extendedprice), 4) AS r,
        |       ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cov_s,
        |       ROUND(covar_pop(l_quantity, l_extendedprice), 2) AS cov_p
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "fn_levenshtein" ->
      """SELECT p_partkey,
        |       levenshtein(p_name, 'forest green') AS lev_fixed,
        |       levenshtein(p_name, p_brand) AS lev_brand
        |FROM part ORDER BY p_partkey""".stripMargin,

    "ts_backtest_naive" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |f AS (
        |  SELECT event_type, n,
        |         LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS fc
        |  FROM daily)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |       ROUND(AVG(ABS(n - fc)), 4) AS mae,
        |       ROUND(AVG(CAST(ABS(n - fc) AS DOUBLE) / n), 4) AS mape,
        |       ROUND(AVG(n - fc), 4) AS bias
        |FROM f WHERE fc IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ts_anomaly" ->
      """WITH d0 AS (
        |  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n0
        |  FROM events GROUP BY 1, 2),
        |d1 AS (
        |  SELECT event_type, day,
        |         CASE WHEN EXTRACT(day FROM day) = 13 THEN n0 * 3 ELSE n0 END AS n
        |  FROM d0),
        |f AS (
        |  SELECT event_type, day, n,
        |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1 AS x,
        |         SUM(n) OVER w AS s1, SUM(n * n) OVER w AS s2
        |  FROM d1
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, CAST(n AS BIGINT) AS n,
        |       ROUND(CAST(s1 AS DOUBLE) / 7.0, 4) AS mean,
        |       ROUND(SQRT(CAST(7 * s2 - s1 * s1 AS DOUBLE) / (7.0 * 6.0)), 4) AS std,
        |       CAST(CASE WHEN ABS(CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
        |                      > 3 * SQRT(CAST(7 * s2 - s1 * s1 AS DOUBLE) / (7.0 * 6.0))
        |                 THEN 1 ELSE 0 END AS INT) AS is_anomaly
        |FROM f WHERE x >= 7 ORDER BY event_type, day""".stripMargin,

    "ts_gapfill" ->
      """WITH c AS (SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS cnt
        |           FROM events GROUP BY 1, 2),
        |     s AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY 1),
        |     g AS (SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM s)
        |SELECT g.event_type, g.h, CAST(COALESCE(cnt, 0) AS BIGINT) AS n
        |FROM g LEFT JOIN c USING (event_type, h)
        |ORDER BY g.event_type, g.h""".stripMargin,

    "ts_retention_cohort" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
        |cohort AS (SELECT user_id, MIN(day) AS d0 FROM ev
        |           WHERE event_type = 'signup' GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, day FROM ev),
        |j AS (SELECT c.user_id, c.d0, a.day FROM cohort c JOIN act a USING (user_id))
        |SELECT d0, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS cohort_users,
        |       CAST(COUNT(DISTINCT CASE WHEN day = d0 + 1 THEN user_id END) AS BIGINT) AS d1_retained,
        |       CAST(COUNT(DISTINCT CASE WHEN day = d0 + 7 THEN user_id END) AS BIGINT) AS d7_retained,
        |       ROUND(CAST(COUNT(DISTINCT CASE WHEN day = d0 + 1 THEN user_id END) AS DOUBLE)
        |             / COUNT(DISTINCT user_id), 4) AS d1_rate,
        |       ROUND(CAST(COUNT(DISTINCT CASE WHEN day = d0 + 7 THEN user_id END) AS DOUBLE)
        |             / COUNT(DISTINCT user_id), 4) AS d7_rate
        |FROM j GROUP BY d0 ORDER BY d0""".stripMargin,

    "ts_active_users" -> TrailingActive.sql(7, "wau"),
    "ts_active_monthly" -> TrailingActive.sql(30, "mau"),

    "win_moving_sum" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
        |  FROM orders GROUP BY 1)
        |SELECT d, CAST(rev_dec AS DOUBLE) AS rev,
        |       CAST(SUM(rev_dec) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mv7
        |FROM daily ORDER BY d""".stripMargin,

    "ts_ewma" -> {
      // the lag chain is generated from the SAME (k, 2^(9-k)) constants
      // as the Spark side — the two derivations must stay in lockstep
      val num = (0 until 10).map(k =>
          s"COALESCE(lag(cents, $k) OVER (ORDER BY d), 0) * ${1L << (9 - k)}")
        .mkString(" + ")
      s"""WITH $dailyCentsCte,
         |f AS (
         |  SELECT d, cents,
         |         ROW_NUMBER() OVER (ORDER BY d) - 1 AS x,
         |         $num AS num
         |  FROM daily)
         |SELECT d, ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue,
         |       ROUND(CAST(num AS DOUBLE) / 102300.0, 4) AS ewma
         |FROM f WHERE x >= 9 ORDER BY d""".stripMargin
    },

    "ts_holt_linear" -> {
      // both lag chains generated from the SAME driver-computed exact
      // dyadic weights as the Spark side (holtWl/holtWb) — lockstep
      def conv(ws: Seq[Long]) = (0 until 10).map(k =>
          s"COALESCE(lag(cents, $k) OVER (ORDER BY d), 0) * ${ws(9 - k)}")
        .mkString(" + ")
      s"""WITH $dailyCentsCte,
         |f AS (
         |  SELECT d, cents,
         |         ROW_NUMBER() OVER (ORDER BY d) - 1 AS x,
         |         ${conv(holtWl)} AS num_l, ${conv(holtWb)} AS num_b
         |  FROM daily)
         |SELECT d, ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue,
         |       ROUND(CAST(num_l AS DOUBLE) / 104857600.0, 4) AS level,
         |       ROUND(CAST(num_b AS DOUBLE) / 104857600.0, 4) AS trend,
         |       ROUND(CAST(num_l + 7 * num_b AS DOUBLE) / 104857600.0, 4) AS fc7
         |FROM f WHERE x >= 9 ORDER BY d""".stripMargin
    },

    "ts_changepoint" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |               CAST(COUNT(*) AS BIGINT) AS dd FROM daily),
        |c AS (
        |  SELECT day, n,
        |         CAST(SUM(n * dd - nn) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cusum
        |  FROM daily, tot),
        |m AS (SELECT MAX(abs(cusum)) AS mx FROM c)
        |SELECT day, n, cusum,
        |       CAST(CASE WHEN abs(cusum) = mx THEN 1 ELSE 0 END AS INT) AS is_peak
        |FROM c, m ORDER BY day""".stripMargin,

    "ts_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT day, n,
        |         COUNT(*) OVER w7 AS c7,
        |         SUM(n) OVER w7 AS s7,
        |         (CAST(epoch(day) AS BIGINT) // 86400) % 7 AS dow
        |  FROM daily
        |  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (
        |  SELECT day, n, dow,
        |         CASE WHEN c7 = 7
        |              THEN CAST(floor(s7 * 10000.0 / 7) AS BIGINT) END AS trend_u
        |  FROM t),
        |t3 AS (
        |  SELECT day, n, trend_u, n * 10000 - trend_u AS detr_u,
        |         CAST(floor(CAST(SUM(n * 10000 - trend_u)
        |                           OVER (PARTITION BY dow) AS DOUBLE)
        |                    / COUNT(n * 10000 - trend_u)
        |                           OVER (PARTITION BY dow)) AS BIGINT) AS seasonal_u
        |  FROM t2)
        |SELECT day, n, trend_u, seasonal_u, detr_u - seasonal_u AS resid_u
        |FROM t3 ORDER BY day""".stripMargin,

    "sample_hash" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM orders
        |WHERE CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 20 = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "fn_variant" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
