package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}
import graft.ops.TextOps

/** Round-2 breadth extensions:
  *
  *   - sessionization (30-min-gap windows — the batch form of
  *     session_window, and the canonical training-data event grouping)
  *   - deterministic per-group mode (window argmax with an explicit
  *     tie-break — built-in `mode()` is tie-arbitrary in BOTH engines,
  *     so the contract is the count-desc/value-asc rule itself)
  *   - stratified sampling by portable hash (per-label deterministic
  *     subsample — the training-mix primitive; md5-derived bucket, so
  *     the oracle reproduces the exact membership)
  *   - EXISTS / NOT EXISTS correlated subqueries (Catalyst decorrelates
  *     to semi/anti joins — the declarative form of join_semi/join_anti)
  */
object Ext3Queries extends QueryPack {

  /** session gap: events ≥ this many µs apart start a new session. */
  private val SessionGapUs = 1800000000L // 30 min

  /** quality_outliers' seeded effective length — one SQL text evaluated
    * verbatim by BOTH engines (Spark via `expr`). */
  private val GlitchLenSql =
    """CASE WHEN doc_id % 31 = 0 THEN n_chars * 20
      |     WHEN doc_id % 37 = 0 THEN 12
      |     ELSE n_chars END""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "win_sessionize" -> ((s, d) => {
      // µs arithmetic (unix_micros ≡ epoch_us) — second-granularity
      // casts would truncate the sub-second gaps the corpus carries
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag(unix_micros(col("ts")), 1).over(w)
      val isNew = when(prev.isNull ||
        (unix_micros(col("ts")) - prev > SessionGapUs), 1).otherwise(0)
      T.events(s, d).select("event_id", "ts", "user_id")
        .withColumn("is_new", isNew)
        .withColumn("sid", sum(col("is_new")).over(wRun))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n"), min("ts").as("t0"), max("ts").as("t1"))
        .orderBy("user_id", "sid")
    }),

    "agg_mode" -> ((s, d) => {
      val counts = T.orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("n").desc, col("o_orderpriority"))
      counts.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
          col("n"))
        .orderBy("o_orderstatus")
    }),

    "sample_stratified" -> ((s, d) => {
      // ~20% per-label sample: membership decided by a portable 16-bit
      // md5 bucket of the id, so the sample is identical on any engine,
      // any partitioning, any run — summarized per stratum with an
      // id-sum checksum that pins exact membership, not just counts.
      T.spread(T.embeddings(s, d))
        .filter(pmod(TextOps.md5Short(col("vec_id").cast("string")), lit(10)) < 2)
        .groupBy("label")
        .agg(count(lit(1)).as("n_kept"), sum("vec_id").as("id_sum"))
        .orderBy("label")
    }),

    "win_ignore_nulls" -> ((s, d) => {
      // carry-forward of the last purchase value per user (IGNORE NULLS
      // over a trailing frame) — the gap-filling idiom for sparse
      // per-entity signals. Frame excludes the current row so a
      // purchase sees the PREVIOUS purchase, not itself.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      T.events(s, d)
        .withColumn("pv", when(col("event_type") === "purchase", col("value")))
        .select(col("user_id"), col("event_id"),
          last(col("pv"), ignoreNulls = true).over(w).as("prev_purchase"))
        .orderBy("user_id", "event_id")
    }),

    "text_bigram_lm" -> ((s, d) => {
      // bigram language-model scoring with Laplace smoothing — the
      // perplexity-proxy quality filter: score(doc) = avg over its
      // bigrams of ln((C(w1w2)+1)/(C(w1)+V)). Corpus stats are two
      // hash aggregates; V is a 1-row broadcast; per-doc scoring is
      // two equi-joins. ln of identical rationals differs across
      // engines ≤1 ulp/term, invisible at the 4-dp round.
      val docs = T.spread(T.documents(s, d))
      val toks = TextOps.tokens(col("text"))
      val docBi = docs.select(col("doc_id"), explode(TextOps.shingles(toks, 2)).as("b"))
        .withColumn("w1", substring_index(col("b"), " ", 1))
      val c2 = docBi.groupBy("b").agg(count(lit(1)).as("c2"))
      val c1 = docs.select(explode(toks).as("w1")).groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = c1.agg(count(lit(1)).as("vsz"))
      docBi.join(c2, "b").join(c1, "w1").crossJoin(broadcast(v))
        .withColumn("lp", log((col("c2") + 1).cast("double") / (col("c1") + col("vsz"))))
        .groupBy("doc_id")
        .agg(round(avg("lp"), 4).as("avg_lp"), count(lit(1)).as("n_bigrams"))
        .orderBy("doc_id")
    }),

    "agg_entropy" -> ((s, d) => {
      // Shannon entropy of each cohort's event-type mix — the
      // distribution-diversity metric a training-mix pipeline tracks.
      // ln of identical rationals differs across engines only in the
      // last ulp, far below the 4-dp round.
      val c = T.events(s, d)
        .groupBy(pmod(col("user_id"), lit(10)).as("cohort"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy("cohort").agg(sum("n").as("tot"))
      c.join(t, "cohort")
        .withColumn("p", col("n").cast("double") / col("tot"))
        .groupBy("cohort")
        .agg(round(-sum(col("p") * log(col("p"))), 4).as("entropy"),
          sum("n").as("n"))
        .orderBy("cohort")
    }),

    "win_funnel" -> ((s, d) => {
      // staged conversion funnel: first view, then first click strictly
      // after it, then first purchase strictly after that, counted per
      // stage — time-ordered MIN chains, exact at µs precision.
      val ev = T.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v, "user_id").filter(col("e.ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p = ev.filter(col("event_type") === "purchase").as("e")
        .join(c, "user_id").filter(col("e.ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    }),

    "quality_constraints" -> ((s, d) => {
      // one-pass data-quality audit (the dbt-test shape a pipeline runs
      // before training ingestion): null counts, range violations, and
      // a referential-orphan count via left-anti join — each constraint
      // a map-side conditional sum, one row out.
      val o = T.orders(s, d)
      val checks = o.agg(
        count(lit(1)).as("rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpos_price"),
        sum(when(col("o_orderdate") > lit("1999-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("future_orders"))
      val orphans = o.join(T.customer(s, d),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_orders"))
      checks.crossJoin(orphans)
    }),

    "quality_outliers" -> ((s, d) => {
      // robust length-outlier audit (the filter a curation run applies
      // before quality scoring trusts mean/stddev): per lang, median
      // and MAD of the effective length, then docs beyond med ± 2·MAD
      // flagged low/high, with an id-sum checksum pinning exact
      // membership. The synthetic lengths are a tight uniform band with
      // no natural outliers, so a deterministic ingest-glitch slice is
      // seeded identically on both engines first (the PII-scrub
      // precedent): %31 docs as 20× concat blowups, %37 docs as
      // 12-char fragments — and the point of the robust pair is
      // visible in the output: the seeded ~5% barely moves med/MAD
      // while the contrast column `mean` (plain AVG) shifts hard.
      // Median and MAD stay EXACT across engines: lengths are
      // integral, so every interpolated median is x or x.5 — both
      // binary-exact — and |len − med| is again integral-or-half, so
      // the decision thresholds are identical doubles on both sides.
      // Scale shape: two aggregate passes over documents plus two
      // broadcast joins of the per-lang stats row (percentile's sketch
      // is bounded by DISTINCT length values per lang, not rows).
      val docs = T.spread(T.documents(s, d))
        .select(col("doc_id"), col("lang"), expr(GlitchLenSql).as("len"))
      val med = docs.groupBy("lang")
        .agg(expr("percentile(len, 0.5)").as("med"))
      val withMed = docs.join(broadcast(med), "lang")
      val mad = withMed.groupBy("lang")
        .agg(expr("percentile(abs(len - med), 0.5)").as("mad"))
      withMed.join(broadcast(mad), "lang")
        .withColumn("lo", col("len") < col("med") - lit(2) * col("mad"))
        .withColumn("hi", col("len") > col("med") + lit(2) * col("mad"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          first("med").as("med"), first("mad").as("mad"),
          round(avg("len"), 2).as("mean"),
          sum(col("lo").cast("long")).as("n_low"),
          sum(col("hi").cast("long")).as("n_high"),
          sum(when(col("lo") || col("hi"), col("doc_id"))
            .otherwise(lit(0L))).as("out_idsum"))
        .orderBy("lang")
    }),

    "join_exists_subquery" -> ((s, d) => {
      // correlated EXISTS + NOT EXISTS; Catalyst decorrelates to a left
      // semi join and a left anti join on o_custkey — same physical
      // shape as join_semi/join_anti, reached from the subquery surface
      T.customer(s, d).createOrReplaceTempView("ext3_customer")
      T.orders(s, d).createOrReplaceTempView("ext3_orders")
      s.sql("""SELECT c_custkey, c_name FROM ext3_customer c
              |WHERE EXISTS (SELECT 1 FROM ext3_orders o
              |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
              |  AND NOT EXISTS (SELECT 1 FROM ext3_orders o
              |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 50000)
              |ORDER BY c_custkey""".stripMargin)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "win_sessionize" ->
      s"""WITH x AS (
         |  SELECT user_id, event_id, ts,
         |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs
         |              THEN 1 ELSE 0 END AS is_new
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (
         |  SELECT user_id, ts,
         |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                           ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM x)
         |SELECT user_id, CAST(sid AS BIGINT) AS sid, CAST(COUNT(*) AS BIGINT) AS n,
         |       MIN(ts) AS t0, MAX(ts) AS t1
         |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,

    "agg_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT o_orderstatus, o_orderpriority, n,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |                            ORDER BY n DESC, o_orderpriority) AS rk
        |  FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, n
        |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,

    "sample_stratified" -> {
      val h = TextOps.md5ShortSql("CAST(vec_id AS VARCHAR)")
      s"""SELECT label, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |       CAST(SUM(vec_id) AS BIGINT) AS id_sum
         |FROM embeddings WHERE ($h % 10) < 2
         |GROUP BY label ORDER BY label""".stripMargin
    },

    "win_ignore_nulls" ->
      """SELECT user_id, event_id,
        |       LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "text_bigram_lm" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bi AS (SELECT doc_id,
        |              unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b
        |       FROM d),
        |bi2 AS (SELECT doc_id, b, string_split(b, ' ')[1] AS w1 FROM bi),
        |c2 AS (SELECT b, COUNT(*) AS c2 FROM bi2 GROUP BY b),
        |c1 AS (SELECT w1, COUNT(*) AS c1
        |       FROM (SELECT unnest(string_split(text, ' ')) AS w1 FROM documents)
        |       GROUP BY w1),
        |v AS (SELECT COUNT(*) AS vsz FROM c1)
        |SELECT doc_id,
        |       ROUND(AVG(LN((c2 + 1.0) / (c1 + vsz))), 4) AS avg_lp,
        |       CAST(COUNT(*) AS BIGINT) AS n_bigrams
        |FROM bi2 JOIN c2 USING (b) JOIN c1 USING (w1) CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "agg_entropy" ->
      """WITH c AS (
        |  SELECT user_id % 10 AS cohort, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT cohort, SUM(n) AS tot FROM c GROUP BY 1)
        |SELECT c.cohort,
        |       ROUND(-SUM((CAST(n AS DOUBLE) / tot) * LN(CAST(n AS DOUBLE) / tot)), 4) AS entropy,
        |       CAST(SUM(n) AS BIGINT) AS n
        |FROM c JOIN t ON c.cohort = t.cohort
        |GROUP BY c.cohort ORDER BY c.cohort""".stripMargin,

    "win_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        |      WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        |      WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase""".stripMargin,

    "quality_constraints" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS rows,
        |       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        |       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_price,
        |       CAST(SUM(CASE WHEN o_orderdate > TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS future_orders,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        |        WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                          WHERE c.c_custkey = o.o_custkey)) AS orphan_orders
        |FROM orders""".stripMargin,

    "quality_outliers" ->
      s"""WITH dl AS (
        |  SELECT doc_id, lang, ($GlitchLenSql) AS len FROM documents),
        |med AS (
        |  SELECT lang, quantile_cont(len, 0.5) AS med
        |  FROM dl GROUP BY lang),
        |mad AS (
        |  SELECT d.lang, quantile_cont(ABS(d.len - m.med), 0.5) AS mad
        |  FROM dl d JOIN med m ON d.lang = m.lang GROUP BY d.lang)
        |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       ANY_VALUE(m.med) AS med, ANY_VALUE(x.mad) AS mad,
        |       ROUND(AVG(d.len), 2) AS mean,
        |       CAST(SUM(CASE WHEN d.len < m.med - 2 * x.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |       CAST(SUM(CASE WHEN d.len > m.med + 2 * x.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |       CAST(SUM(CASE WHEN d.len < m.med - 2 * x.mad
        |                       OR d.len > m.med + 2 * x.mad
        |                     THEN d.doc_id ELSE 0 END) AS BIGINT) AS out_idsum
        |FROM dl d JOIN med m ON d.lang = m.lang
        |          JOIN mad x ON d.lang = x.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "join_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 50000)
        |ORDER BY c_custkey""".stripMargin
  )
}
