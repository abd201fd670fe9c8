package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** Sketch operators beyond HLL/quantile (SURVEY.md §2B cat D). The
  * native-sketch keys are TEST-only — engine sketch internals differ
  * by design, so they are property-tested in ScalaTest, not
  * DuckDB-oracled — while agg_distinct_kmv is deterministic by
  * construction (portable md5 hashes) and carries a full hash oracle:
  *
  *   - Bloom filter: the join-pruning primitive at 100 TB (ship a
  *     ~100 KB filter of the build side's keys to the probe side's scan
  *     instead of shuffling non-matching rows). Spark's own runtime
  *     row-group filtering uses this exact aggregate.
  *   - approx_top_k: heavy hitters without an exact full groupBy — the
  *     corpus-vocabulary primitive when distinct counts explode.
  *   - KMV distinct-count: the k smallest hash values per group ARE a
  *     mergeable distinct-count sketch — and unlike HLL, one whose
  *     every intermediate is replayable in SQL on any engine.
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
    }),

    // k-minimum-values distinct-count sketch — the DETERMINISTIC,
    // cross-engine-replayable member of the sketch family (unlike the
    // native HLL/top-k keys whose engine internals differ by design,
    // so they stay TEST-only). KMV: hash every member to [0, 2^60),
    // keep the k smallest distinct hashes per group; if fewer than k
    // survive the group is exact, else estimate (k−1)·2^60/kth — the
    // classic birthday-spacing estimator, mergeable (union of sketches
    // = top-k of concatenation), which is what makes it a partial
    // aggregate at 100 TB. Scale shape: the rank ≤ k filter compiles
    // to partial+final WindowGroupLimit (pinned in PlanSpec), so every
    // map task ships at most k rows per group — the sketch property
    // materialized in the plan. All outputs are integers (floor of an
    // IEEE-identical double ratio), so the DuckDB replay hash-matches
    // with no rounding-boundary risk.
    "agg_distinct_kmv" -> ((s, d) => {
      import graft.ops.TextOps
      val k = 256
      val hashed = T.events(s, d)
        .select(col("event_type"),
          TextOps.md5Long(concat(lit("kmv:"), col("user_id"))).as("h"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("h")
      val sk = hashed
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_kept"), max("h").as("kth"))
      val exact = T.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("n_exact"))
      val est = when(col("n_kept") < k, col("n_kept").cast("double"))
        .otherwise(floor(lit((k - 1).toDouble * math.pow(2, 60)) / col("kth")))
        .cast("long")
      sk.join(exact, "event_type")
        .withColumn("kmv_est", est)
        .select(col("event_type"), col("n_exact"), col("kmv_est"),
          floor(abs(col("kmv_est") - col("n_exact")) * lit(10000.0)
            / col("n_exact")).cast("long").as("err_bp"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "agg_distinct_kmv" ->
      """WITH hashed AS (
        |  SELECT DISTINCT event_type,
        |         CAST(('0x' || substring(md5('kmv:' || user_id), 1, 15)) AS BIGINT) AS h
        |  FROM events),
        |topk AS (
        |  SELECT event_type, h,
        |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        |  FROM hashed),
        |sk AS (
        |  SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS kth
        |  FROM topk WHERE rk <= 256 GROUP BY event_type),
        |ex AS (
        |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM events GROUP BY event_type),
        |est AS (
        |  SELECT s.event_type, e.n_exact,
        |         CAST(CASE WHEN s.n_kept < 256 THEN CAST(s.n_kept AS DOUBLE)
        |              ELSE floor(255.0 * 1152921504606846976.0 / s.kth)
        |              END AS BIGINT) AS kmv_est
        |  FROM sk s JOIN ex e ON s.event_type = e.event_type)
        |SELECT event_type, n_exact, kmv_est,
        |       CAST(floor(abs(kmv_est - n_exact) * 10000.0 / n_exact) AS BIGINT) AS err_bp
        |FROM est ORDER BY event_type""".stripMargin
  )
}
