package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** Round-12 batch 5 — entity resolution, nearest-centroid
  * classification, and upsampling mixture planning:
  *
  *  - `join_fuzzy_blocked`   blocked fuzzy (levenshtein) self-join
  *  - `sim_centroid_classify` nearest-centroid classifier + confusion
  *  - `sample_epoch_plan`    epoch-based upsampling plan (all integer)
  */
object Ext5Queries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "join_fuzzy_blocked" -> ((s, d) => {
      // entity-resolution fuzzy match over part names, the blocked-ER
      // shape: (1) dedupe to the DISTINCT name table first — the BPE
      // vocab trick: edit distances run over |distinct names| (Zipf-
      // bounded), never the row count; (2) candidate pairs must share
      // the last token (the blocking key — an equi-join, never a
      // cartesian); (3) levenshtein ≤ 2 within the block. Row-count
      // weights ride along so the match table maps back to data volume.
      val names = T.part(s, d)
        .groupBy("p_name").agg(count(lit(1)).as("n"))
        .withColumn("blk", element_at(split(col("p_name"), " "), -1))
      val a = names.select(col("p_name").as("name_a"), col("n").as("n_a"), col("blk"))
      val b = names.select(col("p_name").as("name_b"), col("n").as("n_b"), col("blk"))
      a.join(b, "blk")
        .filter(col("name_a") < col("name_b"))
        .withColumn("lev", levenshtein(col("name_a"), col("name_b")))
        .filter(col("lev") <= 2)
        .select(col("name_a"), col("name_b"), col("lev"), col("n_a"), col("n_b"))
        .orderBy("name_a", "name_b")
    }),

    "sim_centroid_classify" -> ((s, d) => {
      // nearest-centroid classification of the embedding corpus against
      // its own per-label centroids (the cheap-classifier eval every
      // labeling pipeline starts from) → confusion matrix. Centroids
      // are per-(label, pos) partial-aggregated means rounded to 6 dp
      // (the sim_kmeans parity device), collected into ONE broadcast
      // row; the argmin is an inline array fold over that row — the
      // label fan never becomes rows. d² = ‖x‖² − 2x·c + ‖c‖² with
      // graft_dot folds, 6-dp rounded, label-asc tie-break.
      graft.GraftFunctions.register(s)
      val e = T.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          graft.ops.VectorOps.toDouble(col("embedding")).as("v"))
      val cents = e
        .select(col("label").as("c_label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("c_label", "pos").agg(round(avg("x"), 6).as("cx"))
        .groupBy("c_label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          _.getField("cx")).as("c"))
        .select(col("c_label"), col("c"), expr("graft_dot(c, c)").as("cc"))
        .agg(collect_list(struct(col("c_label"), col("c"), col("cc"))).as("cents"))
      e.crossJoin(broadcast(cents))
        .withColumn("vv", expr("graft_dot(v, v)"))
        .withColumn("best", array_min(transform(col("cents"), ct =>
          struct(
            round(col("vv") - lit(2.0)
                * graft.GraftFunctions.dotCol(s, col("v"), ct.getField("c"))
              + ct.getField("cc"), 6).as("d2"),
            ct.getField("c_label").as("pred")))))
        .groupBy(col("label"), col("best.pred").as("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("label", "pred")
    }),

    "sample_epoch_plan" -> ((s, d) => {
      // epoch-based UPSAMPLING mixture plan — the complement of
      // sample_temperature's downsample-only resampling: to hit a
      // uniform per-lang target T = N DIV 5, low-resource langs repeat
      // ⌊T/n_l⌋ full epochs plus a fractional md5-threshold pass.
      // Entirely integer arithmetic on two tiny aggregates (per-lang
      // counts × a 1-row total broadcast) — the PLAN is the output;
      // applying it is a generate-by-epoch map pass at any scale.
      val byLang = T.documents(s, d)
        .groupBy("lang").agg(count(lit(1)).as("n_before"))
      val tot = byLang.agg(sum("n_before").as("n_total"),
        count(lit(1)).as("n_langs"))
      byLang.crossJoin(broadcast(tot))
        .withColumn("target", expr("n_total DIV n_langs"))
        .withColumn("epochs", expr("target DIV n_before"))
        .withColumn("frac_bps",
          expr("(10000 * (target % n_before)) DIV n_before"))
        .withColumn("expected_out",
          expr("epochs * n_before + (n_before * frac_bps) DIV 10000"))
        .select(col("lang"), col("n_before"), col("target"), col("epochs"),
          col("frac_bps"), col("expected_out"))
        .orderBy("lang")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "join_fuzzy_blocked" ->
      """WITH names AS (
        |  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n,
        |         string_split(p_name, ' ')[-1] AS blk
        |  FROM part GROUP BY p_name)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev,
        |       a.n AS n_a, b.n AS n_b
        |FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    "sim_centroid_classify" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cx AS (
        |  SELECT label AS c_label, pos, ROUND(AVG(x), 6) AS cx
        |  FROM (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x
        |        FROM e)
        |  GROUP BY 1, 2),
        |cent AS (
        |  SELECT c_label, list(cx ORDER BY pos) AS c
        |  FROM cx GROUP BY c_label),
        |cent2 AS (
        |  SELECT c_label, c, list_dot_product(c, c) AS cc FROM cent),
        |d AS (
        |  SELECT e.vec_id, e.label, cent2.c_label,
        |         ROUND(list_dot_product(e.v, e.v)
        |               - 2.0 * list_dot_product(e.v, cent2.c) + cent2.cc, 6) AS d2
        |  FROM e CROSS JOIN cent2),
        |best AS (
        |  SELECT vec_id, label, c_label AS pred,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id
        |           ORDER BY d2, c_label) AS rk
        |  FROM d)
        |SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n
        |FROM best WHERE rk = 1
        |GROUP BY 1, 2 ORDER BY label, pred""".stripMargin,

    "sample_epoch_plan" ->
      """WITH bl AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_before) AS BIGINT) AS n_total,
        |               CAST(COUNT(*) AS BIGINT) AS n_langs FROM bl),
        |p AS (
        |  SELECT lang, n_before, n_total // n_langs AS target
        |  FROM bl CROSS JOIN tot),
        |q AS (
        |  SELECT lang, n_before, target,
        |         target // n_before AS epochs,
        |         (10000 * (target % n_before)) // n_before AS frac_bps
        |  FROM p)
        |SELECT lang, n_before, target, epochs, frac_bps,
        |       epochs * n_before + (n_before * frac_bps) // 10000 AS expected_out
        |FROM q ORDER BY lang""".stripMargin
  )
}
