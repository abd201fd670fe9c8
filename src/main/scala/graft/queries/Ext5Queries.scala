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
      val e = T.spread(T.embeddings(s, d))
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
      val byLang = T.spread(T.documents(s, d))
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
    }),

    "quality_profile" -> ((s, d) => {
      // Deequ-style per-column data profile of orders: count / null
      // count / exact distinct / typed min-max. Numerics (and
      // timestamps, as epoch micros) surface as DOUBLE min/max, strings
      // lexicographically — never numeric→string casts, whose
      // formatting is an engine-parity landmine (Spark prints 1.0E7,
      // DuckDB 10000000.0).
      //
      // Shape, MEASURED not guessed: the one-pass multi-countDistinct
      // aggregate plans an Expand (#cols × rows) whose wide-row shuffle
      // went 25.6× at 16× data in ScaleProbe — super-linear, the
      // classic exact-profile trap. The scalable form is six NARROW
      // subtrees: each reads exactly ONE column from parquet (column
      // pruning makes the re-scans cheap), each distinct is a two-level
      // hash aggregate (map-side dedup, no Expand), unioned into the
      // report. Re-probed at 1.9× for 16× data.
      val o = T.orders(s, d)
      def prof(c: String, outName: String, num: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
               isStr: Boolean) = {
        val base = o.select(col(c))
        val nulls = sum(when(col(c).isNull, 1L).otherwise(0L)).as("nulls")
        val nd = countDistinct(col(c)).as("n_distinct")
        if (isStr)
          base.agg(count(lit(1)).as("n_rows"), nulls, nd,
            min(col(c)).as("mn_s"), max(col(c)).as("mx_s"))
            .select(col("n_rows"), lit(outName).as("col"), col("nulls"),
              col("n_distinct"),
              lit(null).cast("double").as("min_num"),
              lit(null).cast("double").as("max_num"),
              col("mn_s").as("min_str"), col("mx_s").as("max_str"))
        else
          base.agg(count(lit(1)).as("n_rows"), nulls, nd,
            num(min(col(c))).as("mn_n"), num(max(col(c))).as("mx_n"))
            .select(col("n_rows"), lit(outName).as("col"), col("nulls"),
              col("n_distinct"),
              col("mn_n").as("min_num"), col("mx_n").as("max_num"),
              lit(null).cast("string").as("min_str"),
              lit(null).cast("string").as("max_str"))
      }
      Seq(
        prof("o_orderkey", "o_orderkey", _.cast("double"), isStr = false),
        prof("o_custkey", "o_custkey", _.cast("double"), isStr = false),
        prof("o_totalprice", "o_totalprice", c => c, isStr = false),
        prof("o_orderdate", "o_orderdate_us",
          c => unix_micros(c).cast("double"), isStr = false),
        prof("o_orderstatus", "o_orderstatus", c => c, isStr = true),
        prof("o_orderpriority", "o_orderpriority", c => c, isStr = true))
        .reduce(_.union(_))
        .orderBy("col")
    }),

    "sim_label_separation" -> ((s, d) => {
      // embedding-quality audit: mean intra-label vs inter-label cosine
      // for the declared probe slice (vec_id < 100, the sim_cosine_knn
      // cap) against the whole corpus — the margin that predicts
      // whether label-conditioned retrieval works at all. Per-pair
      // cosine quantizes to micro-units before the group sums (exact
      // BIGINT accumulation, the perplexity precedent); probes ride a
      // broadcast so the pass is one map-side join + one aggregate.
      // Finding on the fixture corpus (pinned in SemanticsSpec): labels
      // separate in their MEANS (centroid classifier 41% vs 10% chance)
      // but pairwise cosines sit in the 64-dim near-orthogonal regime
      // (|avg| ≈ 0.01) on BOTH sides — exactly the failure mode this
      // audit exists to surface before anyone ships cosine-threshold
      // retrieval against such embeddings.
      graft.GraftFunctions.register(s)
      val e = T.spread(T.embeddings(s, d))
        .select(col("vec_id"), col("label"),
          graft.ops.VectorOps.unit(
            graft.ops.VectorOps.toDouble(col("embedding"))).as("u"))
      val probes = e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("a"), col("label").as("la"), col("u").as("ua"))
      e.filter(col("vec_id") >= 100).join(broadcast(probes), lit(true))
        .withColumn("m", expr(
          "CAST(ROUND(graft_dot(ua, u) * 1e6) AS BIGINT)"))
        .withColumn("same_label", col("label") === col("la"))
        .groupBy("la", "same_label")
        .agg(count(lit(1)).as("n_pairs"), sum("m").as("sm"))
        .select(col("la").as("label"), col("same_label"), col("n_pairs"),
          expr("ROUND(CAST(sm AS DOUBLE) / (n_pairs * 1e6), 4)").as("avg_cos"))
        .orderBy("label", "same_label")
    }),

    // Iterative proportional fitting (raking) of the corpus mixture —
    // the domain-reweighting shape a multilingual training pipeline
    // runs before sampling: fit per-(lang, source) cell weights so the
    // LANG margins follow α=0.5 temperature-scaled shares (the
    // sqrt-of-count upweighting of low-resource languages that
    // mBERT/XLM popularized) while the SOURCE margins balance to
    // uniform — two targets no single-pass scaling can hit at once,
    // which is exactly what IPF's alternating margin fits solve. Four
    // half-steps (lang, source, lang, source), declared. ALL-INTEGER:
    // cell mass starts as the cell's ppm SHARE of the corpus
    // ((n·1e6) DIV total — so masses are bounded by 1e6 and the
    // half-step product m·T ≤ 1e12 can never overflow BIGINT at ANY
    // corpus size), and each half-step is
    // m ← (m · T_dim) DIV GREATEST(Σ_partition m, 1) — truncating
    // integer division on BIGINTs, identical on both engines (the
    // point is engine parity, not unit mass: IPF converges the same
    // way under ppm truncation, and the one double is FLOOR(SQRT(n_l))
    // of an exact int, IEEE-identical). Windows run over the
    // ≤|langs|·|sources| cell table, never the corpus; at 100 TB the
    // only corpus-sized work is the first groupBy — everything after
    // is dimension-sized. A cell whose mass truncates to 0 stays 0
    // (deterministic both engines); the GREATEST(·, 1) floor makes a
    // margin whose every cell truncated to 0 yield 0 weights instead
    // of a division by zero (Spark NULL/ANSI-error vs DuckDB error —
    // an engine-divergence class, not just a crash).
    "sample_mixture_ipf" -> ((s, d) => {
      val cells = T.spread(T.documents(s, d))
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      val langT = cells.groupBy("lang").agg(sum("n").as("nl"))
        .withColumn("sq", expr("CAST(FLOOR(SQRT(CAST(nl AS DOUBLE))) AS BIGINT)"))
        .withColumn("t_lang", expr("(sq * 1000000) DIV (SUM(sq) OVER ())"))
        .select("lang", "t_lang")
      val srcT = cells.agg(
        expr("CAST(1000000 DIV COUNT(DISTINCT source) AS BIGINT)").as("t_src"))
      val base = cells.join(broadcast(langT), Seq("lang"))
        .crossJoin(broadcast(srcT))
        .crossJoin(broadcast(cells.agg(sum("n").as("tot"))))
        .withColumn("m", expr("(n * 1000000) DIV GREATEST(tot, 1)"))
      val fitted = Seq("lang" -> "t_lang", "source" -> "t_src",
        "lang" -> "t_lang", "source" -> "t_src")
        .foldLeft(base) { case (df, (dim, t)) =>
          df.withColumn("m",
            expr(s"(m * $t) DIV GREATEST(SUM(m) OVER (PARTITION BY $dim), 1)"))
        }
      fitted.select(col("lang"), col("source"), col("n").as("n_docs"),
          col("m").as("weight_ppm"))
        .orderBy("lang", "source")
    }),

    "sample_neyman" -> ((s, d) => {
      // Neyman (variance-optimal) stratified-sampling allocation: with
      // a fixed label budget, stratum h gets n_h ∝ N_h·σ_h — high-
      // variance strata earn more samples than proportional allocation
      // gives them. σ_h comes from EXACT integer sums of n_chars
      // (Σx, Σx² BIGINTs → one sqrt on identical doubles); the weights
      // quantize to micro-units before the cross-strata total so the
      // normalizing sum is an exact BIGINT, and the final allocation is
      // integer FLOOR arithmetic. Budget = 1000 labels, declared; the
      // allocation is UNCAPPED (a stratum may be offered more than it
      // holds when the budget exceeds the corpus — real deployments
      // cap-and-redistribute; the plan reports the raw optimum).
      val st = T.spread(T.documents(s, d))
        .groupBy("lang")
        .agg(count(lit(1)).as("nh"), sum("n_chars").as("s1"),
          sum(col("n_chars") * col("n_chars")).as("s2"))
        .withColumn("sigma", expr(
          "SQRT(s2 / CAST(nh AS DOUBLE) - (s1 / CAST(nh AS DOUBLE)) * (s1 / CAST(nh AS DOUBLE)))"))
        .withColumn("wq", expr("CAST(ROUND(nh * sigma * 1e6) AS BIGINT)"))
      val tot = st.agg(sum("wq").as("wtot"))
      st.crossJoin(broadcast(tot))
        .select(col("lang"), col("nh").as("n_docs"),
          expr("ROUND(sigma, 4)").as("sigma"),
          // exponent literals (1e3/1e4 = DOUBLE in both engines), never
          // decimal literals: a decimal-typed product/division is exact
          // in Spark but cast-to-DOUBLE in DuckDB — the bm25Micro drift
          // class. The DOUBLE path also cannot overflow where the old
          // integer spelling (10000 * wq) wrapped BIGINT once nh·sigma
          // passed ~9.2e8 (Spark wraps silently, DuckDB raises — engine
          // divergence exactly at 100 TB-class strata), and unlike
          // wq DIV (wtot DIV 1e4) it has no denominator-truncation
          // error and no division-by-zero window for tiny corpora.
          // FLOOR of one shared IEEE expression tree = engine-identical.
          expr("CAST(FLOOR(1e3 * wq / wtot) AS BIGINT)").as("alloc_n"),
          expr("CAST(FLOOR(1e4 * wq / wtot) AS BIGINT)").as("alloc_bps"))
        .orderBy("lang")
    }),

    "join_null_safe" -> ((s, d) => {
      // null-safe equality join (<=>): the optional-attribute match
      // where NULL means "unknown" and unknown matches unknown — a
      // plain equi-join silently DROPS every NULL row (NULL = NULL is
      // NULL), the classic enrichment bug. Deterministic NULL seeding:
      // BUILDING segments become NULL via NULLIF; the dim side is the
      // per-segment aggregate of the same seeded column, so the NULL
      // bucket must round-trip. <=> compiles to an equi-join key
      // (Coalesce/isnull pair), NOT a nested loop — same hash shuffle
      // as `=` at any scale.
      val segd = nullif(col("c_mktsegment"), lit("BUILDING"))
      val cust = T.customer(s, d).withColumn("seg", segd)
      val dim = cust.groupBy("seg").agg(count(lit(1)).as("seg_n"))
        .withColumnRenamed("seg", "dim_seg")
      cust.join(broadcast(dim), col("seg") <=> col("dim_seg"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n_cust"), max("seg_n").as("seg_n"))
        .orderBy(col("seg").asc_nulls_first)
    }),

    "text_readability" -> ((s, d) => {
      // Flesch-shaped readability from engine-portable integer proxies:
      // syllables ≈ vowel runs per word (regexp_extract_all count),
      // words per doc, chars per word. score = 206.835 − 1.015·(w/d)
      // − 84.6·(syl/w) with every ratio a single division of exact
      // BIGINT sums — the curation feature next to text_quality's
      // shape score. Per-lang aggregate report.
      val t = T.spread(T.documents(s, d))
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_w"),
          size(expr("regexp_extract_all(text, '[aeiou]+', 0)")).cast("long")
            .as("n_syl"))
      t.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_w").as("sw"),
          sum("n_syl").as("ss"))
        .select(col("lang"), col("n_docs"),
          expr("ROUND(206.835 - 1.015 * (sw / CAST(n_docs AS DOUBLE))" +
            " - 84.6 * (ss / CAST(sw AS DOUBLE)), 4)").as("flesch"),
          expr("ROUND(ss / CAST(sw AS DOUBLE), 4)").as("syl_per_word"))
        .orderBy("lang")
    }),

    "pipeline_content_hash" -> ((s, d) => {
      // dataset versioning primitive: an ORDER-INVARIANT content
      // fingerprint per source plus the corpus total (ROLLUP row) —
      // two corpus builds match iff their fingerprints do, regardless
      // of partitioning or row order. XOR of per-doc 60-bit md5s:
      // commutative, associative, overflow-free (a BIGINT SUM of 60-bit
      // hashes overflows at ~10⁶ docs — the xor is the correct fold at
      // any scale), and map-side combinable.
      val h = graft.ops.TextOps.md5Long(col("text"))
      T.spread(T.documents(s, d))
        .withColumn("h", h)
        .rollup("source")
        .agg(count(lit(1)).as("n_docs"),
          expr("bit_xor(h)").as("content_hash"))
        .select(coalesce(col("source"), lit("__total__")).as("source"),
          col("n_docs"), col("content_hash"))
        .orderBy("source")
    }),

    "agg_bool_aggs" -> ((s, d) => {
      // the boolean / conditional aggregate family: count_if,
      // bool_and, bool_or over order predicates — exact integer and
      // boolean outputs, oracled by their CASE-expression equivalents
      // (the oracle need not share the function surface, only the
      // semantics).
      T.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          expr("count_if(o_totalprice > 100000)").as("n_big"),
          expr("bool_and(o_totalprice > 0)").as("all_positive"),
          expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
          expr("count_if(o_custkey % 2 = 0)").as("n_even_cust"))
        .orderBy("o_orderstatus")
    }),

    "fn_hash_codecs" -> ((s, d) => {
      // the hash / codec scalar surface over supplier names: md5,
      // sha2-256, base64, uppercase hex, and a base64 decode roundtrip
      // flag — formats verified byte-identical across engines (base64
      // padding, hex case, hash hex case).
      T.supplier(s, d)
        .select(col("s_suppkey"),
          md5(col("s_name")).as("h_md5"),
          sha2(col("s_name"), 256).as("h_sha256"),
          base64(col("s_name").cast("binary")).as("b64"),
          hex(col("s_name").cast("binary")).as("hx"),
          (unbase64(base64(col("s_name").cast("binary"))).cast("string")
            === col("s_name")).as("rt_ok"))
        .orderBy("s_suppkey")
    }),

    "sim_hard_negatives" -> ((s, d) => {
      // hard-negative mining for retrieval training: for each probe
      // (the declared vec_id < 100 slice), the top-3 most-similar
      // vectors with a DIFFERENT label — the pairs a contrastive loss
      // needs most. Cosines quantize to micro-units (exact integer
      // ranking, the perplexity precedent); the rank≤3 filter is a
      // LITERAL limit so it compiles to WindowGroupLimit — each map
      // task forwards 3 candidates per probe, not its whole fan.
      import org.apache.spark.sql.expressions.Window
      graft.GraftFunctions.register(s)
      val e = T.spread(T.embeddings(s, d))
        .select(col("vec_id"), col("label"),
          graft.ops.VectorOps.unit(
            graft.ops.VectorOps.toDouble(col("embedding"))).as("u"))
      val probes = e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("a"), col("label").as("label_a"),
          col("u").as("ua"))
      val w = Window.partitionBy("a").orderBy(col("m").desc, col("b"))
      e.filter(col("vec_id") >= 100).join(broadcast(probes), lit(true))
        .filter(col("label") =!= col("label_a"))
        .select(col("a"), col("label_a"), col("vec_id").as("b"),
          col("label").as("label_b"),
          expr("CAST(ROUND(graft_dot(ua, u) * 1e6) AS BIGINT)").as("m"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("a"), col("rank"), col("b"), col("label_a"),
          col("label_b"), expr("ROUND(m / 1e6, 4)").as("sim"))
        .orderBy("a", "rank")
    }),

    "dedup_keep_best" -> ((s, d) => {
      // dedup survivor POLICY: inside each exact-dup cluster (the
      // dedup_exact canonicalization), keep the HIGHEST-QUALITY copy,
      // not the arbitrary min-id one — the curation choice that decides
      // what the training corpus actually reads. Quality is the
      // text_quality score in integer basis points so the argmax
      // compares exact integers; the winner rides inside max(struct(
      // q_bps, doc_id)) — one hash aggregate, tie-safe, no window.
      // naive_doc (min id) ships alongside so the report shows where
      // the policy CHANGED the outcome.
      val toks = graft.ops.TextOps.tokens(col("text"))
      val canon = array_join(array_sort(array_distinct(
        graft.ops.TextOps.tokens(lower(trim(col("text")))))), " ")
      T.spread(T.documents(s, d))
        .withColumn("h", sha2(canon, 256))
        .withColumn("n_tok", size(toks).cast("double"))
        .withColumn("stop_ratio",
          size(filter(toks, t => t.isin("the", "a"))).cast("double") / col("n_tok"))
        .withColumn("avg_tok_len",
          (length(col("text")) - (col("n_tok") - 1)) / col("n_tok"))
        .withColumn("q_bps", expr(
          "CAST(ROUND((0.3 * LEAST(n_tok / 50, 1.0)" +
            " + 0.4 * (1.0 - stop_ratio)" +
            " + 0.3 * LEAST(avg_tok_len / 6, 1.0)) * 10000) AS BIGINT)"))
        .groupBy("h")
        .agg(count(lit(1)).as("n"),
          max(struct(col("q_bps"), col("doc_id"))).as("best"),
          min(col("doc_id")).as("naive_doc"))
        .filter(col("n") > 1)
        .select(col("h"), col("n"),
          col("best.doc_id").as("keep_doc"),
          col("best.q_bps").as("keep_q_bps"),
          col("naive_doc"))
        .orderBy("h")
    }),

    "pipeline_lineage_mask" -> ((s, d) => {
      // pipeline observability: each doc carries a bitmask of which
      // curation gates it passes (lang / length / quality / token
      // floor), and the report is the path histogram — which gate
      // COMBINATIONS hold the corpus, the first question when a funnel
      // loses volume. Pure integer map pass + one aggregate; shares are
      // exact integer basis points against a 1-row broadcast total.
      val toks = graft.ops.TextOps.tokens(col("text"))
      val masked = T.spread(T.documents(s, d))
        .withColumn("n_tok", size(toks).cast("double"))
        .withColumn("stop_ratio",
          size(filter(toks, t => t.isin("the", "a"))).cast("double") / col("n_tok"))
        .withColumn("avg_tok_len",
          (length(col("text")) - (col("n_tok") - 1)) / col("n_tok"))
        .withColumn("q_bps", expr(
          "CAST(ROUND((0.3 * LEAST(n_tok / 50, 1.0)" +
            " + 0.4 * (1.0 - stop_ratio)" +
            " + 0.3 * LEAST(avg_tok_len / 6, 1.0)) * 10000) AS BIGINT)"))
        .withColumn("mask", expr(
          "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END" +
            " + CASE WHEN n_chars BETWEEN 150 AND 450 THEN 2 ELSE 0 END" +
            " + CASE WHEN q_bps >= 6000 THEN 4 ELSE 0 END" +
            " + CASE WHEN n_tok >= 30 THEN 8 ELSE 0 END AS INT)"))
      val hist = masked.groupBy("mask").agg(count(lit(1)).as("n"))
      val tot = hist.agg(sum("n").as("n_total"))
      hist.crossJoin(broadcast(tot))
        .select(col("mask"), col("n"),
          expr("(10000 * n) DIV n_total").as("share_bps"))
        .orderBy("mask")
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
        |FROM q ORDER BY lang""".stripMargin,

    "quality_profile" ->
      """WITH a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_key,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd_key,
        |    CAST(MIN(o_orderkey) AS DOUBLE) AS mn_key,
        |    CAST(MAX(o_orderkey) AS DOUBLE) AS mx_key,
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_cust,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_cust,
        |    CAST(MIN(o_custkey) AS DOUBLE) AS mn_cust,
        |    CAST(MAX(o_custkey) AS DOUBLE) AS mx_cust,
        |    CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_tp,
        |    CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd_tp,
        |    MIN(o_totalprice) AS mn_tp, MAX(o_totalprice) AS mx_tp,
        |    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_dt,
        |    CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS nd_dt,
        |    CAST(MIN(epoch_us(o_orderdate)) AS DOUBLE) AS mn_dt,
        |    CAST(MAX(epoch_us(o_orderdate)) AS DOUBLE) AS mx_dt,
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_st,
        |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd_st,
        |    MIN(o_orderstatus) AS mn_st, MAX(o_orderstatus) AS mx_st,
        |    CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_pr,
        |    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd_pr,
        |    MIN(o_orderpriority) AS mn_pr, MAX(o_orderpriority) AS mx_pr
        |  FROM orders)
        |SELECT n_rows, col, nulls, n_distinct, min_num, max_num, min_str, max_str
        |FROM (
        |  SELECT n_rows, 'o_orderkey' AS col, nu_key AS nulls, nd_key AS n_distinct,
        |         mn_key AS min_num, mx_key AS max_num,
        |         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
        |  UNION ALL
        |  SELECT n_rows, 'o_custkey', nu_cust, nd_cust, mn_cust, mx_cust, NULL, NULL FROM a
        |  UNION ALL
        |  SELECT n_rows, 'o_totalprice', nu_tp, nd_tp, mn_tp, mx_tp, NULL, NULL FROM a
        |  UNION ALL
        |  SELECT n_rows, 'o_orderdate_us', nu_dt, nd_dt, mn_dt, mx_dt, NULL, NULL FROM a
        |  UNION ALL
        |  SELECT n_rows, 'o_orderstatus', nu_st, nd_st, NULL, NULL, mn_st, mx_st FROM a
        |  UNION ALL
        |  SELECT n_rows, 'o_orderpriority', nu_pr, nd_pr, NULL, NULL, mn_pr, mx_pr FROM a)
        |ORDER BY col""".stripMargin,

    "sim_label_separation" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |         list_transform(
        |           list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |           x -> x / sqrt(list_dot_product(
        |                  list_transform(embedding, y -> CAST(y AS DOUBLE)),
        |                  list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS u
        |  FROM embeddings),
        |p AS (SELECT vec_id AS a, label AS la, u AS ua FROM e WHERE vec_id < 100),
        |m AS (
        |  SELECT p.la, (x.label = p.la) AS same_label,
        |         CAST(ROUND(list_dot_product(p.ua, x.u) * 1e6) AS BIGINT) AS m
        |  FROM e x CROSS JOIN p
        |  WHERE x.vec_id >= 100)
        |SELECT la AS label, same_label, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       ROUND(CAST(SUM(m) AS DOUBLE) / (COUNT(*) * 1e6), 4) AS avg_cos
        |FROM m GROUP BY la, same_label
        |ORDER BY label, same_label""".stripMargin,

    // replays the identical integer IPF: ppm cell masses, truncating
    // BIGINT division against the partitioned margin sums (windowed
    // SUM casts back to BIGINT each step — DuckDB SUM(BIGINT) is
    // HUGEINT, the ts_changepoint float64-fetch class), same four
    // half-steps, same sqrt-temperature lang targets
    "sample_mixture_ipf" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2),
        |lt AS (
        |  SELECT lang, CAST(FLOOR(SQRT(CAST(SUM(n) AS DOUBLE))) AS BIGINT) AS sq
        |  FROM cells GROUP BY 1),
        |lt2 AS (
        |  SELECT lang, CAST((sq * 1000000) // (SELECT CAST(SUM(sq) AS BIGINT) FROM lt) AS BIGINT) AS t_lang
        |  FROM lt),
        |st0 AS (SELECT CAST(1000000 // COUNT(DISTINCT source) AS BIGINT) AS t_src FROM cells),
        |m0 AS (
        |  SELECT c.lang, c.source, c.n,
        |         CAST((c.n * 1000000) // GREATEST((SELECT CAST(SUM(n) AS BIGINT) FROM cells), 1) AS BIGINT) AS m,
        |         l.t_lang, (SELECT t_src FROM st0) AS t_src
        |  FROM cells c JOIN lt2 l USING (lang)),
        |m1 AS (SELECT lang, source, n, CAST((m * t_lang) // GREATEST(CAST(SUM(m) OVER (PARTITION BY lang) AS BIGINT), 1) AS BIGINT) AS m, t_lang, t_src FROM m0),
        |m2 AS (SELECT lang, source, n, CAST((m * t_src) // GREATEST(CAST(SUM(m) OVER (PARTITION BY source) AS BIGINT), 1) AS BIGINT) AS m, t_lang, t_src FROM m1),
        |m3 AS (SELECT lang, source, n, CAST((m * t_lang) // GREATEST(CAST(SUM(m) OVER (PARTITION BY lang) AS BIGINT), 1) AS BIGINT) AS m, t_lang, t_src FROM m2),
        |m4 AS (SELECT lang, source, n, CAST((m * t_src) // GREATEST(CAST(SUM(m) OVER (PARTITION BY source) AS BIGINT), 1) AS BIGINT) AS m, t_lang, t_src FROM m3)
        |SELECT lang, source, n AS n_docs, m AS weight_ppm
        |FROM m4 ORDER BY lang, source""".stripMargin,

    "sample_neyman" ->
      """WITH st AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS nh,
        |         CAST(SUM(n_chars) AS BIGINT) AS s1,
        |         CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
        |  FROM documents GROUP BY lang),
        |w AS (
        |  SELECT lang, nh,
        |         SQRT(s2 / CAST(nh AS DOUBLE) - (s1 / CAST(nh AS DOUBLE)) * (s1 / CAST(nh AS DOUBLE))) AS sigma
        |  FROM st),
        |q AS (
        |  SELECT lang, nh, sigma,
        |         CAST(ROUND(nh * sigma * 1e6) AS BIGINT) AS wq
        |  FROM w),
        |tot AS (SELECT CAST(SUM(wq) AS BIGINT) AS wtot FROM q)
        |SELECT lang, nh AS n_docs, ROUND(sigma, 4) AS sigma,
        |       CAST(FLOOR(1e3 * wq / wtot) AS BIGINT) AS alloc_n,
        |       CAST(FLOOR(1e4 * wq / wtot) AS BIGINT) AS alloc_bps
        |FROM q CROSS JOIN tot ORDER BY lang""".stripMargin,

    "join_null_safe" ->
      """WITH cust AS (
        |  SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer),
        |dim AS (
        |  SELECT seg, CAST(COUNT(*) AS BIGINT) AS seg_n FROM cust GROUP BY seg)
        |SELECT c.seg, CAST(COUNT(*) AS BIGINT) AS n_cust, MAX(d.seg_n) AS seg_n
        |FROM cust c JOIN dim d ON c.seg IS NOT DISTINCT FROM d.seg
        |GROUP BY c.seg
        |ORDER BY c.seg NULLS FIRST""".stripMargin,

    "text_readability" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       ROUND(206.835 - 1.015 * (SUM(n_w) / CAST(COUNT(*) AS DOUBLE))
        |             - 84.6 * (SUM(n_syl) / CAST(SUM(n_w) AS DOUBLE)), 4) AS flesch,
        |       ROUND(SUM(n_syl) / CAST(SUM(n_w) AS DOUBLE), 4) AS syl_per_word
        |FROM (SELECT lang,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_w,
        |             CAST(len(regexp_extract_all(text, '[aeiou]+', 0)) AS BIGINT) AS n_syl
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "pipeline_content_hash" -> {
      val h = graft.ops.TextOps.md5LongSql("text")
      s"""WITH d AS (SELECT source, $h AS h FROM documents),
         |per AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(bit_xor(h) AS BIGINT) AS content_hash
         |  FROM d GROUP BY source),
         |tot AS (
         |  SELECT '__total__' AS source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(bit_xor(h) AS BIGINT) AS content_hash
         |  FROM d)
         |SELECT * FROM per UNION ALL SELECT * FROM tot
         |ORDER BY source""".stripMargin
    },

    "agg_bool_aggs" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |       MIN(o_totalprice > 0) AS all_positive,
        |       MAX(o_orderpriority = '1-URGENT') AS any_urgent,
        |       CAST(SUM(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even_cust
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "fn_hash_codecs" ->
      """SELECT s_suppkey,
        |       md5(s_name) AS h_md5,
        |       sha256(s_name) AS h_sha256,
        |       to_base64(encode(s_name)) AS b64,
        |       hex(encode(s_name)) AS hx,
        |       (decode(from_base64(to_base64(encode(s_name)))) = s_name) AS rt_ok
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "sim_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |         list_transform(
        |           list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |           x -> x / sqrt(list_dot_product(
        |                  list_transform(embedding, y -> CAST(y AS DOUBLE)),
        |                  list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS u
        |  FROM embeddings),
        |p AS (SELECT vec_id AS a, label AS label_a, u AS ua FROM e WHERE vec_id < 100),
        |cand AS (
        |  SELECT p.a, p.label_a, x.vec_id AS b, x.label AS label_b,
        |         CAST(ROUND(list_dot_product(p.ua, x.u) * 1e6) AS BIGINT) AS m
        |  FROM e x CROSS JOIN p
        |  WHERE x.vec_id >= 100 AND x.label <> p.label_a),
        |r AS (
        |  SELECT a, label_a, b, label_b, m,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY a
        |           ORDER BY m DESC, b) AS INT) AS rank
        |  FROM cand)
        |SELECT a, rank, b, label_a, label_b, ROUND(m / 1e6, 4) AS sim
        |FROM r WHERE rank <= 3 ORDER BY a, rank""".stripMargin,

    "dedup_keep_best" ->
      """WITH q AS (
        |  SELECT doc_id,
        |         sha256(array_to_string(list_sort(list_distinct(
        |           string_split(lower(trim(text)), ' '))), ' ')) AS h,
        |         CAST(ROUND((0.3 * LEAST(n_tok / 50, 1.0)
        |                   + 0.4 * (1.0 - stop_ratio)
        |                   + 0.3 * LEAST(avg_tok_len / 6, 1.0)) * 10000) AS BIGINT) AS q_bps
        |  FROM (SELECT doc_id, text,
        |               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        |               CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
        |                 / len(string_split(text, ' ')) AS stop_ratio,
        |               (LENGTH(text) - (len(string_split(text, ' ')) - 1))
        |                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_tok_len
        |        FROM documents)),
        |r AS (
        |  SELECT h, doc_id, q_bps,
        |         ROW_NUMBER() OVER (PARTITION BY h
        |           ORDER BY q_bps DESC, doc_id DESC) AS rk,
        |         COUNT(*) OVER (PARTITION BY h) AS n,
        |         MIN(doc_id) OVER (PARTITION BY h) AS naive_doc
        |  FROM q)
        |SELECT h, CAST(n AS BIGINT) AS n, doc_id AS keep_doc,
        |       q_bps AS keep_q_bps, naive_doc
        |FROM r WHERE rk = 1 AND n > 1
        |ORDER BY h""".stripMargin,

    "pipeline_lineage_mask" ->
      """WITH q AS (
        |  SELECT lang, n_chars, n_tok,
        |         CAST(ROUND((0.3 * LEAST(n_tok / 50, 1.0)
        |                   + 0.4 * (1.0 - stop_ratio)
        |                   + 0.3 * LEAST(avg_tok_len / 6, 1.0)) * 10000) AS BIGINT) AS q_bps
        |  FROM (SELECT lang, n_chars,
        |               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        |               CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
        |                 / len(string_split(text, ' ')) AS stop_ratio,
        |               (LENGTH(text) - (len(string_split(text, ' ')) - 1))
        |                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_tok_len
        |        FROM documents)),
        |m AS (
        |  SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END
        |       + CASE WHEN n_chars BETWEEN 150 AND 450 THEN 2 ELSE 0 END
        |       + CASE WHEN q_bps >= 6000 THEN 4 ELSE 0 END
        |       + CASE WHEN n_tok >= 30 THEN 8 ELSE 0 END AS INT) AS mask
        |  FROM q),
        |hist AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS n FROM m GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM hist)
        |SELECT mask, n, (10000 * n) // n_total AS share_bps
        |FROM hist CROSS JOIN tot ORDER BY mask""".stripMargin
  )
}
