package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** Round-12 batch 3 — retrieval scoring, exact order-statistics, and
  * series diagnostics that round out the training-data-pipeline surface:
  *
  *  - `text_bm25`        Okapi BM25 top-k retrieval over the corpus
  *  - `agg_weighted_median` exact weighted median in DECIMAL cents
  *  - `win_rolling_median`  exact rolling 7-day median (aggregate-then-window)
  *  - `ts_autocorr`      lag-k autocorrelation from exact integer sums
  *
  * Parity strategy per the house rules: every double that crosses an
  * aggregation boundary is either quantized to integer micro-units
  * first (bm25 — the perplexity precedent) or replaced outright by
  * DECIMAL/BIGINT arithmetic (weighted median in cents, autocorr from
  * Σx/Σxy/Σx² BIGINTs), so no fold-order-sensitive double summation
  * exists anywhere and the only libm call is the accepted LN precedent.
  */
object Ext4Queries extends QueryPack {

  /** JL random-projection sign matrix (8 × 64, entries ±1), derived
    * from MD5("k:j") parity ON THE DRIVER at object init and inlined
    * into BOTH engines as literals — zero cross-engine hash exposure,
    * and any seed change is automatically consistent. */
  private val JlOut = 8
  private val JlDim = 64
  private val jlSigns: IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    IndexedSeq.tabulate(JlOut, JlDim) { (k, j) =>
      val h = md.digest(s"$k:$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1 else -1
    }
  }
  /** yy = Σ y_k², written once as a fixed left-assoc chain so both
    * engines fold in the identical order. */
  private val jlYy = (0 until JlOut).map(k => s"y$k * y$k").mkString(" + ")
  /** per-vector distortion ratio quantized to integer micro-units —
    * the perplexity precedent again: per-label averaging is then an
    * exact BIGINT sum, not a fold-order-sensitive double sum. */
  private val jlMicro =
    s"CAST(ROUND(($jlYy) / $JlOut.0 / xx * 1e6) AS BIGINT)"

  /** BM25 constants (k1 = 1.2, b = 0.75) and the fixed query — the
    * 'en' signature words, guaranteed corpus hits. */
  private val bm25Terms = Seq("order", "window", "group")

  /** Per-(doc, term) BM25 partial score in integer micro-units. SHARED
    * VERBATIM with the DuckDB oracle (the Sql-fragment precedent) so
    * both engines evaluate the identical IEEE expression tree; LN is
    * the accepted cross-libm risk, everything after it is deterministic
    * double arithmetic on identical inputs, quantized before the
    * per-doc sum so accumulation is an exact BIGINT add.
    */
  private val bm25Micro =
    // the idf ratio must be DOUBLE/DOUBLE on both engines: with plain
    // `0.5` Spark types it DECIMAL/DECIMAL (decimal division, reduced
    // scale) while DuckDB casts to DOUBLE and divides IEEE — an
    // ulp-level ratio difference can flip the *1e6 ROUND at a .5
    // boundary. `0.5e0` is an exponent literal = DOUBLE in both
    // engines, and n_docs is cast explicitly, so the shared fragment
    // really is one IEEE expression tree (r12 ADVICE).
    "CAST(ROUND(LN(1 + (CAST(n_docs AS DOUBLE) - df + 0.5e0) / (df + 0.5e0))" +
      " * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6) AS BIGINT)"

  val queries: Map[String, QueryFn] = Map(
    "text_bm25" -> ((s, d) => {
      // Okapi BM25 top-20 for a fixed 3-term query. Scale shape: one
      // tokenize pass feeds BOTH the per-doc length table (map-side
      // partial count) and the query-term tf table — the tf aggregate
      // runs on rows already filtered to the 3 query terms, so the
      // shuffle carries only matching (doc, term) pairs, not the corpus.
      // df / N / avgdl are a 3-row and a 1-row broadcast; the dl join
      // keys on doc_id (hash join both sides at 100 TB — the tf side is
      // the docs-containing-a-query-term slice, already minimal).
      val tok = T.spread(T.documents(s, d))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val qtok = tok.filter(col("term").isin(bm25Terms: _*))
      val tf = qtok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = qtok.groupBy("term").agg(countDistinct("doc_id").as("df"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_tok"))
        .select(col("n_docs"),
          expr("CAST(n_tok AS DOUBLE) / n_docs").as("avgdl"))
      tf.join(broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("m", expr(bm25Micro))
        .groupBy("doc_id")
        .agg(sum("m").as("score_m"), count(lit(1)).as("n_terms"))
        .select(col("doc_id"), col("n_terms"), col("score_m"),
          round(col("score_m") / 1e6, 4).as("score"))
        .orderBy(col("score_m").desc, col("doc_id"))
        .limit(20)
    }),

    "agg_weighted_median" -> ((s, d) => {
      // exact weighted median of l_quantity weighted by net revenue,
      // per return flag — the "what quantity does half the revenue sit
      // below" distributional stat. All mass arithmetic is DECIMAL
      // (exact at any fold order); the half-total comparison is
      // 2·cum ≥ tot so no division ever happens. Aggregate-then-window:
      // the cumsum window runs over the (flag × distinct qty) table,
      // ~50 rows per flag at any corpus size.
      // r18 (guide §2.5): the DECIMAL multiply/round ran in the 1-task
      // single-row-group scan (sf1: 9.3 s one task, 20 empty) — spread
      // the 4 needed columns so the per-row decimal work and the
      // partial aggregate fold wide; ~150 groups shuffle after.
      val wq = T.spread(T.lineitem(s, d)
          .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount"))
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(expr(s"SUM(${graft.Sql.lineNetDec})").as("w"))
      val byFlag = Window.partitionBy("l_returnflag")
      val cum = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      wq.withColumn("tot", sum("w").over(byFlag))
        .withColumn("cum", sum("w").over(cum))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy("l_returnflag")
        .agg(min("l_quantity").as("w_median"),
          max(col("tot").cast("double")).as("total_net"))
        .orderBy("l_returnflag")
    }),

    "win_rolling_median" -> ((s, d) => {
      // exact rolling 7-day median of daily order revenue. Revenue is
      // an exact DECIMAL sum converted to integer CENTS, the window
      // frame collects ≤7 BIGINTs over the AGGREGATED daily table
      // (|days| rows — never raw orders), and the even-count midpoint
      // is kept as (a+b) so the only double is one final BIGINT/200.0
      // division: IEEE-identical in both engines, no ROUND needed.
      val daily = T.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(expr(
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)")
          .as("cents"))
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      daily.withColumn("win", sort_array(collect_list(col("cents")).over(w)))
        .withColumn("n", size(col("win")))
        .withColumn("med_x2", expr(
          // integer DIV, not `/` (Spark's `/` on ints yields DOUBLE);
          // DIV returns BIGINT and element_at needs INT, hence the casts
          "CASE WHEN n % 2 = 1 THEN element_at(win, CAST((n + 1) DIV 2 AS INT)) * 2 " +
            "ELSE element_at(win, CAST(n DIV 2 AS INT)) " +
            "   + element_at(win, CAST(n DIV 2 + 1 AS INT)) END"))
        .select(col("day"), col("n"),
          (col("cents").cast("double") / 100.0).as("revenue"),
          (col("med_x2").cast("double") / 200.0).as("med7"))
        .orderBy("day")
    }),

    "ts_autocorr" -> ((s, d) => {
      // lag-k autocorrelation (k = 1, 2, 3) of the daily event-count
      // series per event_type — the seasonality screen a forecasting
      // pipeline runs before model choice. Pairs come from lag(k) over
      // the aggregated daily table; r is assembled from six EXACT
      // BIGINT sums (n, Σx, Σy, Σxy, Σx², Σy²), so the only doubles
      // are the final Pearson ratio on identical integers — fully
      // engine-deterministic, then rounded to 4 dp.
      val daily = T.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val lagged = daily
        .select(col("event_type"), col("day"), col("x"),
          lag("x", 1).over(w).as("y1"),
          lag("x", 2).over(w).as("y2"),
          lag("x", 3).over(w).as("y3"))
      val perK = (1 to 3).map { k =>
        lagged.filter(col(s"y$k").isNotNull)
          .select(col("event_type"), lit(k).as("lag_k"),
            col("x"), col(s"y$k").as("y"))
      }.reduce(_.union(_))
      perK.groupBy("event_type", "lag_k")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"), col("lag_k"), col("n"),
          expr("ROUND((n * sxy - sx * sy) / " +
            "SQRT((CAST(n AS DOUBLE) * sxx - sx * sx) * " +
            "(CAST(n AS DOUBLE) * syy - sy * sy)), 4)").as("r"))
        .orderBy("event_type", "lag_k")
    }),

    "agg_moments" -> ((s, d) => {
      // skewness / excess kurtosis per return flag WITHOUT the built-in
      // skewness()/kurtosis() aggregates — their sample-vs-population
      // conventions differ between engines, and their double power sums
      // are fold-order sensitive. l_quantity is integer-VALUED, so the
      // raw power sums Σx..Σx⁴ are exact BIGINTs (x ≤ 50 ⇒ Σx⁴ ≤
      // ~4·10¹² at sf0.1 — far inside 2⁶³ and 2⁵³); the population
      // moments assemble from those exact integers in one shared
      // formula text, with m2^1.5 spelled m2·SQRT(m2) (sqrt is
      // correctly-rounded IEEE; pow is a libm call).
      val mom =
        "ROUND((s3 / CAST(n AS DOUBLE) - 3 * (s1 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE))" +
          " + 2 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))" +
          " / (m2 * SQRT(m2)), 4)"
      val kur =
        "ROUND((s4 / CAST(n AS DOUBLE) - 4 * (s1 / CAST(n AS DOUBLE)) * (s3 / CAST(n AS DOUBLE))" +
          " + 6 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE))" +
          " - 3 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))" +
          " / (m2 * m2) - 3, 4)"
      T.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("x"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("x").as("s1"),
          sum(col("x") * col("x")).as("s2"),
          sum(col("x") * col("x") * col("x")).as("s3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
        .withColumn("mean", expr("ROUND(s1 / CAST(n AS DOUBLE), 4)"))
        .withColumn("m2", expr(
          "s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))"))
        .select(col("l_returnflag"), col("n"), col("mean"),
          expr("ROUND(m2, 4)").as("var_pop"),
          expr(mom).as("skew"), expr(kur).as("kurt_excess"))
        .orderBy("l_returnflag")
    }),

    "graph_assortativity" -> ((s, d) => {
      // degree assortativity of the shared order-FK quotient graph —
      // do high-degree nodes link to high-degree nodes? (decides
      // whether hub-splitting matters for the wedge shuffles). Each
      // undirected edge contributes both orientations (the standard
      // symmetric estimator); Pearson r assembles from exact BIGINT
      // sums over the (edge ⋈ degree ⋈ degree) stream — the
      // ts_autocorr device pointed at graph structure.
      val edges = T.orders(s, d).select(
        pmod(col("o_custkey"), lit(1000L)).as("src"),
        pmod(col("o_orderkey"), lit(1000L)).as("dst"))
      val und = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val deg = und.select(col("a").as("node"))
        .union(und.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val dirPairs = und.select(col("a"), col("b"))
        .union(und.select(col("b").as("a"), col("a").as("b")))
      dirPairs
        .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
        .agg(count(lit(1)).as("m"), sum("da").as("sx"), sum("db").as("sy"),
          sum(col("da") * col("db")).as("sxy"),
          sum(col("da") * col("da")).as("sxx"),
          sum(col("db") * col("db")).as("syy"))
        .select(col("m"),
          expr("ROUND((m * sxy - sx * sy) / " +
            "SQRT((CAST(m AS DOUBLE) * sxx - sx * sx) * " +
            "(CAST(m AS DOUBLE) * syy - sy * sy)), 4)").as("r"))
    }),

    "ts_drawdown" -> ((s, d) => {
      // running maximum drawdown of daily order revenue — the metric-
      // regression detector (how far below its historical peak is the
      // series, and what was the worst excursion). Revenue is exact
      // integer cents; peak is a running max over the |days| aggregate;
      // drawdown is INTEGER basis points (10⁴·(peak−cur)) DIV peak —
      // no doubles anywhere except the display column.
      val daily = T.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(expr(
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)")
          .as("cents"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      daily.withColumn("peak", max("cents").over(w))
        .withColumn("dd_bps", expr("(10000 * (peak - cents)) DIV peak"))
        .select(col("day"),
          (col("cents").cast("double") / 100.0).as("revenue"),
          (col("peak").cast("double") / 100.0).as("peak_rev"),
          col("dd_bps"))
        .orderBy("day")
    }),

    "text_js_divergence" -> ((s, d) => {
      // Jensen–Shannon divergence between every pair of per-lang
      // unigram LMs — the symmetric, bounded corpus-drift distance
      // (KL blows up on one-sided words; JSD doesn't). Work is
      // vocab-sized: per-(lang, word) counts aggregate map-side, each
      // word meets its ≤C(5,2) lang pairs in a word-keyed self-join,
      // never a corpus pass. One-sided words contribute p·ln2 exactly,
      // folded in closed form as ln2·(1 − Σ_common p) so only COMMON
      // words need rows. Per-word terms and masses quantize to
      // nano-units before the pair sums (exact BIGINT accumulation;
      // the declared semantics are the quantized JSD — both engines
      // compute identical integers; LN is the accepted libm precedent).
      val tok = T.spread(T.documents(s, d))
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val wl = tok.groupBy("lang", "w").agg(count(lit(1)).as("c"))
      val nl = wl.groupBy("lang").agg(sum("c").as("nt"))
      val probs = wl.join(broadcast(nl), "lang")
        .select(col("lang"), col("w"),
          expr("c / CAST(nt AS DOUBLE)").as("p"))
      val a = probs.select(col("lang").as("la"), col("w"), col("p").as("pa"))
      val b = probs.select(col("lang").as("lb"), col("w"), col("p").as("pb"))
      a.join(b, "w").filter(col("la") < col("lb"))
        .select(col("la"), col("lb"),
          expr("CAST(ROUND(pa * LN(2 * pa / (pa + pb)) * 1e9) AS BIGINT)").as("ta"),
          expr("CAST(ROUND(pb * LN(2 * pb / (pa + pb)) * 1e9) AS BIGINT)").as("tb"),
          expr("CAST(ROUND(pa * 1e9) AS BIGINT)").as("pan"),
          expr("CAST(ROUND(pb * 1e9) AS BIGINT)").as("pbn"))
        .groupBy("la", "lb")
        .agg(count(lit(1)).as("n_common"), sum("ta").as("sta"),
          sum("tb").as("stb"), sum("pan").as("spa"), sum("pbn").as("spb"))
        .select(col("la"), col("lb"), col("n_common"),
          expr("ROUND((sta + stb + LN(2) * ((1e9 - spa) + (1e9 - spb))) / 2e9, 6)")
            .as("jsd"))
        .orderBy("la", "lb")
    }),

    "win_skyline" -> ((s, d) => {
      // Pareto frontier (skyline) of parts: minimize p_retailprice,
      // maximize p_size. NOT an all-pairs dominance join and NOT a
      // window over raw parts: prices collapse to integer cents first
      // (groupBy price → max size, a partial aggregate), the running
      // strictly-cheaper max-size window runs over the |distinct
      // prices| table, and frontier membership joins back to parts as
      // a hash join. A part is on the frontier iff it carries its
      // price's max size AND that beats every strictly cheaper price's
      // best size (covers equal-size-cheaper and same-price-bigger
      // domination; exact ties survive together, the skyline contract).
      val parts = T.part(s, d)
        .withColumn("price_c",
          expr("CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)) * 100) AS BIGINT)"))
      val best = parts.groupBy("price_c").agg(max("p_size").as("msize"))
      val w = Window.orderBy("price_c").rowsBetween(Window.unboundedPreceding, -1)
      val frontier = best
        .withColumn("prevmax", max("msize").over(w))
        .filter(col("prevmax").isNull || col("msize") > col("prevmax"))
      parts.join(frontier, "price_c")
        .filter(col("p_size") === col("msize"))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy("p_retailprice", "p_partkey")
    }),

    "agg_argmax" -> ((s, d) => {
      // tie-SAFE argmax/argmin: max_by is nondeterministic under ties,
      // so the argument rides inside the comparison key — max(struct(
      // price, key)) picks the largest key among tied prices in BOTH
      // engines (the oracle spells the same semantics as a rank-1
      // window). One hash aggregate, no window over raw rows.
      T.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          max(struct(col("o_totalprice"), col("o_orderkey"))).as("mx"),
          min(struct(col("o_totalprice"), col("o_orderkey"))).as("mn"))
        .select(col("o_orderstatus"),
          col("mx.o_orderkey").as("top_key"),
          col("mx.o_totalprice").as("top_price"),
          col("mn.o_orderkey").as("bot_key"),
          col("mn.o_totalprice").as("bot_price"))
        .orderBy("o_orderstatus")
    }),

    "sample_class_balance" -> ((s, d) => {
      // class-balanced downsampling of the embedding corpus to the
      // MINORITY class size — the long-tail rebalance before training a
      // classifier head. Exact-m-per-class would need a full per-class
      // sort (no literal K ⇒ no WindowGroupLimit), so the declared
      // semantics are sample_temperature's: an INTEGER basis-point
      // acceptance threshold rate_bps = ⌊10⁴·min_n/n_l⌋ per class
      // against the portable md5 bucket — a map-side filter behind two
      // broadcast joins (per-class counts, 1-row min), deterministic
      // and engine-identical at any scale.
      import graft.ops.TextOps
      val e = T.spread(T.embeddings(s, d))
      val byLabel = e.groupBy("label").agg(count(lit(1)).as("n_before"))
      val mn = byLabel.agg(min("n_before").as("min_n"))
      val rates = byLabel.crossJoin(broadcast(mn))
        .select(col("label"), col("n_before"),
          // FLOOR, not bare CAST: Spark CAST(double→long) truncates but
          // DuckDB's rounds — FLOOR is the engine-identical spelling.
          // 1e4 (exponent literal = DOUBLE both engines), not 10000.0:
          // a plain decimal literal makes Spark divide DECIMAL/DECIMAL
          // while DuckDB divides IEEE (the bm25Micro class, r12 ADVICE)
          expr("CAST(FLOOR(1e4 * min_n / n_before) AS BIGINT)").as("rate_bps"))
      e.join(broadcast(rates), "label")
        .filter(pmod(TextOps.md5Long(col("vec_id").cast("string")), lit(10000L))
          < col("rate_bps"))
        .groupBy("label", "n_before", "rate_bps")
        .agg(count(lit(1)).as("n_after"))
        .select(col("label"), col("n_before"), col("rate_bps"), col("n_after"))
        .orderBy("label")
    }),

    "sim_random_projection" -> ((s, d) => {
      // Johnson–Lindenstrauss ±1 random projection 64→8 (the dim
      // reduction in front of LSH/clustering at 100 TB: 8× less shuffle
      // per vector) with a per-label distortion audit — how well
      // ||proj(x)||²/8 preserves ||x||². The sign matrix is a driver-
      // side literal (no cross-engine hashing); each y_k is ONE
      // graft_dot fold (codegen'd, same sequential order as DuckDB's
      // list_dot_product); the distortion ratio quantizes to micro-
      // units before the per-label average so aggregation is exact.
      graft.GraftFunctions.register(s)
      val sgn = (k: Int) => array(jlSigns(k).map(v => lit(v.toDouble)): _*)
      var df = T.spread(T.embeddings(s, d))
        .select(col("vec_id"), col("label"),
          graft.ops.VectorOps.toDouble(col("embedding")).as("v"))
        .withColumn("xx", expr("graft_dot(v, v)"))
        .filter(col("xx") > 0)
      for (k <- 0 until JlOut)
        df = df.withColumn(s"y$k",
          graft.GraftFunctions.dotCol(s, col("v"), sgn(k)))
      df.withColumn("micro", expr(jlMicro))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), sum("micro").as("sm"),
          min("micro").as("lo_m"), max("micro").as("hi_m"))
        .select(col("label"), col("n"),
          expr("ROUND(CAST(sm AS DOUBLE) / (n * 1e6), 4)").as("avg_ratio"),
          expr("ROUND(lo_m / 1e6, 4)").as("min_ratio"),
          expr("ROUND(hi_m / 1e6, 4)").as("max_ratio"))
        .orderBy("label")
    }),

    "text_bpe_train" -> ((s, d) => {
      // BPE tokenizer-training pair mining, two merge rounds. The 100 TB
      // shape is the point: pair counting runs over the VOCAB (distinct
      // word × corpus frequency — Zipf-small at any scale), never the
      // token stream; round 2 applies merge #1 to the vocab and
      // recounts. Merge application is DECLARED as left-to-right
      // non-overlapping string replace over the space-joined symbol
      // sequence (both engines' replace() semantics — textbook BPE
      // differs only on runs like "aaa", an accepted approximation
      // documented here). Output: top-10 pairs per round, exact BIGINT
      // weights, tie-break pair-lexicographic.
      val tok = T.spread(T.documents(s, d))
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
      val vocab = tok.groupBy("word").agg(count(lit(1)).as("n"))
        .withColumn("seq", concat_ws(" ",
          expr("regexp_extract_all(word, '.', 0)")))
      def pairCounts(v: org.apache.spark.sql.DataFrame) = v
        .select(col("n"), explode(graft.ops.TextOps.shingles(
          split(col("seq"), " "), 2)).as("pair"))
        .groupBy("pair").agg(sum("n").as("w"))
      val r1 = pairCounts(vocab)
      val top1 = r1.orderBy(col("w").desc, col("pair")).limit(1)
        .select(col("pair").as("m_pair"))
      val vocab2 = vocab.crossJoin(broadcast(top1))
        .withColumn("seq", expr(
          // trim: the sentinel spaces must not become empty symbols in
          // the round-2 split
          "trim(replace(' ' || seq || ' ', ' ' || m_pair || ' ', " +
            "' ' || replace(m_pair, ' ', '') || ' '))"))
      val r2 = pairCounts(vocab2)
      r1.withColumn("round", lit(1))
        .orderBy(col("w").desc, col("pair")).limit(10)
        .union(r2.withColumn("round", lit(2))
          .orderBy(col("w").desc, col("pair")).limit(10))
        .select(col("round"), col("pair"), col("w"))
        .orderBy(col("round"), col("w").desc, col("pair"))
    }),

    "quality_kappa" -> ((s, d) => {
      // Cohen's kappa agreement between two weak labelers (annotation
      // QA for auto-curated corpora): A = char-length bucket, B =
      // token-count bucket. Confusion counts are exact BIGINTs per
      // (lang, a, b); p_o and p_e assemble from integer marginal
      // products, so the only double is the final kappa ratio —
      // engine-identical — rounded to 4 dp. All joins run on the
      // |langs × 3|-row marginal tables.
      val lab = T.spread(T.documents(s, d))
        .withColumn("n_tok", size(split(col("text"), " ")))
        .withColumn("a", when(col("n_chars") < 220, "short")
          .when(col("n_chars") < 380, "mid").otherwise("long"))
        .withColumn("b", when(col("n_tok") < 45, "short")
          .when(col("n_tok") < 70, "mid").otherwise("long"))
      val conf = lab.groupBy("lang", "a", "b").agg(count(lit(1)).as("c"))
      val tot = conf.groupBy("lang").agg(sum("c").as("n"))
      val diag = conf.filter(col("a") === col("b"))
        .groupBy("lang").agg(sum("c").as("agree"))
      val rowm = conf.groupBy("lang", "a").agg(sum("c").as("ra"))
      val colm = conf.groupBy("lang", "b").agg(sum("c").as("cb"))
      val pe = rowm.join(colm,
          rowm("lang") === colm("lang") && rowm("a") === colm("b"))
        .groupBy(rowm("lang").as("lang"))
        .agg(sum(col("ra") * col("cb")).as("pe_num"))
      tot.join(diag, Seq("lang"), "left").join(pe, Seq("lang"), "left")
        .select(col("lang"), col("n"),
          coalesce(col("agree"), lit(0L)).as("agree"),
          expr("ROUND((CAST(coalesce(agree, 0) AS DOUBLE) / n - " +
            "CAST(coalesce(pe_num, 0) AS DOUBLE) / (n * n)) / " +
            "(1.0 - CAST(coalesce(pe_num, 0) AS DOUBLE) / (n * n)), 4)")
            .as("kappa"))
        .orderBy("lang")
    }),

    "ts_mom_yoy" -> ((s, d) => {
      // month-over-month / year-over-year revenue growth — the
      // reporting staple. Monthly revenue is an exact DECIMAL cent sum;
      // growth is ONE double division of exact BIGINTs, rounded 4 dp.
      // lag(1)/lag(12) over the |months| aggregate.
      val monthly = T.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(expr(
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)")
          .as("cents"))
      val w = Window.orderBy("month")
      monthly
        .withColumn("prev_m", lag("cents", 1).over(w))
        .withColumn("prev_y", lag("cents", 12).over(w))
        .select(col("month"),
          (col("cents").cast("double") / 100.0).as("revenue"),
          expr("ROUND((cents - prev_m) / CAST(prev_m AS DOUBLE), 4)").as("mom"),
          expr("ROUND((cents - prev_y) / CAST(prev_y AS DOUBLE), 4)").as("yoy"))
        .orderBy("month")
    }),

    "agg_gini" -> ((s, d) => {
      // Gini coefficient of customer revenue concentration per nation —
      // the inequality audit a curation pipeline runs on source
      // contribution (here on the richer orders⋈customer data). Revenue
      // aggregates to exact cents per customer FIRST; the rank window
      // is partitioned by nation over that per-customer table; S1 =
      // Σ i·xᵢ stays BIGINT; G = 2·S1/(n·S) − (n+1)/n touches doubles
      // only in the final two divisions on exact integers (tie-order
      // invariant: equal x contribute identically under any rank order).
      val rev = T.orders(s, d)
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("c_custkey"))
        .agg(expr(
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)")
          .as("x"))
      val w = Window.partitionBy("n_name").orderBy("x", "c_custkey")
      rev.withColumn("i", row_number().over(w))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"), sum("x").as("s"),
          sum(col("i") * col("x")).as("s1"))
        .select(col("n_name"), col("n_cust"),
          (col("s").cast("double") / 100.0).as("total_rev"),
          expr("ROUND(2.0 * s1 / (CAST(n_cust AS DOUBLE) * s) " +
            "- (n_cust + 1.0) / n_cust, 4)").as("gini"))
        .orderBy("n_name")
    })
  )

  private val qtermsIn = bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")

  val oracleSql: Map[String, String] = Map(
    "text_bm25" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
         |), t2 AS (SELECT * FROM tok WHERE term <> ''),
         |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t2 GROUP BY 1),
         |qt AS (SELECT * FROM t2 WHERE term IN $qtermsIn),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM qt GROUP BY 1, 2),
         |dfq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM qt GROUP BY 1),
         |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
         |scored AS (
         |  SELECT tf.doc_id, $bm25Micro AS m
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         |       CAST(SUM(m) AS BIGINT) AS score_m,
         |       ROUND(CAST(SUM(m) AS BIGINT) / 1e6, 4) AS score
         |FROM scored GROUP BY doc_id
         |ORDER BY score_m DESC, doc_id LIMIT 20""".stripMargin,

    "agg_weighted_median" ->
      s"""WITH wq AS (
         |  SELECT l_returnflag, l_quantity, SUM(${graft.Sql.lineNetDec}) AS w
         |  FROM lineitem GROUP BY 1, 2),
         |c AS (
         |  SELECT l_returnflag, l_quantity, w,
         |         SUM(w) OVER (PARTITION BY l_returnflag) AS tot,
         |         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cum
         |  FROM wq)
         |SELECT l_returnflag, MIN(l_quantity) AS w_median,
         |       MAX(CAST(tot AS DOUBLE)) AS total_net
         |FROM c WHERE cum * 2 >= tot
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "win_rolling_median" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT day, cents,
        |         list_sort(list(cents) OVER
        |           (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        |  FROM daily),
        |m AS (
        |  SELECT day, cents, len(win) AS n,
        |         CASE WHEN len(win) % 2 = 1 THEN win[(len(win) + 1) // 2] * 2
        |              ELSE win[len(win) // 2] + win[len(win) // 2 + 1] END AS med_x2
        |  FROM r)
        |SELECT day, CAST(n AS INT) AS n,
        |       CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |       CAST(med_x2 AS DOUBLE) / 200.0 AS med7
        |FROM m ORDER BY day""".stripMargin,

    "ts_autocorr" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, day, x,
        |         LAG(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
        |         LAG(x, 2) OVER (PARTITION BY event_type ORDER BY day) AS y2,
        |         LAG(x, 3) OVER (PARTITION BY event_type ORDER BY day) AS y3
        |  FROM daily),
        |pairs AS (
        |  SELECT event_type, 1 AS lag_k, x, y1 AS y FROM lagged WHERE y1 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, 2, x, y2 FROM lagged WHERE y2 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, 3, x, y3 FROM lagged WHERE y3 IS NOT NULL),
        |sums AS (
        |  SELECT event_type, lag_k, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(x * y) AS BIGINT) AS sxy,
        |         CAST(SUM(x * x) AS BIGINT) AS sxx,
        |         CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM pairs GROUP BY 1, 2)
        |SELECT event_type, CAST(lag_k AS INT) AS lag_k, n,
        |       ROUND((n * sxy - sx * sy) /
        |             SQRT((CAST(n AS DOUBLE) * sxx - sx * sx) *
        |                  (CAST(n AS DOUBLE) * syy - sy * sy)), 4) AS r
        |FROM sums ORDER BY event_type, lag_k""".stripMargin,

    "agg_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x*x) AS BIGINT) AS s2,
        |         CAST(SUM(x*x*x) AS BIGINT) AS s3, CAST(SUM(x*x*x*x) AS BIGINT) AS s4
        |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x FROM lineitem)
        |  GROUP BY 1),
        |m AS (
        |  SELECT *, s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) AS m2
        |  FROM s)
        |SELECT l_returnflag, n, ROUND(s1 / CAST(n AS DOUBLE), 4) AS mean,
        |       ROUND(m2, 4) AS var_pop,
        |       ROUND((s3 / CAST(n AS DOUBLE) - 3 * (s1 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE)) + 2 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))) / (m2 * SQRT(m2)), 4) AS skew,
        |       ROUND((s4 / CAST(n AS DOUBLE) - 4 * (s1 / CAST(n AS DOUBLE)) * (s3 / CAST(n AS DOUBLE)) + 6 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE)) - 3 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))) / (m2 * m2) - 3, 4) AS kurt_excess
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "graph_assortativity" ->
      """WITH und AS (
        |  SELECT DISTINCT LEAST(o_custkey % 1000, o_orderkey % 1000) AS a,
        |         GREATEST(o_custkey % 1000, o_orderkey % 1000) AS b
        |  FROM orders
        |  WHERE o_custkey % 1000 <> o_orderkey % 1000),
        |deg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        |  GROUP BY node),
        |dp AS (
        |  SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
        |j AS (
        |  SELECT da.deg AS da, db.deg AS db
        |  FROM dp JOIN deg da ON dp.a = da.node JOIN deg db ON dp.b = db.node),
        |su AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |         CAST(SUM(da) AS BIGINT) AS sx, CAST(SUM(db) AS BIGINT) AS sy,
        |         CAST(SUM(da * db) AS BIGINT) AS sxy,
        |         CAST(SUM(da * da) AS BIGINT) AS sxx,
        |         CAST(SUM(db * db) AS BIGINT) AS syy
        |  FROM j)
        |SELECT m, ROUND((m * sxy - sx * sy) /
        |       SQRT((CAST(m AS DOUBLE) * sxx - sx * sx) *
        |            (CAST(m AS DOUBLE) * syy - sy * sy)), 4) AS r
        |FROM su""".stripMargin,

    "ts_drawdown" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT day, cents,
        |         MAX(cents) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM daily)
        |SELECT day, CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |       CAST(peak AS DOUBLE) / 100.0 AS peak_rev,
        |       (10000 * (peak - cents)) // peak AS dd_bps
        |FROM p ORDER BY day""".stripMargin,

    "text_js_divergence" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
        |wl AS (
        |  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok WHERE w <> '' GROUP BY 1, 2),
        |nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS nt FROM wl GROUP BY 1),
        |probs AS (
        |  SELECT wl.lang, wl.w, c / CAST(nt AS DOUBLE) AS p
        |  FROM wl JOIN nl ON wl.lang = nl.lang),
        |pairs AS (
        |  SELECT a.lang AS la, b.lang AS lb,
        |         CAST(ROUND(a.p * LN(2 * a.p / (a.p + b.p)) * 1e9) AS BIGINT) AS ta,
        |         CAST(ROUND(b.p * LN(2 * b.p / (a.p + b.p)) * 1e9) AS BIGINT) AS tb,
        |         CAST(ROUND(a.p * 1e9) AS BIGINT) AS pan,
        |         CAST(ROUND(b.p * 1e9) AS BIGINT) AS pbn
        |  FROM probs a JOIN probs b ON a.w = b.w AND a.lang < b.lang),
        |su AS (
        |  SELECT la, lb, CAST(COUNT(*) AS BIGINT) AS n_common,
        |         CAST(SUM(ta) AS BIGINT) AS sta, CAST(SUM(tb) AS BIGINT) AS stb,
        |         CAST(SUM(pan) AS BIGINT) AS spa, CAST(SUM(pbn) AS BIGINT) AS spb
        |  FROM pairs GROUP BY 1, 2)
        |SELECT la, lb, n_common,
        |       ROUND((sta + stb + LN(2) * ((1e9 - spa) + (1e9 - spb))) / 2e9, 6) AS jsd
        |FROM su ORDER BY la, lb""".stripMargin,

    "win_skyline" ->
      """WITH parts AS (
        |  SELECT p_partkey, p_retailprice, p_size,
        |         CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS price_c
        |  FROM part),
        |best AS (
        |  SELECT price_c, MAX(p_size) AS msize FROM parts GROUP BY 1),
        |f AS (
        |  SELECT price_c, msize,
        |         MAX(msize) OVER (ORDER BY price_c
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |  FROM best)
        |SELECT p.p_partkey, p.p_retailprice, p.p_size
        |FROM parts p JOIN f USING (price_c)
        |WHERE (f.prevmax IS NULL OR f.msize > f.prevmax) AND p.p_size = f.msize
        |ORDER BY p.p_retailprice, p.p_partkey""".stripMargin,

    "agg_argmax" ->
      """WITH r AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |           ORDER BY o_totalprice DESC, o_orderkey DESC) AS rt,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |           ORDER BY o_totalprice ASC, o_orderkey ASC) AS rb
        |  FROM orders)
        |SELECT t.o_orderstatus,
        |       t.o_orderkey AS top_key, t.o_totalprice AS top_price,
        |       b.o_orderkey AS bot_key, b.o_totalprice AS bot_price
        |FROM (SELECT * FROM r WHERE rt = 1) t
        |JOIN (SELECT * FROM r WHERE rb = 1) b USING (o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin,

    "sample_class_balance" -> {
      val h = graft.ops.TextOps.md5LongSql("CAST(vec_id AS VARCHAR)")
      s"""WITH bl AS (
         |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_before
         |  FROM embeddings GROUP BY 1),
         |mn AS (SELECT MIN(n_before) AS min_n FROM bl),
         |rates AS (
         |  SELECT label, n_before,
         |         CAST(FLOOR(1e4 * min_n / n_before) AS BIGINT) AS rate_bps
         |  FROM bl CROSS JOIN mn),
         |kept AS (
         |  SELECT e.label FROM embeddings e JOIN rates r USING (label)
         |  WHERE $h % 10000 < r.rate_bps)
         |SELECT r.label, r.n_before, r.rate_bps,
         |       CAST(COUNT(*) AS BIGINT) AS n_after
         |FROM kept k JOIN rates r USING (label)
         |GROUP BY 1, 2, 3 ORDER BY r.label""".stripMargin
    },

    "sim_random_projection" -> {
      val vd = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
      val ys = (0 until JlOut).map { k =>
        val lits = jlSigns(k).map(v => s"$v.0").mkString("[", ", ", "]")
        s"list_dot_product(v, $lits) AS y$k"
      }.mkString(",\n        |         ")
      s"""WITH e AS (
         |  SELECT vec_id, label, $vd AS v FROM embeddings),
         |p AS (
         |  SELECT vec_id, label, list_dot_product(v, v) AS xx,
         |         $ys
         |  FROM e),
         |m AS (
         |  SELECT label, $jlMicro AS micro FROM p WHERE xx > 0)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         |       ROUND(CAST(SUM(micro) AS DOUBLE) / (COUNT(*) * 1e6), 4) AS avg_ratio,
         |       ROUND(MIN(micro) / 1e6, 4) AS min_ratio,
         |       ROUND(MAX(micro) / 1e6, 4) AS max_ratio
         |FROM m GROUP BY label ORDER BY label""".stripMargin
    },

    "text_bpe_train" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |vocab AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n,
        |         array_to_string(regexp_extract_all(word, '.'), ' ') AS seq
        |  FROM tok WHERE word <> '' GROUP BY word),
        |p1 AS (
        |  SELECT pair, CAST(SUM(n) AS BIGINT) AS w
        |  FROM (SELECT n, unnest(list_transform(range(1, len(t)),
        |               i -> t[i] || ' ' || t[i+1])) AS pair
        |        FROM (SELECT n, string_split(seq, ' ') AS t FROM vocab))
        |  GROUP BY pair),
        |m1 AS (SELECT pair AS m_pair FROM p1 ORDER BY w DESC, pair LIMIT 1),
        |vocab2 AS (
        |  SELECT n, trim(replace(' ' || seq || ' ', ' ' || m_pair || ' ',
        |                    ' ' || replace(m_pair, ' ', '') || ' ')) AS seq
        |  FROM vocab CROSS JOIN m1),
        |p2 AS (
        |  SELECT pair, CAST(SUM(n) AS BIGINT) AS w
        |  FROM (SELECT n, unnest(list_transform(range(1, len(t)),
        |               i -> t[i] || ' ' || t[i+1])) AS pair
        |        FROM (SELECT n, string_split(seq, ' ') AS t FROM vocab2))
        |  GROUP BY pair),
        |u AS (
        |  SELECT 1 AS round, pair, w FROM (SELECT * FROM p1 ORDER BY w DESC, pair LIMIT 10)
        |  UNION ALL
        |  SELECT 2, pair, w FROM (SELECT * FROM p2 ORDER BY w DESC, pair LIMIT 10))
        |SELECT CAST(round AS INT) AS round, pair, w
        |FROM u ORDER BY round, w DESC, pair""".stripMargin,

    "quality_kappa" ->
      """WITH lab AS (
        |  SELECT lang,
        |         CASE WHEN n_chars < 220 THEN 'short'
        |              WHEN n_chars < 380 THEN 'mid' ELSE 'long' END AS a,
        |         CASE WHEN len(string_split(text, ' ')) < 45 THEN 'short'
        |              WHEN len(string_split(text, ' ')) < 70 THEN 'mid'
        |              ELSE 'long' END AS b
        |  FROM documents),
        |conf AS (SELECT lang, a, b, CAST(COUNT(*) AS BIGINT) AS c
        |         FROM lab GROUP BY 1, 2, 3),
        |tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM conf GROUP BY 1),
        |diag AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS agree
        |         FROM conf WHERE a = b GROUP BY 1),
        |rowm AS (SELECT lang, a, CAST(SUM(c) AS BIGINT) AS ra FROM conf GROUP BY 1, 2),
        |colm AS (SELECT lang, b, CAST(SUM(c) AS BIGINT) AS cb FROM conf GROUP BY 1, 2),
        |pe AS (
        |  SELECT rowm.lang, CAST(SUM(ra * cb) AS BIGINT) AS pe_num
        |  FROM rowm JOIN colm ON rowm.lang = colm.lang AND rowm.a = colm.b
        |  GROUP BY 1)
        |SELECT t.lang, t.n, COALESCE(d.agree, 0) AS agree,
        |       ROUND((CAST(coalesce(d.agree, 0) AS DOUBLE) / t.n -
        |              CAST(coalesce(pe.pe_num, 0) AS DOUBLE) / (t.n * t.n)) /
        |             (1.0 - CAST(coalesce(pe.pe_num, 0) AS DOUBLE) / (t.n * t.n)), 4) AS kappa
        |FROM tot t LEFT JOIN diag d USING (lang) LEFT JOIN pe USING (lang)
        |ORDER BY t.lang""".stripMargin,

    "ts_mom_yoy" ->
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |lagged AS (
        |  SELECT month, cents,
        |         LAG(cents, 1) OVER (ORDER BY month) AS prev_m,
        |         LAG(cents, 12) OVER (ORDER BY month) AS prev_y
        |  FROM monthly)
        |SELECT month, CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |       ROUND((cents - prev_m) / CAST(prev_m AS DOUBLE), 4) AS mom,
        |       ROUND((cents - prev_y) / CAST(prev_y AS DOUBLE), 4) AS yoy
        |FROM lagged ORDER BY month""".stripMargin,

    "agg_gini" ->
      """WITH rev AS (
        |  SELECT n.n_name, c.c_custkey,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS x
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT n_name, x,
        |         ROW_NUMBER() OVER (PARTITION BY n_name
        |           ORDER BY x, c_custkey) AS i
        |  FROM rev)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |       CAST(SUM(x) AS DOUBLE) / 100.0 AS total_rev,
        |       ROUND(2.0 * SUM(i * x) / (CAST(COUNT(*) AS DOUBLE) * SUM(x))
        |             - (COUNT(*) + 1.0) / COUNT(*), 4) AS gini
        |FROM ranked GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
