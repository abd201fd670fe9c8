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
  *   - Count-Min: the frequency-estimation counterpart to KMV — a
  *     d×w counter grid that answers "how often did item x occur"
  *     in O(d) lookups with a one-sided (never-under) error, again
  *     deterministic by construction (portable md5 row-hashes) and
  *     therefore fully DuckDB-oracled.
  */
object SketchQueries extends QueryPack {

  /** agg_bloom_det's filter geometry and probe-bit derivation, shared
    * with SemanticsSpec so the FP/union pins can never drift from the
    * filter the query actually builds: k = 3 Kirsch–Mitzenmacher
    * positions b_i = (h1 + i·h2) mod m from ONE 60-bit md5
    * (h1 = low 30 bits, h2 = 2·high30 + 1 — odd, so the three bits
    * are pairwise distinct mod the power-of-two m).
    */
  private[graft] val bloomM = 4096L
  private[graft] def bloomProbeBits(key: org.apache.spark.sql.Column) = {
    import graft.ops.TextOps
    val h = TextOps.md5Long(concat(lit("bf:"), key))
    val h1 = pmod(h, lit(1073741824L))
    val h2 = shiftright(h, 30) * lit(2L) + lit(1L)
    array((0 until 3).map(i => pmod(h1 + lit(i.toLong) * h2, lit(bloomM))): _*)
  }

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
      val hashed = T.spread(T.events(s, d))
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
      val exact = T.spread(T.events(s, d))
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
    }),

    // KMV set algebra — the reason mergeable sketches exist: estimate
    // |A∪B| and |A∩B| between two user populations FROM THEIR SKETCHES
    // ALONE (union sketch = k smallest of the two k-sets' union, ≤2k
    // rows — no raw rescan; intersection via the ratio estimator
    // ρ = |union-sample ∩ A ∩ B|/k, where membership of a union-sample
    // hash in a side is EXACTLY answered by that side's own k-set:
    // h ≤ kth(A∪B) ≤ kth(A) since A ⊆ A∪B). At 100 TB each segment
    // keeps a 256-hash sketch and any pairwise overlap query runs on
    // driver-size inputs. Same portable md5 hash as agg_distinct_kmv,
    // all-integer outputs, exact below k — fully DuckDB-replayed, with
    // the exact cardinalities alongside for graded error.
    "agg_kmv_setops" -> ((s, d) => {
      import graft.ops.TextOps
      val k = 256
      val types = Seq("click", "purchase")
      val hashed = T.spread(T.events(s, d))
        .filter(col("event_type").isin(types: _*))
        .select(col("event_type"),
          TextOps.md5Long(concat(lit("kmv:"), col("user_id"))).as("h"))
        .distinct()
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("h")
      val sk = hashed.withColumn("rk", row_number().over(wt))
        .filter(col("rk") <= k).select("event_type", "h")
      val wu = org.apache.spark.sql.expressions.Window.orderBy("h")
      val uk = sk.select("h").distinct()
        .withColumn("rk", row_number().over(wu)).filter(col("rk") <= k)
        .select("h")
      val ustats = uk.agg(count(lit(1)).as("n_kept"), max("h").as("kth"))
      val estU = when(col("n_kept") < k, col("n_kept"))
        .otherwise(floor(lit((k - 1).toDouble * math.pow(2, 60)) / col("kth")))
        .cast("long")
      val both = uk
        .join(sk.filter(col("event_type") === "click").select(col("h")), Seq("h"))
        .join(sk.filter(col("event_type") === "purchase")
          .select(col("h").as("hb")), col("h") === col("hb"))
        .agg(count(lit(1)).as("n_both"))
      val ex = T.spread(T.events(s, d)).filter(col("event_type").isin(types: _*))
        .groupBy("user_id")
        .agg(countDistinct("event_type").as("nt"),
          max(when(col("event_type") === "click", 1).otherwise(0)).as("ia"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("ib"))
        .agg(sum("ia").cast("long").as("a_exact"),
          sum("ib").cast("long").as("b_exact"),
          count(lit(1)).as("union_exact"),
          sum(when(col("nt") === 2, 1L).otherwise(0L)).as("inter_exact"))
      ex.crossJoin(ustats).crossJoin(both)
        .select(col("a_exact"), col("b_exact"),
          col("union_exact"), col("inter_exact"), estU.as("union_est"),
          floor((col("n_both") * estU).cast("double") / lit(k.toDouble))
            .cast("long").as("inter_est"))
    }),

    // Deterministic Bloom filter — the membership sketch with a full
    // hash oracle, pairing the native agg_bloom_filter (TEST-only:
    // Catalyst's filter bytes are engine-private) the way agg_countmin
    // pairs approx_top_k. Build side = partkeys with p_size = 50 (a
    // naturally sparse ~2% slice); m = 4096 bits, k = 3 probes derived
    // from ONE portable 60-bit md5 by Kirsch–Mitzenmacher double
    // hashing — b_i = (h1 + i·h2) mod m with h1 = low 30 bits and
    // h2 = 2·(high 30 bits)+1 (odd, so coprime with the power-of-two m;
    // [Kirsch & Mitzenmacher 2006] shows g_i = h1 + i·h2 preserves the
    // asymptotic FP rate of k independent hashes) — one digest per
    // probe row instead of k; the filter is stored in the REAL Bloom layout — 4096 bits
    // packed into 64 BIGINT words (bit_or-folded per word, densified
    // over range(64)) on ONE broadcast row — which is the 100 TB
    // join-pruning shape: the probe side (every lineitem row) evaluates
    // membership MAP-SIDE as k O(1) word tests
    // (word[b DIV 64] & (1 << b%64), AND-folded over k), no shuffle of
    // non-matching rows and no per-row set scan (a first cut kept the
    // filter as a sorted position ARRAY and probed with array_except —
    // Catalyst rebuilds the ~900-element hash set PER ROW, O(rows·|bits|),
    // and it benched 15.6 s vs ~1 s for the word test — the
    // representation IS the operator here). Output is the (maybe, actual)
    // confusion matrix with row counts: (true,true) hits, (true,false)
    // the false positives the ~1.2% fill-rate theory predicts at sf0.1,
    // (false,false) pruned — and a (false,true) row CANNOT appear
    // (collisions only set bits, never clear them), which the oracle
    // enforces structurally: a false negative would emit a row the
    // replay does not have. The replay computes the same bits/probes
    // on DISTINCT keys (maybe/actual are key-functions) and weighs by
    // per-key row counts — arithmetically identical to Spark's
    // probe-per-row aggregation.
    "agg_bloom_det" -> ((s, d) => {
      import graft.ops.TextOps
      val m = bloomM
      def bitsOf(key: org.apache.spark.sql.Column) = bloomProbeBits(key)
      val build = T.part(s, d).filter(col("p_size") === 50)
        .select(col("p_partkey")).distinct()
      // pack set bits into 64 BIGINT words; densify over range(64) so
      // element_at is total, then fold the words into one ordered array
      val words = build.select(explode(bitsOf(col("p_partkey"))).as("b"))
        .groupBy(shiftright(col("b"), 6).cast("int").as("w"))
        .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(b % 64 AS INT))"))
          .as("word"))
      val bloom = s.range(64).select(col("id").cast("int").as("w"))
        .join(words, Seq("w"), "left")
        .agg(transform(array_sort(collect_list(struct(col("w"),
          coalesce(col("word"), lit(0L)).as("word")))), x => x("word"))
          .as("bitmap"))
      // Tables.spread: the per-row md5 probe over every lineitem row
      // otherwise runs on the single-row-group scan's one task (r17);
      // no-op at real scale. Project to the key FIRST so the spread
      // exchange moves 8-byte keys, not lineitem rows (guide §2.3).
      val probed = T.spread(T.lineitem(s, d).select(col("l_partkey")))
        .crossJoin(broadcast(bloom))
        .withColumn("h", TextOps.md5Long(concat(lit("bf:"), col("l_partkey"))))
        .withColumn("h1", pmod(col("h"), lit(1073741824L)))
        .withColumn("h2", shiftright(col("h"), 30) * lit(2L) + lit(1L))
        .withColumn("maybe", (0 until 3).map(i => expr(
          s"(element_at(bitmap, CAST(pmod(h1 + $i * h2, $m) DIV 64 AS INT) + 1) & " +
          s"shiftleft(CAST(1 AS BIGINT), CAST(pmod(h1 + $i * h2, $m) % 64 AS INT))) <> 0"))
          .reduce(_ && _))
      val actual = build.select(col("p_partkey").as("bk"))
      probed.join(broadcast(actual), col("l_partkey") === col("bk"), "left")
        .withColumn("actual", col("bk").isNotNull)
        .groupBy("maybe", "actual")
        .agg(count(lit(1)).cast("long").as("n_rows"))
        .orderBy("maybe", "actual")
    }),

    // Exact distributed quantiles in TWO PASSES — the deterministic
    // twin of the TEST-only agg_approx_quantile, and the shape exact
    // percentiles take at 100 TB where a global sort is off the table:
    // pass 1 histograms integer-cent prices into 4096 equi-width bins
    // (map-side partial aggregate over <= 4096 keys, one tiny shuffle);
    // the bin histogram + its running sum locate, for each target rank
    // k = ceil(q*n), the ONE bin holding it and the residual rank
    // inside that bin. Pass 2 re-scans with a broadcast semi-filter to
    // the <= 5 target bins (99.9% of rows dropped map-side), sorts only
    // those slices (row_number per target over ~n/4096 rows), and picks
    // the residual rank. No driver scalars: min/max and n ride as
    // 1-row/4096-row broadcasts. All arithmetic is integer (cents,
    // basis-point ranks via (q_bp*n + 9999) DIV 10000), so both
    // engines agree bit-for-bit; the oracle replays rank selection
    // directly (row_number = k), which is the DEFINITION the binning
    // must reproduce — ties across a bin boundary cannot split (equal
    // values share a bin), and the value at global rank k is unique
    // under any tie permutation.
    "agg_quantile_det" -> ((s, d) => {
      import s.implicits._
      val W = org.apache.spark.sql.expressions.Window
      val B = 4096L
      // r18 (guide §2.5 + recompute elimination): v is consumed three
      // times (min/max pass, histogram pass, target-bin join) and each
      // pass re-ran the 1-task single-row-group scan + the decimal
      // cast. Spread the projected 8-byte key, then PIN it (eager
      // executor-block checkpoint): one wide decode feeds all three
      // passes. At real scale the spread is a no-op and the pin is a
      // staged column — the two-pass selection's normal shape.
      val v = T.spread(T.lineitem(s, d).select(
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("c"))).localCheckpoint(true)
      val mm = v.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
      val binned = v.crossJoin(broadcast(mm))
        .withColumn("bin", expr(s"((c - lo) * $B) DIV (hi - lo + 1)"))
      val hist = binned.groupBy("bin").agg(count(lit(1)).as("cnt"))
      // windows over the <= 4096-row histogram, not the data
      val hist2 = hist
        .withColumn("cum_below", coalesce(sum("cnt").over(
          W.orderBy("bin").rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum("cnt").over(
          W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      val targets = Seq(2500, 5000, 7500, 9000, 9900).toDF("q_bp")
        .crossJoin(hist2)
        .withColumn("k", expr("(CAST(q_bp AS BIGINT) * n + 9999) DIV 10000"))
        .filter(col("cum_below") < col("k") &&
          col("k") <= col("cum_below") + col("cnt"))
        .select(col("q_bp"), col("n"), col("k"), col("bin"),
          (col("k") - col("cum_below")).as("rank_in_bin"))
      binned.join(broadcast(targets), Seq("bin"))
        .withColumn("rn", row_number().over(W.partitionBy("q_bp").orderBy("c")))
        .filter(col("rn") === col("rank_in_bin"))
        .select(col("q_bp"), col("n"), col("k"), col("c").as("value_cents"))
        .orderBy("q_bp")
    }),

    // Deterministic HyperLogLog — the REGISTER-based distinct sketch
    // with a full hash oracle, completing the deterministic sketch
    // trio (KMV = order statistics, Count-Min = frequency, HLL =
    // registers). Spark's native approx_count_distinct stays TEST-only
    // (HLL++ internals are engine-private), but the classic Flajolet
    // HLL is pure integer arithmetic on a portable hash, so every
    // intermediate replays in SQL: h = md5Long("hll:"+user), register
    // j = h mod 64, remainder w = h div 64 (54 bits), and the rank
    // rho = leading-zeros(w)+1 computed EXACTLY as the position of the
    // first '1' in lpad(bin(w),54,'0') — a string device, not libm, so
    // there is no log2 rounding-boundary risk (both engines' bin() is
    // minimal-width). Registers are max(rho) per (group, j) — a
    // two-level partial aggregate that folds map-side to ≤64 cells per
    // group, the textbook mergeable-sketch shape at 100 TB. The
    // harmonic sum stays integer by scaling: Z = Σ_j 2^(55−M[j]) (absent
    // registers contribute 2^55), so the only doubles are the final
    // estimator tree — raw = ⌊α₆₄·m²·2^55/Z⌋ spelled with exponent
    // literals as ONE shared IEEE tree, and the standard small-range
    // linear-counting branch est = ⌊m·LN(m/V)⌋ when raw ≤ 2.5m and
    // empty registers remain (LN = the accepted tfidf-precedent libm
    // risk; its integer inputs are identical on both engines). The
    // fixtures exercise BOTH branches: sf0.001/0.01 land in linear
    // counting, sf0.1 (1500 distinct users/group ≫ 160) in raw HLL.
    "agg_hll_det" -> ((s, d) => {
      import graft.ops.TextOps
      val base = T.spread(T.events(s, d))
        .select(col("event_type"),
          TextOps.md5Long(concat(lit("hll:"), col("user_id"))).as("h"))
        .selectExpr("event_type", "pmod(h, 64) AS j", "h DIV 64 AS w")
        .withColumn("rho",
          when(col("w") === 0L, lit(55))
            .otherwise(instr(lpad(bin(col("w")), 54, "0"), "1"))
            .cast("int"))
      val regs = base.groupBy("event_type", "j").agg(max("rho").as("mj"))
      val grouped = regs.groupBy("event_type").agg(
        count(lit(1)).cast("long").as("n_present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - mj)")).as("z_present"))
      val ex = T.spread(T.events(s, d)).groupBy("event_type")
        .agg(countDistinct("user_id").cast("long").as("n_exact"))
      grouped.join(ex, "event_type")
        .withColumn("v0", lit(64L) - col("n_present"))
        .withColumn("z", col("z_present") + col("v0") * lit(36028797018963968L))
        .withColumn("raw", expr(
          "CAST(FLOOR(7.09e-1 * 4.096e3 * (3.6028797018963968e16 / CAST(z AS DOUBLE))) AS BIGINT)"))
        .withColumn("hll_est", expr(
          "CASE WHEN v0 > 0 AND raw <= 160 " +
            "THEN CAST(FLOOR(6.4e1 * LN(6.4e1 / CAST(v0 AS DOUBLE))) AS BIGINT) " +
            "ELSE raw END"))
        .withColumn("err_bp", expr(
          "CAST(FLOOR(ABS(hll_est - n_exact) * 1e4 / CAST(n_exact AS DOUBLE)) AS BIGINT)"))
        .select("event_type", "n_exact", "hll_est", "err_bp")
        .orderBy("event_type")
    }),

    // Count-Min frequency sketch over the corpus token stream, probed
    // at the exact top-10 tokens. The sketch is a d=4 × w=64 counter
    // grid: each token increments one bucket per hash row, and
    // estimate(x) = min over rows of its bucket counts — ≥ the true
    // count always (collisions only ADD), within εN with probability
    // 1−δ (ε = e/w, δ = e^−d). The 100 TB shape is the whole point:
    // the grid is a partial aggregate — every map task folds its
    // token slice into ≤ d·w = 256 cells locally and the shuffle moves
    // cells, not tokens — and the probe side joins the 256-cell grid
    // as a broadcast. Deterministic md5 row-hashes make every
    // intermediate (grid cells included) SQL-replayable, so unlike the
    // native sketches this one carries a full hash oracle.
    "agg_countmin" -> ((s, d) => {
      import graft.ops.TextOps
      val dRows = 4
      val wBuckets = 64L
      def cellsOf(w: org.apache.spark.sql.Column) =
        array((0 until dRows).map(r =>
          struct(lit(r).as("r"),
            pmod(TextOps.md5Long(concat(lit(s"cm$r:"), w)),
              lit(wBuckets)).as("b"))): _*)
      // r18 (guide §2.5): both consumers (sketch build with 4 md5
      // hashes per token, exact top-10) re-ran split+explode inside the
      // 1-task single-row-group scan — spread the text column so the
      // tokenize/hash work folds wide in both passes.
      val toks = T.spread(T.documents(s, d).select(col("text")))
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val sketch = toks
        .select(explode(cellsOf(col("w"))).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val top = toks.groupBy("w").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("w")).limit(10)
      val probes = top
        .select(col("w"), col("n_exact"), explode(cellsOf(col("w"))).as("rb"))
        .select(col("w"), col("n_exact"),
          col("rb.r").as("r"), col("rb.b").as("b"))
      probes.join(broadcast(sketch), Seq("r", "b"))
        .groupBy("w", "n_exact")
        .agg(min("cnt").as("cm_est"))
        .withColumn("over_bp",
          floor((col("cm_est") - col("n_exact")) * lit(10000.0)
            / col("n_exact")).cast("long"))
        .orderBy(col("n_exact").desc, col("w"))
    }),

    // deterministic reservoir sample (r13 verdict #7b — the sampling
    // family's sketch row): a FIXED-SIZE per-group sample whose
    // membership is a pure function of the data, not of arrival order
    // or RNG state. The device: rank every doc within its group by the
    // portable md5 of its id and keep rank ≤ K — equivalent to a
    // reservoir of size K under the md5-induced random order, but
    // mergeable (any partition's top-K by hash union-merges to the
    // global top-K — the KMV property) and replayable in any engine.
    // The literal K compiles to WindowGroupLimit: each map task keeps
    // ≤ K rows per group BEFORE the shuffle, so the exchange moves
    // O(groups × K), never the corpus — the sketch-shaped plan
    // (PlanSpec pins the limit node for the rank≤K family).
    "agg_reservoir_det" -> ((s, d) => {
      import graft.ops.TextOps
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lang").orderBy(
        TextOps.md5Long(concat(lit("res:"), col("doc_id").cast("string"))),
        col("doc_id"))
      T.documents(s, d)
        .select(col("lang"), col("doc_id"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 32)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy("lang", "rk")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // replays bits/probes on DISTINCT keys (maybe/actual are functions
    // of the key) weighted by per-key row counts — identical totals to
    // Spark's probe-per-row fold. A Spark false negative would emit a
    // (false,true) row the replay cannot produce -> structural FN pin.
    "agg_bloom_det" ->
      """WITH build AS (
        |  SELECT DISTINCT p_partkey FROM part WHERE p_size = 50),
        |hs AS (SELECT unnest([0, 1, 2]) AS i),
        |bh AS (
        |  SELECT CAST(('0x' || substring(md5('bf:' || p_partkey), 1, 15)) AS BIGINT) AS h
        |  FROM build),
        |bits AS (
        |  SELECT DISTINCT
        |         (h % 1073741824 + hs.i * (2 * (h // 1073741824) + 1)) % 4096 AS b
        |  FROM bh CROSS JOIN hs),
        |keys AS (
        |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1),
        |kh AS (
        |  SELECT l_partkey,
        |         CAST(('0x' || substring(md5('bf:' || l_partkey), 1, 15)) AS BIGINT) AS h
        |  FROM keys),
        |kb AS (
        |  SELECT k.l_partkey,
        |         (h % 1073741824 + hs.i * (2 * (h // 1073741824) + 1)) % 4096 AS b
        |  FROM kh k CROSS JOIN hs),
        |hits AS (
        |  SELECT kb.l_partkey, CAST(COUNT(*) AS BIGINT) AS nhit
        |  FROM kb JOIN bits USING (b) GROUP BY 1),
        |flags AS (
        |  SELECT k.l_partkey, k.n,
        |         COALESCE(h.nhit, 0) = 3 AS maybe,
        |         (b2.p_partkey IS NOT NULL) AS actual
        |  FROM keys k
        |  LEFT JOIN hits h USING (l_partkey)
        |  LEFT JOIN build b2 ON k.l_partkey = b2.p_partkey)
        |SELECT maybe, actual, CAST(SUM(n) AS BIGINT) AS n_rows
        |FROM flags GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // replays rank selection DIRECTLY (row_number = k over the sorted
    // cents) — the definition the two-pass binning must reproduce;
    // identical integer k and decimal-cents device on both engines
    "agg_quantile_det" ->
      """WITH v AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |  FROM lineitem),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
        |qs AS (SELECT CAST(unnest([2500, 5000, 7500, 9000, 9900]) AS INT) AS q_bp),
        |t AS (SELECT q_bp, n, (CAST(q_bp AS BIGINT) * n + 9999) // 10000 AS k
        |      FROM qs CROSS JOIN nn),
        |r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v)
        |SELECT t.q_bp, t.n, t.k, r.c AS value_cents
        |FROM t JOIN r ON r.rn = t.k
        |ORDER BY q_bp""".stripMargin,

    // replays the register pipeline verbatim: same 60-bit md5 hash,
    // same mod-64 register split, rho via the identical lpad(bin(w))
    // string device (DuckDB strpos ≡ Spark instr, both 1-based/0-if-
    // absent and both bin()s minimal-width), integer-scaled harmonic
    // sum, and the one shared IEEE estimator tree. SUMs wrapped in
    // CAST(...AS BIGINT) — DuckDB SUM(BIGINT) is HUGEINT and fetches
    // as float64 otherwise (the ts_changepoint lesson).
    "agg_hll_det" ->
      """WITH h AS (
        |  SELECT event_type,
        |         CAST(('0x' || substring(md5('hll:' || user_id), 1, 15)) AS BIGINT) AS h
        |  FROM events),
        |rw AS (SELECT event_type, h % 64 AS j, h // 64 AS w FROM h),
        |rho AS (
        |  SELECT event_type, j,
        |         CASE WHEN w = 0 THEN 55
        |              ELSE strpos(lpad(bin(w), 54, '0'), '1') END AS rho
        |  FROM rw),
        |regs AS (SELECT event_type, j, MAX(rho) AS mj FROM rho GROUP BY 1, 2),
        |grp AS (
        |  SELECT event_type,
        |         CAST(COUNT(*) AS BIGINT) AS n_present,
        |         CAST(SUM(CAST(1 AS BIGINT) << (55 - mj)) AS BIGINT) AS z_present
        |  FROM regs GROUP BY 1),
        |ex AS (
        |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM events GROUP BY 1),
        |est AS (
        |  SELECT g.event_type, e.n_exact,
        |         64 - g.n_present AS v0,
        |         g.z_present + (64 - g.n_present) * 36028797018963968 AS z
        |  FROM grp g JOIN ex e USING (event_type)),
        |fin AS (
        |  SELECT event_type, n_exact, v0,
        |         CAST(FLOOR(7.09e-1 * 4.096e3 * (3.6028797018963968e16 / CAST(z AS DOUBLE))) AS BIGINT) AS raw
        |  FROM est),
        |picked AS (
        |  SELECT event_type, n_exact,
        |         CASE WHEN v0 > 0 AND raw <= 160
        |              THEN CAST(FLOOR(6.4e1 * LN(6.4e1 / CAST(v0 AS DOUBLE))) AS BIGINT)
        |              ELSE raw END AS hll_est
        |  FROM fin)
        |SELECT event_type, n_exact, hll_est,
        |       CAST(FLOOR(ABS(hll_est - n_exact) * 1e4 / CAST(n_exact AS DOUBLE)) AS BIGINT) AS err_bp
        |FROM picked ORDER BY event_type""".stripMargin,

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
        |FROM est ORDER BY event_type""".stripMargin,

    "agg_kmv_setops" ->
      """WITH hashed AS (
        |  SELECT DISTINCT event_type,
        |         CAST(('0x' || substring(md5('kmv:' || user_id), 1, 15)) AS BIGINT) AS h
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |sk AS (
        |  SELECT event_type, h FROM (
        |    SELECT event_type, h,
        |           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        |    FROM hashed) WHERE rk <= 256),
        |uk AS (
        |  SELECT h FROM (
        |    SELECT h, row_number() OVER (ORDER BY h) AS rk
        |    FROM (SELECT DISTINCT h FROM sk)) WHERE rk <= 256),
        |us AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS kth FROM uk),
        |nb AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_both FROM uk
        |  WHERE h IN (SELECT h FROM sk WHERE event_type = 'click')
        |    AND h IN (SELECT h FROM sk WHERE event_type = 'purchase')),
        |ex AS (
        |  SELECT CAST(SUM(ia) AS BIGINT) AS a_exact,
        |         CAST(SUM(ib) AS BIGINT) AS b_exact,
        |         CAST(COUNT(*) AS BIGINT) AS union_exact,
        |         CAST(SUM(CASE WHEN nt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS inter_exact
        |  FROM (SELECT user_id, COUNT(DISTINCT event_type) AS nt,
        |               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ia,
        |               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ib
        |        FROM events WHERE event_type IN ('click', 'purchase')
        |        GROUP BY user_id)),
        |est AS (
        |  SELECT CASE WHEN us.n_kept < 256 THEN us.n_kept
        |         ELSE CAST(floor(255.0 * 1152921504606846976.0 / us.kth) AS BIGINT)
        |         END AS union_est, nb.n_both
        |  FROM us, nb)
        |SELECT ex.a_exact, ex.b_exact, ex.union_exact, ex.inter_exact,
        |       est.union_est,
        |       CAST(floor(CAST(est.n_both * est.union_est AS DOUBLE) / 256.0) AS BIGINT) AS inter_est
        |FROM ex, est""".stripMargin,

    "agg_countmin" ->
      """WITH toks AS (
        |  SELECT w FROM (SELECT unnest(string_split(text, ' ')) AS w
        |                 FROM documents) t WHERE w <> ''),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |cells AS (
        |  SELECT rs.r,
        |         CAST(('0x' || substring(md5('cm' || rs.r || ':' || w), 1, 15)) AS BIGINT) % 64 AS b
        |  FROM toks CROSS JOIN rs),
        |sketch AS (
        |  SELECT r, b, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM cells GROUP BY r, b),
        |ex AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_exact
        |       FROM toks GROUP BY w),
        |top AS (SELECT w, n_exact FROM ex ORDER BY n_exact DESC, w LIMIT 10),
        |probes AS (
        |  SELECT t.w, t.n_exact, rs.r,
        |         CAST(('0x' || substring(md5('cm' || rs.r || ':' || t.w), 1, 15)) AS BIGINT) % 64 AS b
        |  FROM top t CROSS JOIN rs),
        |est AS (
        |  SELECT p.w, p.n_exact, MIN(s.cnt) AS cm_est
        |  FROM probes p JOIN sketch s ON p.r = s.r AND p.b = s.b
        |  GROUP BY p.w, p.n_exact)
        |SELECT w, n_exact, CAST(cm_est AS BIGINT) AS cm_est,
        |       CAST(floor((cm_est - n_exact) * 10000.0 / n_exact) AS BIGINT) AS over_bp
        |FROM est ORDER BY n_exact DESC, w""".stripMargin,

    "agg_reservoir_det" -> {
      val h = graft.ops.TextOps.md5LongSql("'res:' || CAST(doc_id AS VARCHAR)")
      s"""SELECT lang, CAST(rk AS INT) AS rk, doc_id FROM (
         |  SELECT lang, doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY $h, doc_id) AS rk
         |  FROM documents)
         |WHERE rk <= 32 ORDER BY lang, rk""".stripMargin
    }
  )
}
