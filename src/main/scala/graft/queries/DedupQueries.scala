package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}
import graft.ops.{MinHashLSH, TextOps}

/** SURVEY.md §2B category I (dedup half) — the training-pipeline
  * deduplication suite: exact (canonicalized-content hash), n-gram
  * Jaccard near-dup, SimHash buckets, and MinHash-LSH (TEST-only).
  *
  * Scale design: every oracled variant is a hash-partitioned groupBy or
  * an inverted-index join — deterministic and complete (no probabilistic
  * recall), so the DuckDB brute-force oracle matches exactly. The LSH
  * variant trades exactness for per-bucket blocking and is therefore
  * property-tested instead of oracled.
  */
object DedupQueries extends QueryPack {

  /** shingles in more docs than this are dropped from Jaccard sets
    * (blocking DF cap — see dedup_jaccard_pairs). */
  val HotShingleDfCap = 64

  /** The capped-Jaccard pair mining feeds BOTH dedup_jaccard_pairs and
    * dedup_cluster_cc, and one session runs both (Verify, Bench, the
    * driver harness) — so the mined (a, b, j) table is memoized via
    * [[graft.SessionMemo]] (this mining is the pattern's original
    * instance; round 8 extracted it for the span-dedup family): the
    * ~3 s pipeline runs once per (session, sf dir) and the second
    * consumer reads cached partitions.
    */
  private def minedPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SessionMemo(s, s"jaccard-pairs:$d")(minePairs(s, d))

  /** exact 3-shingle Jaccard ≥ 0.5 pairs (a < b) — see the
    * dedup_jaccard_pairs entry for the plan rationale. `private[graft]`
    * so PlanSpec pins the RAW mining plan: the memoized query key plans
    * as an InMemoryTableScan whose cached subtree `collect` never
    * traverses, which would make a no-cartesian pin on the query
    * vacuous.
    */
  private[graft] def minePairs(s: org.apache.spark.sql.SparkSession, d: String) =
    minePairBase(s, d)
      .withColumn("j", round(col("inter").cast("double")
        / (col("sza") + col("szb") - col("inter")), 4))
      .filter(col("j") >= 0.5)
      .select("a", "b", "j")

  /** the shared capped-shingle pair mining: every co-sharing pair
    * `a < b` with its shared-shingle count and both set sizes —
    * Jaccard (minePairs) and the overlap coefficient
    * (dedup_containment) are both one map-side expression over this
    * table, so the inverted-index pipeline exists once. */
  private[graft] def minePairBase(s: org.apache.spark.sql.SparkSession, d: String) =
    // Tables.spread: the shingle explode + md5 otherwise run on the
    // single-row-group scan's one task (r17); no-op at real scale
    minePairBaseOn(T.spread(T.documents(s, d)))

  /** same mining over an arbitrary (doc_id, text) corpus —
    * dedup_containment feeds it the excerpt-seeded corpus. */
  private[graft] def minePairBaseOn(corpus: org.apache.spark.sql.DataFrame) = {
    // shingles reduce to their portable 60-bit md5 at birth (r14, the
    // text_dup_spans lesson): downstream they are only GROUP/JOIN keys
    // and per-doc COUNTS, so every shuffle of this — the slowest batch
    // family — moves 8-byte longs instead of ~25-char strings. The
    // distinct runs over the HASHES on both engines (the oracle CTEs
    // hash identically), so the vanishing collision class merges the
    // same sets on both sides and sz/inter stay consistent.
    val docs = corpus
      .select(col("doc_id"), array_distinct(transform(
        TextOps.shingles(TextOps.tokens(col("text")), 3),
        TextOps.md5Long(_))).as("sh"))
    val inv0 = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    // DF cap via count-window over the SAME hash(s) exchange that the
    // per-shingle grouping below consumes — the shingle explode runs
    // once and the exchange is reused, where a cap-filter join plus
    // an index self-join recomputed the shingle pipeline per branch
    // (measured ~2× on this, the slowest batch key).
    val inv = inv0
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("df") <= HotShingleDfCap)
    val sizes = inv.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // pair generation from the capped per-shingle posting lists: each
    // list is ≤ HotShingleDfCap docs, so a shingle emits at most
    // C(cap,2) ordered pairs — the quadratic bound is explicit and
    // local to one codegen'd higher-order expression, not a self-join
    val lists = inv.groupBy("s").agg(array_sort(collect_list("doc_id")).as("ds"))
    val inter = lists.select(explode(expr(
        "flatten(transform(ds, (x, i) -> " +
          "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.toDF("a", "sza")), "a")
      .join(broadcast(sizes.toDF("b", "szb")), "b")
  }

  val queries: Map[String, QueryFn] = Map(
    "dedup_exact" -> ((s, d) => {
      // exact dedup on canonicalized content: lowercase, tokenize,
      // sort+dedupe tokens, sha256. Groups >1 are duplicate clusters;
      // MIN(doc_id) is the surviving representative.
      val canon = array_join(array_sort(array_distinct(
        TextOps.tokens(lower(trim(col("text")))))), " ")
      // Tables.spread: tokenize+sort+sha256 per doc otherwise runs on
      // the single-row-group scan's one task (r17); no-op at real scale
      T.spread(T.documents(s, d))
        .withColumn("h", sha2(canon, 256))
        .groupBy("h")
        .agg(count(lit(1)).as("n"), min("doc_id").as("rep_doc"))
        .filter(col("n") > 1)
        .orderBy("h")
    }),

    "dedup_jaccard_pairs" -> ((s, d) => {
      // near-dup pairs with exact 3-shingle Jaccard ≥ 0.5 via an
      // inverted shingle index (complete: J>0 pairs must share a
      // shingle). |a∩b| falls straight out of the index join as the
      // shared-shingle count, so Jaccard needs only the two set sizes —
      // no array re-join, no per-pair set intersection. One shuffle on
      // shingle, one on (a,b), two broadcast joins of the tiny size
      // table.
      //
      // Capped semantics (declared, both engines): shingles appearing
      // in more than HotShingleDfCap documents are dropped from the
      // sets BEFORE sizes/intersections — a corpus-hot shingle carries
      // no near-dup signal but creates a C(df,2) quadratic bucket in
      // the index self-join (the 100 TB killer; standard blocking DF
      // cap). The fixture's max df is 25, so the cap is semantically
      // inert at test scale while bounding every bucket at any scale.
      // Mining body lives in minePairs; memoized via minedPairs so
      // dedup_cluster_cc consumes the same persisted pair table.
      minedPairs(s, d).orderBy("a", "b")
    }),

    "dedup_containment" -> ((s, d) => {
      // doc-in-doc detection: the overlap coefficient
      // |A∩B| / min(|A|,|B|) flags a small document embedded in a big
      // one (boilerplate, quoted articles, page-of-a-book) — exactly
      // the pairs Jaccard DILUTES, because the union in its denominator
      // is dominated by the big doc. The synthetic corpus carries no
      // natural partial containment, so (the PII-scrub seeding
      // precedent) a deterministic excerpt corpus is ingested first on
      // BOTH engines: the %29 slice re-enters as its own first-40%-of-
      // tokens excerpt under an out-of-range id. Each excerpt's shingle
      // run is contiguous in its parent, so ov(excerpt, parent) = 1.0
      // while their Jaccard ~0.4 sits BELOW dedup_jaccard_pairs' 0.5
      // floor — the asymmetric measure finds precisely what the
      // symmetric one cannot. Same capped inverted-index mining
      // (complete: ov > 0 requires a shared shingle; the DF cap bounds
      // every posting-list bucket), then the coefficient is one
      // map-side expression over (inter, sza, szb). Decision on the
      // 4-dp ROUNDED value, so both engines keep identical pair sets.
      // Tables.spread: the excerpt-seeded corpus feeds the same shingle
      // mining as minePairBase — spread once here so both union branches
      // tokenize in parallel (r17); no-op at real scale
      val docs = T.spread(T.documents(s, d))
      val base = docs.agg(max("doc_id")).head.getLong(0) + 1L
      val toks = TextOps.tokens(col("text"))
      val excerpts = docs.filter(col("doc_id") % 29 === 0)
        .select((col("doc_id") + base).as("doc_id"),
          array_join(slice(toks, lit(1), greatest(lit(3),
            floor(size(toks) * lit(2) / lit(5)).cast("int"))), " ").as("text"))
      minePairBaseOn(docs.select("doc_id", "text").unionByName(excerpts))
        .withColumn("ov", round(col("inter").cast("double")
          / least(col("sza"), col("szb")), 4))
        .filter(col("ov") >= 0.8)
        .select(col("a"), col("b"), col("inter"), col("ov"))
        .orderBy("a", "b")
    }),

    "dedup_url" -> ((s, d) => {
      // URL canonicalization dedup — the crawl-frontier step that runs
      // BEFORE any content hash exists: tracking params stripped,
      // scheme+host lowercased, trailing slash dropped, then exact
      // dedup on the canonical form. Deterministic raw-URL variants are
      // synthesized per doc from the shared columns (the fn_url
      // derivation + seeded noise: the %3 slice appends utm tracking
      // params, the %5 slice uppercases its host, the %7 slice gains a
      // trailing slash), so several raw forms collapse onto one
      // canonical URL — the %15 slice (3∧5) exercises composed noise.
      // Per-host report: raw vs canonical counts and how many dups the
      // canonicalization recovered. Pure map-side string work; one
      // aggregate shuffle.
      val raw = concat(
        when(col("doc_id") % 5 === 0, lit("HTTPS://")).otherwise(lit("https://")),
        when(col("doc_id") % 5 === 0, upper(col("source"))).otherwise(col("source")),
        lit(".example.org/docs/"), col("lang"), lit("/"),
        (col("doc_id") % 40).cast("string"),
        when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 3 === 0, lit("?utm_source=feed&utm_campaign=x"))
          .otherwise(lit("")))
      val canon = regexp_replace(regexp_replace(lower(raw),
        "\\?utm[^#]*", ""), "/$", "")
      // two distinct groups (raw, canon) in one agg would Expand ×3
      // the corpus pre-shuffle (the quality_profile trap); narrow
      // subtrees — one dedup-then-count pass per distinct column,
      // joined on the ~|sources| host dimension — keep every exchange
      // partial-aggregated. NULL-safety: raw/canon/host derive from
      // concat/regexp/parse_url over non-null columns, so neither the
      // distinct-counted columns nor the host join key can be NULL
      // (NullSemanticsSpec pins the rewrite's null contract).
      val urls = T.spread(T.documents(s, d))
        .withColumn("raw", raw).withColumn("canon", canon)
        .withColumn("host", parse_url(col("canon"), lit("HOST")))
      val nTotal = urls.groupBy("host").agg(count(lit(1)).as("n_tot"))
      val nRaw = urls.select("host", "raw").distinct()
        .groupBy("host").agg(count(lit(1)).as("n_raw"))
      val nCanon = urls.select("host", "canon").distinct()
        .groupBy("host").agg(count(lit(1)).as("n_canonical"))
      nRaw.join(nCanon, "host").join(nTotal, "host")
        .select(col("host"), col("n_raw"), col("n_canonical"),
          (col("n_tot") - col("n_canonical")).as("n_dups_recovered"))
        .orderBy("host")
    }),

    "dedup_threshold_sweep" -> ((s, d) => {
      // the threshold tuning curve a curation run reads before picking
      // its near-dup cutoff: for each candidate threshold, how many
      // pairs and how many distinct documents a j ≥ t dedup would
      // touch. Rides the memoized ≥0.5 pair mining (its declared
      // floor = the sweep's lowest band); the 5-row threshold table
      // broadcasts, pair rows expand ≤5× + 2× (bounded — pairs are few
      // by construction), and thresholds compare against the 4-dp
      // ROUNDED j, so both engines select identical pair sets.
      val th = s.range(1).select(explode(array(
        lit(0.5), lit(0.6), lit(0.7), lit(0.8), lit(0.9))).as("t"))
      val sel = minedPairs(s, d).crossJoin(broadcast(th))
        .filter(col("j") >= col("t"))
      val pr = sel.groupBy("t").agg(count(lit(1)).as("n_pairs"))
      val dd = sel.select(col("t"), explode(array(col("a"), col("b"))).as("doc"))
        .groupBy("t").agg(countDistinct("doc").as("n_docs"))
      th.join(pr, Seq("t"), "left").join(dd, Seq("t"), "left")
        .select(col("t"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"))
        .orderBy("t")
    }),

    "dedup_simhash" -> ((s, d) => {
      // 16-bit SimHash over token multiset; equal hashes → near-dup
      // bucket. Portable md5-derived bits, so the oracle reproduces the
      // exact hash values.
      val tok = T.spread(T.documents(s, d))
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        .withColumn("h", TextOps.md5Short(col("w")))
      val bitSums = (0 until 16).map { j =>
        sum(expr(s"CAST(FLOOR(h / POWER(2, $j)) AS INT) % 2") * 2 - 1).as(s"b$j")
      }
      tok.groupBy("doc_id")
        .agg(bitSums.head, bitSums.tail: _*)
        .withColumn("simhash",
          (0 until 16).map(j => when(col(s"b$j") > 0, 1 << j).otherwise(0))
            .reduce(_ + _))
        .groupBy("simhash")
        .agg(count(lit(1)).as("n"), min("doc_id").as("rep_doc"))
        .filter(col("n") > 1)
        .orderBy("simhash")
    }),

    "dedup_cluster_cc" -> ((s, d) => {
      // near-dup pairs → duplicate CLUSTERS: connected components of
      // the capped-Jaccard pair graph (min-label propagation, iterated
      // like ops/BFS). This is the step that turns pair mining into an
      // actionable keep/drop list: every clustered doc maps to its
      // cluster's minimum doc_id as the surviving representative.
      val pairs = minedPairs(s, d).select("a", "b")
      graft.ops.ConnectedComponents.labels(pairs)
        .select(col("v").as("doc_id"), col("rep"))
        .orderBy("doc_id")
    }),

    "dedup_keeplist" -> ((s, d) => {
      // APPLY the dedup: cluster labels → keep each cluster's min-id
      // representative, drop the other members; per-lang accounting of
      // the surviving corpus. This is the keep/drop list a pipeline
      // materializes after pair mining + clustering — labels (tiny: one
      // row per CLUSTERED doc) left-join the corpus, so unclustered
      // docs are kept by default and the corpus is read once.
      val labels = graft.ops.ConnectedComponents.labels(minedPairs(s, d).select("a", "b"))
        .select(col("v").as("doc_id"), col("rep"))
      T.spread(T.documents(s, d)).join(labels, Seq("doc_id"), "left")
        .withColumn("kept", col("rep").isNull || col("rep") === col("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("kept").cast("long")).as("n_kept"),
          sum((!col("kept")).cast("long")).as("n_dropped"))
        .orderBy("lang")
    }),

    // Oracled since round 12: the pipeline is DETERMINISTIC end to end
    // (md5 shingle hashes, fixed permutation coefficients, exact
    // Jaccard verify) — "probabilistic" only describes recall vs the
    // true pair set, not the output — so DuckDB can replay the same
    // permutations and banding exactly. ScalaTest additionally asserts
    // candidate recall ⊇ high-Jaccard pairs on the fixture corpus.
    "dedup_minhash_lsh" -> ((s, d) => {
      // the shingle→md5→signature pipeline is the expensive subtree
      // and FOUR plan branches hang off it (band self-join ×2, verify
      // set join ×2) — materialize it once (eager executor-block
      // checkpoint; at 100 TB this is a staged table) so no branch
      // recomputes it. Measured at sf1: 18.3 → ~6 s.
      val docs = T.spread(T.documents(s, d))
        .select(col("doc_id"), array_distinct(
          TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("hashes", transform(col("sh"), TextOps.md5Long(_)))
        .withColumn("sig", MinHashLSH.signature(col("hashes"), 16))
        .localCheckpoint(true)
      val cand = MinHashLSH.candidates(docs, "doc_id", "sig", 16, 2)
      val sets = docs.select(col("doc_id"), col("sh"))
      cand
        .join(sets.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sha"), "a")
        .join(sets.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "shb"), "b")
        .withColumn("j", round(
          size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_union(col("sha"), col("shb"))), 4))
        .filter(col("j") >= 0.5)
        .select("a", "b", "j")
        .orderBy("a", "b")
    })
  )

  /** DuckDB 3-shingle list from tokens `t` (shared with TextQueries). */
  private val shingle3 =
    "list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])"

  /** capped-Jaccard CTE chain ending in `j(a, b, j)` — shared by the
    * pair oracle and the cluster (connected-components) oracle. */
  private lazy val jaccardCtes = jaccardCtesOn("documents")

  // shingles hashed to the same portable 60-bit md5 as the Spark-side
  // mining (distinct over the HASHES, so both engines merge identical
  // collision classes); `sh`/`sg` are BIGINT keys from here on
  private def jaccardCtesOn(tbl: String) =
    s"""s AS (
       |  SELECT doc_id, list_distinct(list_transform($shingle3,
       |           x -> ${TextOps.md5LongSql("x")})) AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM $tbl)),
       |inv0 AS (SELECT doc_id, unnest(sh) AS sg FROM s),
       |keep AS (SELECT sg FROM inv0 GROUP BY sg HAVING COUNT(*) <= $HotShingleDfCap),
       |inv AS (SELECT doc_id, sg FROM inv0 JOIN keep USING (sg)),
       |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM inv GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n
       |  FROM inv x JOIN inv y ON x.sg = y.sg AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT a, b, ROUND(CAST(n AS DOUBLE) / (sa.sz + sb.sz - n), 4) AS j
       |  FROM inter JOIN sz sa ON inter.a = sa.doc_id
       |             JOIN sz sb ON inter.b = sb.doc_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT h, CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS rep_doc
        |FROM (SELECT doc_id,
        |             sha256(array_to_string(list_sort(list_distinct(
        |               string_split(lower(trim(text)), ' '))), ' ')) AS h
        |      FROM documents)
        |GROUP BY h HAVING COUNT(*) > 1 ORDER BY h""".stripMargin,

    "dedup_jaccard_pairs" ->
      s"WITH $jaccardCtes\nSELECT a, b, j FROM j WHERE j >= 0.5 ORDER BY a, b",

    // same synthesized raw URLs canonicalized with the same two
    // regex passes; host re-extracted from the canonical form
    "dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 5 = 0 THEN 'HTTPS://' ELSE 'https://' END)
        |    || (CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END)
        |    || '.example.org/docs/' || lang || '/' || CAST(doc_id % 40 AS STRING)
        |    || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
        |    || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_campaign=x' ELSE '' END)
        |    AS raw
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, raw,
        |         regexp_replace(regexp_replace(lower(raw), '\?utm[^#]*', ''), '/$', '') AS canon
        |  FROM u),
        |h AS (
        |  SELECT raw, canon,
        |         regexp_extract(canon, '^https?://([^/:?#]+)', 1) AS host
        |  FROM c)
        |SELECT host, CAST(COUNT(DISTINCT raw) AS BIGINT) AS n_raw,
        |       CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_canonical,
        |       CAST(COUNT(*) - COUNT(DISTINCT canon) AS BIGINT) AS n_dups_recovered
        |FROM h GROUP BY host ORDER BY host""".stripMargin,

    // same inverted index over the excerpt-seeded corpus, overlap
    // coefficient instead of Jaccard
    "dedup_containment" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents),
         |         array_to_string(list_slice(string_split(text, ' '), 1,
         |           GREATEST(3, CAST(FLOOR(len(string_split(text, ' ')) * 2 / 5) AS INT))), ' ')
         |  FROM documents WHERE doc_id % 29 = 0),
         |${jaccardCtesOn("corpus")}
         |SELECT a, b, CAST(n AS BIGINT) AS inter,
         |       ROUND(CAST(n AS DOUBLE) / LEAST(sa.sz, sb.sz), 4) AS ov
         |FROM inter JOIN sz sa ON inter.a = sa.doc_id
         |           JOIN sz sb ON inter.b = sb.doc_id
         |WHERE ROUND(CAST(n AS DOUBLE) / LEAST(sa.sz, sb.sz), 4) >= 0.8
         |ORDER BY a, b""".stripMargin,

    "dedup_threshold_sweep" ->
      s"""WITH $jaccardCtes,
         |th AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS t),
         |sel AS (SELECT t, a, b FROM j, th WHERE j.j >= th.t),
         |pr AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM sel GROUP BY t),
         |dd AS (SELECT t, CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs
         |       FROM (SELECT t, unnest([a, b]) AS doc FROM sel) GROUP BY t)
         |SELECT th.t, COALESCE(n_pairs, 0) AS n_pairs, COALESCE(n_docs, 0) AS n_docs
         |FROM th LEFT JOIN pr USING (t) LEFT JOIN dd USING (t)
         |ORDER BY th.t""".stripMargin,

    // same capped-Jaccard pair graph, closed transitively: reachability
    // via a recursive CTE, then MIN reachable id per vertex — exactly
    // the min-label fixpoint the Spark loop converges to
    "dedup_cluster_cc" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |pr AS (SELECT a, b FROM j WHERE j >= 0.5),
         |ed AS (SELECT a AS s2, b AS t2 FROM pr UNION SELECT b, a FROM pr
         |       UNION SELECT a, a FROM pr UNION SELECT b, b FROM pr),
         |reach AS (SELECT s2, t2 FROM ed
         |          UNION SELECT r.s2, ed.t2 FROM reach r JOIN ed ON r.t2 = ed.s2)
         |SELECT s2 AS doc_id, MIN(t2) AS rep FROM reach GROUP BY s2
         |ORDER BY doc_id""".stripMargin,

    // same pair graph + transitive closure as the cluster oracle, then
    // the keep/drop accounting joined back to the corpus
    "dedup_keeplist" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |pr AS (SELECT a, b FROM j WHERE j >= 0.5),
         |ed AS (SELECT a AS s2, b AS t2 FROM pr UNION SELECT b, a FROM pr
         |       UNION SELECT a, a FROM pr UNION SELECT b, b FROM pr),
         |reach AS (SELECT s2, t2 FROM ed
         |          UNION SELECT r.s2, ed.t2 FROM reach r JOIN ed ON r.t2 = ed.s2),
         |lab AS (SELECT s2 AS doc_id, MIN(t2) AS rep FROM reach GROUP BY s2)
         |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN lab.rep IS NULL OR lab.rep = d.doc_id
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(SUM(CASE WHEN lab.rep IS NOT NULL AND lab.rep <> d.doc_id
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_simhash" -> {
      val h = TextOps.md5ShortSql("w")
      val bitSums = (0 until 16)
        .map(j => s"SUM((CAST(FLOOR(h / POWER(2, $j)) AS INT) % 2) * 2 - 1) AS b$j")
        .mkString(",\n        ")
      val hash = (0 until 16)
        .map(j => s"CASE WHEN b$j > 0 THEN ${1 << j} ELSE 0 END")
        .mkString(" + ")
      s"""WITH tok AS (
         |  SELECT doc_id, $h AS h
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
         |bits AS (
         |  SELECT doc_id,
         |        $bitSums
         |  FROM tok GROUP BY doc_id),
         |sh AS (SELECT doc_id, CAST($hash AS INT) AS simhash FROM bits)
         |SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS rep_doc
         |FROM sh GROUP BY simhash HAVING COUNT(*) > 1 ORDER BY simhash""".stripMargin
    },

    // [[minhashBandCtes]] + candidate self-join + exact Jaccard verify
    "dedup_minhash_lsh" ->
      s"""WITH $minhashBandCtes,
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bd x JOIN bd y
         |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
         |$minhashVerifyCte
         |SELECT a, b, j FROM vj WHERE j >= 0.5 ORDER BY a, b""".stripMargin
  )

  /** the SAME deterministic minhash pipeline replayed in SQL: 60-bit
    * md5 shingle hashes reduced mod the Mersenne prime, the 16 fixed
    * (a·x + b) mod P permutations emitted from MinHashLSH.coef itself
    * (one source of truth), 8 two-row bands. Distinct shingle lists
    * make |union| = |A| + |B| − |A∩B| exact integers on both engines.
    * CTEs `s(doc_id, sh)` … `bd(doc_id, band, key)`; a caller appends
    * its candidate join + [[minhashVerifyCte]] (shared with the
    * stream_ingest_dedup oracle, whose candidates are corpus×incoming
    * instead of the self-join).
    */
  private[queries] lazy val minhashBandCtes: String = {
    val P = graft.ops.MinHashLSH.P
    val sigExprs = (0 until 16).map { i =>
      val (a, b) = graft.ops.MinHashLSH.coef(i)
      s"list_min(list_transform(hx, h -> (h * $a + $b) % $P))"
    }.mkString(",\n         ")
    s"""s0 AS (
       |  SELECT doc_id, list_distinct($shingle3) AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
       |s AS (SELECT doc_id, sh FROM s0 WHERE len(sh) > 0),
       |hs AS (
       |  SELECT doc_id, sh,
       |         list_transform(sh, x -> ${TextOps.md5LongSql("x")} % $P) AS hx
       |  FROM s),
       |sig AS (
       |  SELECT doc_id,
       |        [$sigExprs] AS sig
       |  FROM hs),
       |bd AS (
       |  SELECT doc_id, band,
       |         CAST(sig[2 * band + 1] AS VARCHAR) || '_' ||
       |         CAST(sig[2 * band + 2] AS VARCHAR) AS key
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS band))""".stripMargin
  }

  /** exact Jaccard verify at 4 dp over a `cand(a, b)` CTE. lazy: the
    * oracleSql val above interpolates this before the object's plain
    * vals initialize (a "null" in the SQL otherwise). */
  private[queries] lazy val minhashVerifyCte: String =
    """vj AS (
      |  SELECT a, b,
      |         ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      |               / (len(sa.sh) + len(sb.sh)
      |                  - len(list_intersect(sa.sh, sb.sh))), 4) AS j
      |  FROM cand JOIN s sa ON cand.a = sa.doc_id
      |            JOIN s sb ON cand.b = sb.doc_id)""".stripMargin
}
