package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}
import graft.ops.TextOps

/** SURVEY.md §2B category I (text half) — tokenization, n-grams, corpus
  * stats, plus the training-pipeline text analyzers (language ID,
  * quality scoring, BPE-ish token counting, document fingerprinting).
  *
  * Everything is explode/groupBy/higher-order-function shaped: one
  * narrow tokenize map, one shuffle on the grouping key. No UDFs — all
  * expressions are codegen-friendly built-ins, and the heuristics are
  * written in engine-portable arithmetic so DuckDB oracles them exactly.
  */
object TextQueries extends QueryPack {

  /** language signature words (measured per-lang frequency skews in the
    * testdata corpus); the classifier scores each set and takes the
    * argmax with alphabetical tie-break.
    */
  private val sigs = Seq(
    "de" -> Seq("customer", "hash", "big"),
    "en" -> Seq("order", "window", "group"),
    "es" -> Seq("slow", "agg", "merge"),
    "fr" -> Seq("scan", "data", "query"),
    "zh" -> Seq("join", "small", "row"))

  /** RAKE stoplist, declared: the corpus' function-ish words. RAKE
    * always ships a stoplist; phrase boundaries are DEFINED by it.
    */
  private val rakeStops = Seq("a", "data", "value", "key", "row",
    "table", "column", "order")

  val queries: Map[String, QueryFn] = Map(
    // RAKE keyword extraction [Rose et al. 2010] — the unsupervised
    // keyphrase miner a corpus-curation pipeline runs for topic
    // profiling: candidate phrases are the maximal stopword-free token
    // runs (gaps-islands segmentation: pos − row_number per doc over
    // non-stop tokens), word scores are deg/freq where freq counts a
    // word's occurrences in candidates and deg adds the LENGTH of each
    // containing phrase (so words living in long collocations outrank
    // bare frequent words), and a phrase scores the sum of its words.
    // Scores quantize to ppm BEFORE summing — (deg·1e6) DIV freq per
    // word, integer phrase sums — so both engines agree bit-for-bit
    // with no float fold anywhere. 100 TB shape: one per-doc window
    // pass for segmentation, then hash aggregates; the word-stats
    // table is vocabulary-sized and broadcasts back onto occurrences;
    // top-20 is TakeOrderedAndProject with a (score, phrase) total
    // order. Identical phrases across docs collapse (same text ⇒ same
    // tokens ⇒ same score; max = the value).
    "text_rake_keywords" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val toks = T.spread(T.documents(s, d))
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      val nonstop = toks.filter(!col("tok").isInCollection(rakeStops))
        .withColumn("grp", col("pos") - row_number().over(
          W.partitionBy("doc_id").orderBy("pos")))
      val phrases = nonstop.groupBy("doc_id", "grp")
        .agg(concat_ws(" ", transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x("tok"))).as("phrase"),
          count(lit(1)).as("len"))
      val words = nonstop.join(phrases.select("doc_id", "grp", "len"),
        Seq("doc_id", "grp"))
      val wstats = words.groupBy("tok")
        .agg(count(lit(1)).as("freq"), sum("len").as("deg"))
        .withColumn("score_ppm", expr("(deg * 1000000) DIV freq"))
      val scored = words.join(broadcast(wstats.select("tok", "score_ppm")), "tok")
        .groupBy("doc_id", "grp")
        .agg(sum("score_ppm").as("pscore"))
      phrases.join(scored, Seq("doc_id", "grp"))
        .groupBy("phrase")
        .agg(max("pscore").as("score_ppm"), max("len").as("n_words"),
          count(lit(1)).cast("long").as("n_occurrences"))
        .orderBy(col("score_ppm").desc, col("phrase"))
        .limit(20)
    }),

    "text_tfidf" -> ((s, d) => {
      // top-3 tf-idf terms per doc: tf and df aggregate map-side before
      // their (small, term-keyed) join; N arrives via a 1-row broadcast
      // cross join, never a driver-side collect. Ranking uses the
      // ROUNDED score so both engines rank identical values.
      import org.apache.spark.sql.expressions.Window
      val docs = T.spread(T.documents(s, d))
      val tok = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tok.groupBy("term").agg(countDistinct("doc_id").as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") * log(col("n").cast("double") / col("df")), 4))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("doc_id", "term", "tf", "score")
        .orderBy(col("doc_id"), col("score").desc, col("term"))
    }),

    "text_perplexity" -> ((s, d) => {
      // per-doc cross-entropy under the corpus unigram LM — the
      // KenLM-shaped quality filter (perplexity = e^H is monotone in H,
      // so threshold filters read H directly; skipping the exp keeps
      // one libm op out of the output). Engine parity is the tfidf LN
      // precedent taken one step further: each distinct VOCAB word's
      // log-prob is quantized to integer micro-nats once. Caveat (r10
      // ADVICE): this ASSUMES Spark's Math.log and DuckDB's libm log
      // agree on the input double — they do on every word in the
      // current corpora (3-SF sweep green), but a 1-ULP divergence
      // landing exactly on a .5 boundary of round(ln(p)*1e6) would
      // flip qw; same accepted data-dependent risk as the tfidf LN
      // precedent. Given identical qw, the per-doc accumulation
      // Σ n_w·q_w is an exact BIGINT sum — no fold-order-sensitive
      // double summation — and the final division is correctly
      // rounded. Scale
      // shape: the vocab count table is Zipf-small at any corpus size,
      // so both the quantized-LM join and the N scalar broadcast; the
      // corpus is scanned twice (count pass + score pass), both passes
      // hash-aggregate map-side.
      val tok = T.spread(T.documents(s, d))
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val cnt = tok.groupBy("w").agg(count(lit(1)).as("cw"))
      val tot = cnt.agg(sum("cw").as("ct"))
      val q = cnt.crossJoin(broadcast(tot))
        .select(col("w"),
          round(log(col("cw").cast("double") / col("ct")) * 1e6)
            .cast("long").as("qw"))
      tok.groupBy("doc_id", "lang", "w").agg(count(lit(1)).as("n"))
        .join(broadcast(q), "w")
        .groupBy("doc_id", "lang")
        .agg(sum("n").as("n_tok"), sum(col("n") * col("qw")).as("qsum"))
        .select(col("doc_id"), col("lang"), col("n_tok"),
          round(-col("qsum").cast("double") / (col("n_tok") * 1e6), 4)
            .as("h_nats"))
        .orderBy("doc_id")
    }),

    "text_wordcount" -> ((s, d) => {
      // Mimir's flagship app: map(tokenize) → combine → reduce(sum).
      // explode + hash-agg gets map-side partial aggregation for free.
      T.spread(T.documents(s, d))
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(100)
    }),

    "text_bigrams" -> ((s, d) => {
      T.spread(T.documents(s, d))
        .select(explode(TextOps.shingles(TextOps.tokens(col("text")), 2)).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(100)
    }),

    "text_lang_stats" -> ((s, d) => {
      T.spread(T.documents(s, d))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("docs"),
          round(avg("n_chars"), 2).as("avg_chars"),
          countDistinct(col("source")).as("n_sources"),
          sum(size(TextOps.tokens(col("text")))).as("total_tokens"))
        .orderBy("lang")
    }),

    "text_langid" -> ((s, d) => {
      // n-gram-frequency language ID heuristic → confusion matrix vs the
      // labeled lang column.
      val toks = TextOps.tokens(col("text"))
      val scored = sigs.foldLeft(T.spread(T.documents(s, d)).withColumn("toks", toks)) {
        case (df, (lang, words)) =>
          df.withColumn(s"s_$lang",
            size(filter(col("toks"), t => t.isin(words.map(lit(_)): _*))))
      }
      val g = greatest(sigs.map { case (l, _) => col(s"s_$l") }: _*)
      val pred = sigs.foldRight(lit("??")) { case ((l, _), e) =>
        when(col(s"s_$l") === g, l).otherwise(e)
      }
      // CASE order must be alphabetical for the tie-break: foldRight keeps
      // 'de' as the first WHEN.
      scored.withColumn("pred", pred)
        .groupBy("lang", "pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    }),

    "text_quality" -> ((s, d) => {
      // length/stopword/token-shape quality score, bucketed.
      val toks = TextOps.tokens(col("text"))
      val q = T.spread(T.documents(s, d))
        .withColumn("n_tok", size(toks).cast("double"))
        .withColumn("stop_ratio",
          size(filter(toks, t => t.isin("the", "a"))).cast("double") / col("n_tok"))
        .withColumn("avg_tok_len",
          (length(col("text")) - (col("n_tok") - 1)) / col("n_tok"))
        .withColumn("score",
          round(lit(0.3) * least(col("n_tok") / 50, lit(1.0))
            + lit(0.4) * (lit(1.0) - col("stop_ratio"))
            + lit(0.3) * least(col("avg_tok_len") / 6, lit(1.0)), 4))
      q.withColumn("bucket",
          when(col("score") >= 0.8, "high")
            .when(col("score") >= 0.6, "mid").otherwise("low"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), round(avg("score"), 4).as("avg_score"))
        .orderBy("bucket")
    }),

    "text_tokens_bpe" -> ((s, d) => {
      // BPE-ish regex tokenization (letters / digit-runs / punctuation),
      // counted per doc then aggregated per lang.
      T.spread(T.documents(s, d))
        .withColumn("n_bpe",
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")))
        .groupBy("lang")
        .agg(sum("n_bpe").as("total_bpe"), round(avg("n_bpe"), 2).as("avg_bpe"))
        .orderBy("lang")
    }),

    "text_fingerprint" -> ((s, d) => {
      // winnowing-style fingerprint: min 60-bit hash over 3-token
      // shingles; identical-content docs collide → dup-candidate groups.
      val sh = TextOps.shingles(TextOps.tokens(col("text")), 3)
      T.spread(T.documents(s, d))
        .withColumn("fp", array_min(transform(sh, TextOps.md5Long(_))))
        .filter(col("fp").isNotNull)
        .groupBy("fp")
        .agg(count(lit(1)).as("n"), min("doc_id").as("rep_doc"))
        .filter(col("n") >= 2)
        .orderBy("fp")
    })
  )

  private def langidSql: String = {
    val scores = sigs.map { case (l, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($inList))) AS s_$l"
    }.mkString(",\n        ")
    val g = sigs.map { case (l, _) => s"s_$l" }.mkString("GREATEST(", ", ", ")")
    val cases = sigs.map { case (l, _) => s"WHEN s_$l = g THEN '$l'" }.mkString(" ")
    s"""WITH scored AS (
       |  SELECT lang,
       |        $scores
       |  FROM documents),
       |p AS (SELECT lang, CASE $cases END AS pred
       |      FROM (SELECT *, $g AS g FROM scored))
       |SELECT lang, pred, CAST(COUNT(*) AS BIGINT) AS n
       |FROM p GROUP BY lang, pred ORDER BY lang, pred""".stripMargin
  }

  /** DuckDB 3-token shingle list over space-split tokens `t`. */
  private val shingle3 =
    "list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])"

  val oracleSql: Map[String, String] = Map(
    // identical segmentation (same stoplist, same gaps-islands key),
    // identical ppm word scores, identical integer phrase sums; every
    // aggregate cast back to BIGINT (DuckDB SUM -> HUGEINT class)
    "text_rake_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, i - 1 AS pos, t[i] AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d,
        |       unnest(range(1, len(t) + 1)) AS u(i)),
        |ns AS (
        |  SELECT doc_id, pos, tok,
        |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM toks
        |  WHERE tok NOT IN ('a', 'data', 'value', 'key', 'row', 'table', 'column', 'order')),
        |ph AS (
        |  SELECT doc_id, grp, string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |         CAST(COUNT(*) AS BIGINT) AS len
        |  FROM ns GROUP BY 1, 2),
        |w AS (SELECT ns.doc_id, ns.grp, ns.tok, ph.len
        |      FROM ns JOIN ph USING (doc_id, grp)),
        |ws AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq, CAST(SUM(len) AS BIGINT) AS deg
        |  FROM w GROUP BY 1),
        |ws2 AS (SELECT tok, CAST((deg * 1000000) // freq AS BIGINT) AS score_ppm FROM ws),
        |ps AS (
        |  SELECT w.doc_id, w.grp, CAST(SUM(ws2.score_ppm) AS BIGINT) AS pscore
        |  FROM w JOIN ws2 USING (tok) GROUP BY 1, 2)
        |SELECT ph.phrase, MAX(ps.pscore) AS score_ppm, MAX(ph.len) AS n_words,
        |       CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |FROM ph JOIN ps USING (doc_id, grp)
        |GROUP BY 1 ORDER BY score_ppm DESC, phrase LIMIT 20""".stripMargin,

    "text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tok WHERE term <> '' GROUP BY 1, 2
        |), df AS (
        |  SELECT term, COUNT(DISTINCT doc_id) AS df
        |  FROM tok WHERE term <> '' GROUP BY 1
        |), n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |         ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df), 4) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |), ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |            ORDER BY score DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, term, tf, score FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, score DESC, term""".stripMargin,

    "text_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
        |), t2 AS (SELECT * FROM tok WHERE w <> ''),
        |cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM t2 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS ct FROM cnt),
        |q AS (
        |  SELECT w, CAST(ROUND(LN(CAST(cw AS DOUBLE) / ct) * 1e6) AS BIGINT) AS qw
        |  FROM cnt CROSS JOIN tot),
        |dt AS (
        |  SELECT doc_id, lang, w, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM t2 GROUP BY 1, 2, 3)
        |SELECT dt.doc_id, dt.lang, CAST(SUM(dt.n) AS BIGINT) AS n_tok,
        |       ROUND(-CAST(SUM(dt.n * q.qw) AS DOUBLE) / (SUM(dt.n) * 1e6), 4) AS h_nats
        |FROM dt JOIN q USING (w)
        |GROUP BY 1, 2 ORDER BY dt.doc_id""".stripMargin,

    "text_wordcount" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> ''
        |GROUP BY word ORDER BY n DESC, word LIMIT 100""".stripMargin,

    "text_bigrams" ->
      """SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
        |      FROM (SELECT string_split(text, ' ') AS t FROM documents))
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 100""".stripMargin,

    "text_lang_stats" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
        |       ROUND(AVG(n_chars), 2) AS avg_chars,
        |       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_langid" -> langidSql,

    "text_quality" ->
      """WITH q AS (
        |  SELECT ROUND(0.3 * LEAST(n_tok / 50, 1.0)
        |             + 0.4 * (1.0 - stop_ratio)
        |             + 0.3 * LEAST(avg_tok_len / 6, 1.0), 4) AS score
        |  FROM (SELECT CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        |               CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
        |                 / len(string_split(text, ' ')) AS stop_ratio,
        |               (LENGTH(text) - (len(string_split(text, ' ')) - 1))
        |                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_tok_len
        |        FROM documents))
        |SELECT CASE WHEN score >= 0.8 THEN 'high'
        |            WHEN score >= 0.6 THEN 'mid' ELSE 'low' END AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n, ROUND(AVG(score), 4) AS avg_score
        |FROM q GROUP BY 1 ORDER BY bucket""".stripMargin,

    "text_tokens_bpe" ->
      """SELECT lang,
        |       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe,
        |       ROUND(AVG(n_bpe), 2) AS avg_bpe
        |FROM (SELECT lang, len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS n_bpe
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "text_fingerprint" ->
      s"""SELECT fp, CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS rep_doc
         |FROM (SELECT doc_id,
         |             list_aggregate(list_transform($shingle3,
         |                            s -> ${TextOps.md5LongSql("s")}), 'min') AS fp
         |      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
         |WHERE fp IS NOT NULL
         |GROUP BY fp HAVING COUNT(*) >= 2 ORDER BY fp""".stripMargin
  )
}
