package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}

/** SURVEY.md §2B category H — scalar function surface (string / date /
  * math / conditional / array / JSON / struct). All built-in Catalyst
  * expressions: whole-stage-codegen'd, no UDFs in the hot path.
  *
  * Cross-engine parity notes baked in (SURVEY.md §7.4.3):
  *  - Spark weekday()+1 == DuckDB isodow (Monday=1).
  *  - Spark datediff(end,start) == DuckDB datediff('day',start,end).
  *  - add_months clamps month-ends in both engines.
  *  - arrays are emitted as array_join'd strings (struct/map outputs
  *    stay scalar so the driver's value hash is representation-stable).
  */
object ScalarFnQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "fn_string" -> ((s, d) => {
      T.customer(s, d).select(
        col("c_custkey"),
        lower(col("c_name")).as("lo"),
        upper(col("c_mktsegment")).as("up"),
        length(col("c_name")).as("len"),
        substring(col("c_name"), 10, 5).as("sub"),
        concat_ws("|", col("c_name"), trim(col("c_mktsegment"))).as("joined"),
        regexp_replace(col("c_name"), "Customer#", "C").as("repl"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
        .orderBy("c_custkey")
    }),

    "fn_date" -> ((s, d) => {
      T.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mo"),
        (weekday(col("o_orderdate")) + 1).as("dow_iso"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"))
        .orderBy("o_orderkey")
    }),

    "fn_math" -> ((s, d) => {
      T.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_extendedprice")), 4).as("sqrt_p"),
        ceil(col("l_discount") * 100).as("disc_c"),
        floor(col("l_tax") * 100).as("tax_f"),
        round(log(col("l_extendedprice")), 4).as("ln_p"),
        round(log10(col("l_extendedprice")), 4).as("log10_p"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod"),
        signum(col("l_discount") - 0.05).cast("int").as("sgn"),
        round(abs(col("l_discount") - 0.05), 4).as("absd"))
        // sqrt_p/qty_sq/absd/tax_f break the non-unique (orderkey,
        // linenumber) ties; the rest are functions of these
        .orderBy("l_orderkey", "l_linenumber", "sqrt_p", "qty_sq", "absd", "tax_f")
    }),

    "fn_case_null" -> ((s, d) => {
      T.orders(s, d)
        .select(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
            .when(col("o_orderpriority") === "3-MEDIUM", "warm")
            .otherwise("cold").as("bucket"),
          coalesce(expr("nullif(o_orderstatus, 'P')"), lit("PENDING")).as("st"))
        .groupBy("bucket", "st")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket", "st")
    }),

    "fn_array" -> ((s, d) => {
      val toks = split(col("text"), " ")
      T.documents(s, d).select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        array_contains(toks, "the").as("has_the"),
        array_join(slice(sort_array(toks), 1, 3), ",").as("first3"),
        size(array_distinct(toks)).as("n_distinct"))
        .orderBy("doc_id")
    }),

    "fn_map_json" -> ((s, d) => {
      // from_json → MapType extraction AND get_json_object, summed per type.
      val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType))
      T.events(s, d)
        .select(col("event_type"),
          element_at(m, "k").as("k_map"),
          get_json_object(col("props"), "$.k").cast("int").as("k_str"))
        .groupBy("event_type")
        .agg(sum("k_map").as("sum_k"),
          sum("k_str").as("sum_k2"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    "fn_struct" -> ((s, d) => {
      // build a struct, order by its nested field, project nested fields.
      T.orders(s, d)
        .withColumn("s", struct(col("o_orderdate"), col("o_totalprice")))
        .select(col("o_orderkey"),
          col("s.o_totalprice").as("p"),
          col("s.o_orderdate").as("dt"))
        .orderBy(col("p").desc, col("o_orderkey"))
        .limit(50)
    }),

    "fn_url" -> ((s, d) => {
      // URL decomposition via Spark's parse_url built-in — the
      // provenance-extraction step a web corpus runs before per-domain
      // policy (dedup caps, licence filters, domain mixing). URLs are
      // synthesized from the shared columns (the corpus carries no
      // natural ones), parsed back with parse_url(HOST/PATH/QUERY key),
      // then profiled per host. The oracle decomposes the same strings
      // with anchored regexes, NULLIF-normalized to parse_url's
      // NULL-on-missing contract (the %13 slice omits the query string
      // to exercise it). Pure map-side derivation; one profile shuffle.
      val url = concat(lit("https://"), col("source"),
        lit(".example.org/docs/"), col("lang"), lit("/"),
        col("doc_id").cast("string"),
        when(col("doc_id") % 13 === 0, lit(""))
          .otherwise(concat(lit("?ref=r"), (col("doc_id") % 7).cast("string"),
            lit("&fmt=txt"))))
      T.documents(s, d)
        .withColumn("url", url)
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"))
        .groupBy("host")
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("ref")).as("n_refs"),
          sum(isnull(col("ref")).cast("long")).as("n_noquery"))
        .join(
          // second distinct column as its own narrow dedup-then-count
          // subtree (two distinct groups in one agg would Expand ×3
          // the scan pre-shuffle — the quality_profile trap); joined
          // on the ~|sources| host dimension. NULL-safety: host and
          // path are parse_url over a URL concat'd from non-null
          // columns, so neither the distinct-counted column nor the
          // join key can be NULL here (NullSemanticsSpec pins the
          // countDistinct-rewrite null contract).
          T.documents(s, d)
            .withColumn("url", url)
            .select(parse_url(col("url"), lit("HOST")).as("host"),
              parse_url(col("url"), lit("PATH")).as("path"))
            .distinct()
            .groupBy("host").agg(count(lit(1)).as("n_paths")),
          "host")
        .orderBy("host")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "fn_string" ->
      """SELECT c_custkey,
        |       LOWER(c_name) AS lo,
        |       UPPER(c_mktsegment) AS up,
        |       CAST(LENGTH(c_name) AS INT) AS len,
        |       SUBSTRING(c_name, 10, 5) AS sub,
        |       CONCAT_WS('|', c_name, TRIM(c_mktsegment)) AS joined,
        |       REPLACE(c_name, 'Customer#', 'C') AS repl,
        |       LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        |       REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        |       CAST(YEAR(o_orderdate) AS INT) AS yr,
        |       CAST(QUARTER(o_orderdate) AS INT) AS qtr,
        |       CAST(MONTH(o_orderdate) AS INT) AS mo,
        |       CAST(ISODOW(o_orderdate) AS INT) AS dow_iso,
        |       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |       CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       ROUND(SQRT(l_extendedprice), 4) AS sqrt_p,
        |       CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_c,
        |       CAST(FLOOR(l_tax * 100) AS BIGINT) AS tax_f,
        |       ROUND(LN(l_extendedprice), 4) AS ln_p,
        |       ROUND(LOG10(l_extendedprice), 4) AS log10_p,
        |       ROUND(POWER(l_quantity, 2), 2) AS qty_sq,
        |       ((l_orderkey % 7) + 7) % 7 AS key_mod,
        |       CAST(SIGN(l_discount - 0.05) AS INT) AS sgn,
        |       ROUND(ABS(l_discount - 0.05), 4) AS absd
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, sqrt_p, qty_sq, absd, tax_f""".stripMargin,

    "fn_case_null" ->
      """SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hot'
        |            WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
        |            ELSE 'cold' END AS bucket,
        |       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS st,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY bucket, st""".stripMargin,

    "fn_array" ->
      """SELECT doc_id,
        |       CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens,
        |       LIST_CONTAINS(STRING_SPLIT(text, ' '), 'the') AS has_the,
        |       ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(text, ' '))[1:3], ',') AS first3,
        |       CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INT) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_map_json" ->
      """SELECT event_type,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k2,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "fn_struct" ->
      """SELECT o_orderkey, o_totalprice AS p, o_orderdate AS dt
        |FROM orders
        |ORDER BY p DESC, o_orderkey LIMIT 50""".stripMargin,

    // same synthesized URLs decomposed with anchored regexes; NULLIF('')
    // mirrors parse_url's NULL-on-missing
    "fn_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         'https://' || source || '.example.org/docs/' || lang || '/'
        |           || CAST(doc_id AS STRING)
        |           || CASE WHEN doc_id % 13 = 0 THEN ''
        |                   ELSE '?ref=r' || CAST(doc_id % 7 AS STRING) || '&fmt=txt' END
        |           AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |         NULLIF(regexp_extract(url, '^https?://([^/:?#]+)', 1), '') AS host,
        |         NULLIF(regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)', 1), '') AS path,
        |         NULLIF(regexp_extract(url, '[?&]ref=([^&#]*)', 1), '') AS ref
        |  FROM u)
        |SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(COUNT(DISTINCT ref) AS BIGINT) AS n_refs,
        |       CAST(SUM(CASE WHEN ref IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_noquery,
        |       CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths
        |FROM p GROUP BY host ORDER BY host""".stripMargin
  )
}
