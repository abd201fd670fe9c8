package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SaveMode
import graft.{QueryPack, Tables => T}

/** SURVEY.md §2B category A — sources and sinks.
  *
  * Roundtrips exercise sink+source fidelity: the query writes a table to
  * CSV / JSON-lines in a temp dir with an explicit schema, reads it back,
  * and the oracle is the identity SELECT — any encode/decode loss breaks
  * the hash match. Parquet sink fidelity is exercised structurally by
  * Verify (every result is dumped as parquet).
  */
object ScanQueries extends QueryPack {

  val queries: Map[String, QueryFn] = Map(
    "scan_parquet" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus
      // (~20% of pairs duplicated); l_partkey+l_suppkey+l_quantity
      // complete the total order at every SF
      T.lineitem(s, d).orderBy("l_orderkey", "l_linenumber",
        "l_partkey", "l_suppkey", "l_quantity")
    }),

    "scan_csv_roundtrip" -> ((s, d) => {
      val tmp = graft.Tmp.dir("csv").toString
      T.nation(s, d).write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(tmp)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      s.read.schema(schema).option("header", "true").csv(tmp)
        .orderBy("n_nationkey")
    }),

    "scan_json_roundtrip" -> ((s, d) => {
      val tmp = graft.Tmp.dir("json").toString
      T.region(s, d).write.mode(SaveMode.Overwrite).json(tmp)
      val schema = StructType(Seq(
        StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType)))
      s.read.schema(schema).json(tmp).orderBy("r_regionkey")
    }),

    "scan_badrecords" -> ((s, d) => {
      // malformed-input tolerance (Mimir's text sources parse in user
      // code; a relational ingest needs an engine answer): inject a
      // known count of arity/type-corrupt lines into a CSV, read it
      // back PERMISSIVE with a corrupt-record column, and report the
      // clean/corrupt split. A corrupt line must never abort the scan
      // NOR silently join the clean rows.
      val tmp = graft.Tmp.dir("bad").toString
      val clean = T.nation(s, d).select(concat_ws(",",
        col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
      val corrupt = s.range(5).select(
        concat(lit("oops"), col("id"), lit(",x")).as("value"))
      clean.unionAll(corrupt).write.mode(SaveMode.Overwrite).text(tmp)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType),
        StructField("_bad", StringType)))
      // Spark refuses plans that read ONLY the corrupt-record column
      // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — classify through a data
      // column as well: a corrupt line parses to null n_nationkey AND
      // a non-null _bad payload.
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(tmp)
        .agg(
          sum(when(col("n_nationkey").isNotNull && col("_bad").isNull, 1L)
            .otherwise(0L)).as("n_clean"),
          sum(when(col("n_nationkey").isNull || col("_bad").isNotNull, 1L)
            .otherwise(0L)).as("n_corrupt"))
    }),

    "scan_schema_merge" -> ((s, d) => {
      // schema evolution across ingest generations — the 100 TB reality
      // that month-1 parquet lacks columns month-6 writes. Generation A
      // (doc_id < 250) is written WITHOUT the quality column; generation
      // B carries it (derived deterministically from n_chars).
      // mergeSchema unifies the footers at read; A's rows surface NULL
      // quality, and the audit aggregates coverage per lang — exactly
      // the backfill-planning query a pipeline runs before re-scoring
      // old generations.
      // the two-generation layout is setup for the mergeSchema read —
      // materialized once per (sfDir, JVM), reused across invocations
      val tmp = graft.Tmp.cachedLayout("evo", d) { p =>
        val docs = T.documents(s, d).select("doc_id", "lang", "n_chars")
        docs.filter(col("doc_id") < 250)
          .write.mode(SaveMode.Overwrite).parquet(s"$p/gen=a")
        docs.filter(col("doc_id") >= 250)
          .withColumn("quality", round(col("n_chars") / lit(1000.0), 4))
          .write.mode(SaveMode.Overwrite).parquet(s"$p/gen=b")
      }
      s.read.option("mergeSchema", "true").parquet(tmp)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(col("quality")).as("n_scored"),
          round(avg("quality"), 4).as("avg_quality"))
        .orderBy("lang")
    }),

    "scan_xml_roundtrip" -> ((s, d) => {
      // Spark 4 folded the XML data source into core (no external
      // connector): write nation as <nation> row elements, read it back
      // with an explicit schema. XML is the config/feed interchange
      // format a crawl pipeline still meets (sitemaps, RSS, dumps) —
      // the roundtrip pins element encode/decode fidelity exactly like
      // the CSV/JSON siblings; the oracle is the identity SELECT.
      val tmp = graft.Tmp.dir("xml").toString
      T.nation(s, d).write.mode(SaveMode.Overwrite)
        .option("rowTag", "nation").format("xml").save(tmp)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      s.read.schema(schema).option("rowTag", "nation").format("xml")
        .load(tmp).orderBy("n_nationkey")
    }),

    "scan_text_roundtrip" -> ((s, d) => {
      // Mimir's native source/sink was chunked text files; write the
      // corpus as raw text, read it back line-oriented.
      val tmp = graft.Tmp.dir("text").toString
      T.documents(s, d).select(col("text")).write
        .mode(SaveMode.Overwrite).text(tmp)
      s.read.text(tmp).select(col("value")).orderBy("value")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "scan_schema_merge" ->
      """WITH merged AS (
        |  SELECT lang, CAST(NULL AS DOUBLE) AS quality
        |  FROM documents WHERE doc_id < 250
        |  UNION ALL
        |  SELECT lang, ROUND(n_chars / 1000.0, 4)
        |  FROM documents WHERE doc_id >= 250)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(COUNT(quality) AS BIGINT) AS n_scored,
        |       ROUND(AVG(quality), 4) AS avg_quality
        |FROM merged GROUP BY lang ORDER BY lang""".stripMargin,

    "scan_parquet" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity",
    "scan_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "scan_json_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "scan_xml_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "scan_text_roundtrip" ->
      "SELECT text AS value FROM documents ORDER BY value",
    // the injected-corruption count is part of the declared semantics
    "scan_badrecords" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_clean,
        |       CAST(5 AS BIGINT) AS n_corrupt FROM nation""".stripMargin
  )
}
