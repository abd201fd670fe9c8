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
    }),

    "scan_text_gzip" -> ((s, d) => {
      // the 100 TB ingest reality: crawl text arrives COMPRESSED.
      // Write the corpus gzip'd, read it back through the codec path —
      // gzip is NOT splittable, so at scale this layout means
      // one-task-per-file (the file count is the parallelism knob,
      // which is why pipelines re-chunk compressed text early); the
      // roundtrip pins the codec decode exactly like the plain-text
      // sibling. Oracle is the identity select.
      val tmp = graft.Tmp.dir("gztext").toString
      T.documents(s, d).select(col("text")).write
        .mode(SaveMode.Overwrite).option("compression", "gzip").text(tmp)
      s.read.text(tmp).select(col("value")).orderBy("value")
    }),

    "scan_avro_roundtrip" -> ((s, d) => {
      // Avro completes the format matrix (csv/json/xml/orc/text/gzip/
      // binary/parquet): the row-oriented container format Kafka
      // pipelines and schema registries standardize on. spark-avro
      // (the DataSource) is not bundled in this distribution, but
      // Apache Avro itself ships in Spark's own jars — so the
      // roundtrip exercises the REAL object-container format through
      // the avro Java API: each task writes its partition as one
      // deflate-compressed .avro container (executor-side
      // foreachPartition, the binaryFile-layout precedent), and the
      // read path goes binaryFile -> DataFileStream per file, so
      // sync-marker framing, block deflate, and schema header all
      // round-trip. At 100 TB this is the one-container-per-task
      // ingest shape; containers are splittable by sync marker (a
      // distributed reader would split blocks — the per-file
      // DataFileStream here is the single-container case). Oracle is
      // the identity SELECT: any encode/decode loss hash-mismatches.
      import s.implicits._
      val avroSchemaJson =
        """{"type":"record","name":"Doc","fields":[
          |{"name":"doc_id","type":"long"},
          |{"name":"lang","type":"string"},
          |{"name":"text","type":"string"}]}""".stripMargin
      // write per CALL, like every roundtrip sibling: the sink IS the
      // declared semantics, so caching the layout would make repeat
      // invocations (bench warm passes) read-only
      val tmp = graft.Tmp.dir("avro").toString
      T.documents(s, d).select(col("doc_id"), col("lang"), col("text"))
        .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          if (rows.hasNext) {
            import org.apache.avro.Schema
            import org.apache.avro.file.{CodecFactory, DataFileWriter}
            import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
            val schema = new Schema.Parser().parse(avroSchemaJson)
            val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
            try {
              w.setCodec(CodecFactory.deflateCodec(6))
              val pid = org.apache.spark.TaskContext.getPartitionId()
              w.create(schema, new java.io.File(tmp, f"part-$pid%05d.avro"))
              rows.foreach { r =>
                val rec = new GenericData.Record(schema)
                rec.put("doc_id", r.getLong(0))
                rec.put("lang", r.getString(1))
                rec.put("text", r.getString(2))
                w.append(rec)
              }
            } finally w.close()
          }
        }
      s.read.format("binaryFile").load(tmp)
        .select(col("content")).as[Array[Byte]]
        .flatMap { bytes =>
          import org.apache.avro.file.DataFileStream
          import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
          val in = new java.io.ByteArrayInputStream(bytes)
          val rd = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
          try {
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
            while (rd.hasNext) {
              val rec = rd.next()
              out += ((rec.get("doc_id").asInstanceOf[Long],
                rec.get("lang").toString, rec.get("text").toString))
            }
            out
          } finally rd.close()
        }
        .toDF("doc_id", "lang", "text")
        .orderBy("doc_id")
    }),

    "scan_binaryfile" -> ((s, d) => {
      // the multimodal ingest source: opaque media FILES read through
      // Spark's binaryFile format — (path, modificationTime, length,
      // content) — the exact shape an audio/image crawl lands on a
      // shared store before any decode touches it. Layout (one real
      // .wav file per doc_id < 50, written executor-side via
      // foreachPartition) is setup, cached per (sf, JVM); the DECLARED
      // semantics is the binaryFile read + WavCodec decode + profile.
      // The oracle recomputes the profile from the same synth
      // arithmetic as multimodal_audio_meta, so any roundtrip loss
      // (truncation, glob misses, content corruption) hash-mismatches.
      import s.implicits._
      import graft.multimodal.WavCodec
      val tmp = graft.Tmp.cachedLayout("binwav", d) { p =>
        T.documents(s, d).filter(col("doc_id") < 50).select(col("doc_id"))
          .as[Long].foreachPartition { (ids: Iterator[Long]) =>
            ids.foreach { id =>
              val rate = (8000 + (id % 3) * 4000).toInt
              val channels = (1 + (id % 2)).toInt
              val nFrames = 64 + (id % 128)
              val total = (nFrames * channels).toInt
              val samples = Array.tabulate[Short](total)(i =>
                (((id * 31 + i.toLong * 17) % 65536) - 32768).toShort)
              java.nio.file.Files.write(
                java.nio.file.Paths.get(p, f"clip$id%05d.wav"),
                WavCodec.encodePcm16(rate, channels, samples,
                  extraChunk = id % 5 == 0))
            }
          }
      }
      s.read.format("binaryFile").option("pathGlobFilter", "*.wav")
        .load(tmp)
        .select(col("content")).as[Array[Byte]]
        .mapPartitions { bufs =>
          bufs.map { bytes =>
            val m = WavCodec.parse(bytes)
            (m.sampleRate.toLong, m.channels.toLong, m.nFrames,
              m.durationUs, m.sumAbs)
          }
        }
        .toDF("sample_rate", "n_channels", "nf", "dur", "sa")
        .groupBy("sample_rate", "n_channels")
        .agg(count(lit(1)).as("n_clips"), sum("nf").as("n_frames"),
          sum("dur").as("dur_us"), sum("sa").as("sum_abs"))
        .orderBy("sample_rate", "n_channels")
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
    "scan_avro_roundtrip" ->
      "SELECT doc_id, lang, text FROM documents ORDER BY doc_id",
    "scan_text_roundtrip" ->
      "SELECT text AS value FROM documents ORDER BY value",
    "scan_text_gzip" ->
      "SELECT text AS value FROM documents ORDER BY value",

    // the binaryFile read must recover every clip byte-exactly: the
    // expected profile is the same synth arithmetic multimodal_audio_meta
    // replays, restricted to the doc_id < 50 file slice
    "scan_binaryfile" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         8000 + (doc_id % 3) * 4000 AS sample_rate,
        |         1 + (doc_id % 2) AS n_channels,
        |         64 + (doc_id % 128) AS nf
        |  FROM documents WHERE doc_id < 50),
        |s AS (
        |  SELECT doc_id, sample_rate, n_channels, nf,
        |         unnest(range(0, nf * n_channels)) AS i
        |  FROM p),
        |a AS (
        |  SELECT doc_id, sample_rate, n_channels, nf,
        |         SUM(ABS(((doc_id * 31 + i * 17) % 65536) - 32768)) AS sa
        |  FROM s GROUP BY 1, 2, 3, 4)
        |SELECT CAST(sample_rate AS BIGINT) AS sample_rate,
        |       CAST(n_channels AS BIGINT) AS n_channels,
        |       CAST(COUNT(*) AS BIGINT) AS n_clips,
        |       CAST(SUM(nf) AS BIGINT) AS n_frames,
        |       CAST(SUM((nf * 1000000) // sample_rate) AS BIGINT) AS dur_us,
        |       CAST(SUM(sa) AS BIGINT) AS sum_abs
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the injected-corruption count is part of the declared semantics
    "scan_badrecords" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_clean,
        |       CAST(5 AS BIGINT) AS n_corrupt FROM nation""".stripMargin
  )
}
