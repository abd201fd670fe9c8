package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.{Tables => T}

/** SURVEY.md §2B category J (TEST rows) — the trigger-dependent
  * streaming operators that CANNOT be oracled by batch SQL: watermark
  * late-drop, dropDuplicatesWithinWatermark, and arbitrary stateful
  * processing (mapGroupsWithState).
  *
  * Each job replays the `events` table through a MemoryStream in
  * deterministic event-id-ordered chunks, with processAllAvailable()
  * after each chunk so micro-batch boundaries — and therefore watermark
  * advancement — are reproducible. The replay is harness plumbing, not
  * the operator (in production the source is Kafka/files and the same
  * query graph runs unchanged), and it is driver-memory-bounded: chunks
  * stream through `toLocalIterator` (one range-partition resident at a
  * time, never the whole table) and the reorder transforms below buffer
  * only the small held-back/reinjected slices (≤ 1/10 of one chunk).
  *
  * State design for scale: keys are user_id / event_id hashes (uniform),
  * state is O(1) per key, and watermarks bound state retention — the
  * RocksDB state store provider handles >memory state at 100 TB.
  */
object StreamingJobs {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** events as a deterministic in-order chunk ITERATOR. `orderBy` range-
    * partitions and `toLocalIterator` fetches partitions one at a time
    * in index order, so the driver holds one partition, not the table —
    * at sf≥1 the old `collect()` replay OOM'd before the query started.
    */
  private def eventChunks(spark: SparkSession, sfDir: String, nChunks: Int)
      : Iterator[Seq[Event]] = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val ds = T.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id").as[Event]
    val per = math.max(1, math.ceil(ds.count().toDouble / nChunks).toInt)
    ds.toLocalIterator().asScala.grouped(per).map(_.toSeq)
  }

  private def runToCompletion(spark: SparkSession, sfDir: String,
      sinkName: String, build: MemoryStream[Event] => DataFrame,
      outputMode: OutputMode, chunks: Int = 4,
      reorder: Iterator[Seq[Event]] => Iterator[Seq[Event]] = identity): DataFrame = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Event]
    val ckpt = Files.createTempDirectory(s"graft_ckpt_$sinkName").toString
    // modest state-partition count for the local replay (the stream pins
    // it from the session conf at first batch; state-store commit cost
    // scales with partitions × batches). Restored after the run.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    // default micro-batch trigger: each addData+processAllAvailable pair
    // is one deterministic micro-batch (AvailableNow would stop before
    // the first addData).
    val q = build(source).writeStream
      .format("memory").queryName(sinkName)
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      for (chunk <- reorder(eventChunks(spark, sfDir, chunks))) {
        source.addData(chunk)
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      // the memory sink holds the rows; the checkpoint is per-run
      // scaffolding that otherwise accumulates under /tmp
      quietDelete(java.nio.file.Paths.get(ckpt))
    }
    spark.table(sinkName)
  }

  /** FILE-source replay harness, shared by the jobs that exercise the
    * production source instead of MemoryStream: executors stage the
    * chunked table as `chunk=`-partitioned parquet, then the driver
    * moves file NAMES into the watched directory one chunk per
    * micro-batch — it never touches rows, so driver memory is flat in
    * sf and the exercised source is the one a deployment runs
    * (`readStream.schema(...).parquet(dir)`).
    *
    * Shape held once here for every file-source job: compute bounds →
    * stage (executors) → start the query over the watch dir → feed
    * chunks in order → stop → delete the scaffolding (staged copy,
    * watch dir, checkpoint — quietly: a cleanup IO hiccup must never
    * mask the job's result or original exception).
    *
    * @param mkChunk  arrival chunk from (base id-range bucket, flushTs
    *                 unused); event_id is a dense time-ordered sequence
    *                 (TESTDATA.md) so the id bucket IS the arrival order
    * @param nFlush   how many terminal flush micro-batches to append
    *                 (flush events advance the watermark past every
    *                 real window so Append mode emits them all)
    * @param start    builds AND starts the streaming query from the
    *                 watch-dir stream and a checkpoint path
    */
  private def replayFileSource(spark: SparkSession, sfDir: String, tag: String,
      nChunks: Int, mkChunk: Column => Column, nFlush: Int,
      start: (DataFrame, String) => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    import spark.implicits._
    val watch = Files.createTempDirectory(s"graft_${tag}_watch")
    val ckpt = Files.createTempDirectory(s"graft_ckpt_$tag").toString
    val ev = T.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    // bounds only — one aggregate row crosses to the driver
    val b = ev.agg(count(lit(1)).as("n"), max(col("ts")).as("maxTs")).head()
    val per = math.max(1L, math.ceil(b.getLong(0).toDouble / nChunks).toLong)
    val flushTs = new Timestamp(b.getTimestamp(1).getTime + 7L * 24 * 3600 * 1000)
    val base = floor(col("event_id") / lit(per.toDouble)).cast("long")
    val flushRows = (0 until nFlush).map(i =>
        (-(i + 1).toLong, flushTs, -1L, "___flush", 0.0, (nChunks + i).toLong))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "chunk")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    var stage: String = null
    try {
      stage = stageChunks(ev.withColumn("chunk", mkChunk(base)).unionByName(flushRows), tag)
      val q = start(spark.readStream.schema(ev.schema).parquet(watch.toString), ckpt)
      try feedChunks(stage, watch, nChunks + nFlush - 1L, q) finally q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      Seq(Option(stage).map(java.nio.file.Paths.get(_).getParent).orNull,
        watch, java.nio.file.Paths.get(ckpt)).foreach(quietDelete)
    }
  }

  private def stageChunks(rowsWithChunk: DataFrame, tag: String): String = {
    val root = Files.createTempDirectory(s"graft_fs_$tag")
    val stage = root.resolve("p").toString
    try {
      rowsWithChunk.repartition(col("chunk")).write.partitionBy("chunk").parquet(stage)
      stage
    } catch {
      // a failed staging write must not leak its partial output
      case e: Throwable => quietDelete(root); throw e
    }
  }

  /** feed chunks 0..maxChunk into `watch`, one deterministic
    * micro-batch per move+processAllAvailable pair. */
  private def feedChunks(stage: String, watch: java.nio.file.Path, maxChunk: Long,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    for (c <- 0L to maxChunk) {
      val dir = java.nio.file.Paths.get(stage, s"chunk=$c")
      if (Files.exists(dir)) {
        val listing = Files.list(dir)
        try {
          val files = listing.iterator()
          var i = 0
          while (files.hasNext) {
            val f = files.next()
            if (f.getFileName.toString.endsWith(".parquet")) {
              Files.move(f, watch.resolve(s"c${c}_$i.parquet"))
              i += 1
            }
          }
        } finally listing.close()
      }
      q.processAllAvailable()
    }

  private def deleteRecursively(root: java.nio.file.Path): Unit =
    if (root != null && Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }

  /** scaffolding cleanup never throws: state-store maintenance can
    * still touch a checkpoint between walk and delete, and a cleanup
    * failure from a finally block would mask the job's real outcome. */
  private def quietDelete(root: java.nio.file.Path): Unit =
    try deleteRecursively(root)
    catch { case scala.util.control.NonFatal(_) => () }

  /** 1-h tumbling counts with a 10-min watermark; events that arrive
    * after the watermark passed their window are DROPPED. Every 40th
    * event is shifted two chunks later to manufacture late data (a
    * column expression, not driver buffering; the %40 slice of chunk i
    * arrives with chunk i+2, capped into the first flush chunk — the
    * same lateness schedule the round-1/2 MemoryStream replay
    * produced). Replayed through the production file source via
    * [[replayFileSource]].
    */
  def watermarkLate(spark: SparkSession, sfDir: String): DataFrame = {
    val nChunks = 4
    replayFileSource(spark, sfDir, "wm", nChunks,
      base => when(col("event_id") % 40 === 0,
        least(base + 2, lit(nChunks.toLong))).otherwise(base),
      nFlush = 2,
      (stream, ckpt) => stream
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("wm_late")
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .start())
    spark.table("wm_late")
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .filter(col("event_type") =!= "___flush")
      .orderBy("ws", "event_type")
  }

  /** streaming exact dedup on event_id within the watermark horizon;
    * the replay re-sends every 10th event in the following chunk — the
    * duplicates must not survive.
    */
  def dedupStateful(spark: SparkSession, sfDir: String): DataFrame = {
    // streaming transform: buffers only the previous chunk's %10 slice
    val reinject: Iterator[Seq[Event]] => Iterator[Seq[Event]] = { chunks =>
      var prevDups: Seq[Event] = Nil
      chunks.map { c =>
        val out = c ++ prevDups
        prevDups = c.filter(e => e.event_id % 10 == 0)
        out
      }
    }
    val out = runToCompletion(spark, sfDir, "dedup_stream", src =>
      src.toDF()
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(Seq("event_id"))
        .groupBy("event_type").agg(count(lit(1)).as("n")),
      OutputMode.Complete(), chunks = 3, reorder = reinject)
    out.orderBy("event_type")
  }

  /** stream–stream interval join: purchases joined to the same user's
    * clicks within the preceding 10 minutes. Both sides are watermarked
    * so Spark can bound the join state; the time-range predicate gives
    * the state eviction condition. Counted per user for a stable
    * summary (the batch interval join is the semantic reference,
    * asserted in ScalaTest).
    */
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val out = runToCompletion(spark, sfDir, "ss_join", { src =>
      val ev = src.toDF()
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "30 minutes")
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "30 minutes")
      buys.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") < col("p_ts"))
      // 2 chunks: state still crosses a batch boundary, but fewer
      // micro-batches = fewer state-store commits; fewer watermark
      // advances can only DROP less, so batch-equality is preserved
    }, OutputMode.Append(), chunks = 2)
    out.groupBy(col("p_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  case class TypeAgg(event_type: String, n: Long, sv: Double)
  // `value` is 2-dp money stored as doubles; the state accumulates EXACT
  // Long cents (rint recovers the intended 2-dp decimal from the nearest
  // double) so the running sum is order-independent — a raw double fold
  // could drift vs the oracle's decimal SUM on half-cent boundaries.
  private def cents(v: Double): Long = math.rint(v * 100.0).toLong

  /** Spark 4 `transformWithState` variant of arbitrary state: a
    * StatefulProcessor with a typed ValueState keeps running
    * (count, Σvalue) per event_type and emits the updated aggregate
    * every batch. Same operator family as mapGroupsWithState but with
    * composable state handles (the forward-looking API).
    */
  private class TypeAggProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Event, TypeAgg] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      state = getHandle.getValueState[(Long, Double)]("agg",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[TypeAgg] = {
      val prev = Option(state.get()).getOrElse((0L, 0.0))
      // second slot holds Long cents widened to double (exact ≤ 2^53)
      val next = rows.foldLeft(prev) { case ((n, sc), e) =>
        (n + 1L, sc + cents(e.value).toDouble)
      }
      state.update(next)
      Iterator(TypeAgg(key, next._1, next._2 / 100.0))
    }
  }

  /** running per-type aggregates via the transformWithState API; the
    * final per-type row (max count) is the steady state.
    */
  def transformWithStateAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // transformWithState requires the RocksDB state store provider —
    // which is also the provider a 100 TB deployment runs for
    // larger-than-memory state. Scoped to this query, then restored.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = runToCompletion(spark, sfDir, "tws_agg", { src =>
        src.toDS()
          .groupByKey(_.event_type)
          .transformWithState(new TypeAggProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Update())
          .toDF()
      }, OutputMode.Update(), chunks = 2)
      // final state per type = the update with the largest count
      // (counts are strictly monotone per update)
      out.groupBy("event_type")
        .agg(max(struct(col("n"), col("sv"))).as("m"))
        .select(col("event_type"), col("m.n").as("n"),
          round(col("m.sv"), 2).as("sv"))
        .orderBy("event_type")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** streaming → EXTERNAL sink through foreachBatch: the watermarked
    * 1-h tumbling aggregate emitted per micro-batch into an append-only
    * parquet directory, then read back. Append mode emits each window
    * exactly once (when the watermark finalizes it), so the sink's
    * union-of-batches equals the batch aggregate — which is the oracle.
    * In production foreachBatch gets exactly-once by writing to a
    * per-batchId location (idempotent replay after failure); the replay
    * here is single-run so a plain append shows the same data path.
    * The in-order replay plus a terminal flush event (advances the
    * watermark past every real window) guarantees nothing is dropped
    * and nothing is left unemitted.
    */
  def foreachBatchSink(spark: SparkSession, sfDir: String): DataFrame = {
    val outDir = Files.createTempDirectory("graft_fb_sink").toString
    try {
      // in-order file-source replay (no lateness here): id-range
      // chunks, one terminal flush chunk so Append emits every window
      replayFileSource(spark, sfDir, "fb", nChunks = 2, base => base, nFlush = 1,
        (stream, ckpt) => stream
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("ws"), col("event_type"), col("n"))
          .writeStream
          .outputMode(OutputMode.Append())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: DataFrame, _: Long) =>
            df.write.mode("append").parquet(outDir)
          }
          .start())
      // the window aggregate is tiny — pin it to executor blocks so the
      // external sink directory can be deleted with the scaffolding
      // instead of leaking one dir per run for a lazy read-back
      spark.read.parquet(outDir)
        .filter(col("event_type") =!= "___flush")
        .select("ws", "event_type", "n")
        .orderBy("ws", "event_type")
        .localCheckpoint(true)
    } finally quietDelete(java.nio.file.Paths.get(outDir))
  }

  case class UserState(n: Long, lastSeenUs: Long)
  case class UserCount(user_id: Long, n: Long, last_seen_us: Long)

  /** arbitrary per-user state via mapGroupsWithState: running event
    * count + last-seen event time, emitted every update; the final
    * per-user row is the steady state.
    */
  def statefulCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val out = runToCompletion(spark, sfDir, "user_state", { src =>
      src.toDS()
        .groupByKey(_.user_id)
        .mapGroupsWithState[UserState, UserCount](GroupStateTimeout.NoTimeout()) {
          (user: Long, evs: Iterator[Event], state: GroupState[UserState]) =>
            val prev = state.getOption.getOrElse(UserState(0L, Long.MinValue))
            val next = evs.foldLeft(prev) { (st, e) =>
              // getTime is ms-truncated; getNanos carries the full
              // fractional second, so add back the sub-ms microseconds
              // (events.ts is µs-precision after the nanos→µs read).
              val us = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
              UserState(st.n + 1L, math.max(st.lastSeenUs, us))
            }
            state.update(next)
            UserCount(user, next.n, next.lastSeenUs)
        }.toDF()
    }, OutputMode.Update(), chunks = 2)
    // memory sink keeps one row per update; the final state per user is
    // the max count (counts are monotone).
    out.groupBy("user_id")
      .agg(max("n").as("n"), max("last_seen_us").as("last_seen_us"))
      .orderBy("user_id")
  }
}
