package graft

import java.nio.file.Files

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Failure-injection suite (r14 verdict #3): the 100 TB posture
  * assumes task retries preserve results — batch plans recompute a
  * failed partition from lineage, and the batchId-keyed foreachBatch
  * sinks commit idempotently under a mid-write task failure. Each test
  * plants a task that throws on its FIRST attempt only
  * (TaskContext.attemptNumber == 0 at a chosen partition — no shared
  * mutable state, so the guard is correct across executors too) and
  * asserts the retried run's results are identical to a clean run.
  * Requires the suite session's local[4, 2] master (maxTaskFailures=2;
  * plain local mode fails the job on the first task failure).
  */
class FaultInjectionSpec extends SparkSpec {

  /** throw on the first attempt of one partition, pass through after.
    * Returns a standalone lambda capturing only the Int — an
    * eta-expanded member method would capture `this` (a non-
    * serializable ScalaTest suite) and fail closure cleaning. */
  private def inject[T](part: Int): (Int, Iterator[T]) => Iterator[T] = {
    val p = part
    (i, it) =>
      if (i == p && TaskContext.get().attemptNumber() == 0)
        throw new RuntimeException(s"injected first-attempt failure @ partition $i")
      else it
  }

  private def canonical(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("heavy batch key: result-stage retry is hash-identical to the clean run") {
    // a key with real shuffles + the checkpointed mining pipeline; the
    // injected failure lands in the collect stage, whose retry re-reads
    // the key's shuffle/checkpoint outputs for that partition
    val df = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
    val clean = canonical(df.collect())
    val retried = canonical(
      df.rdd.mapPartitionsWithIndex(inject[Row](0)).collect())
    assert(clean.nonEmpty && retried == clean)
  }

  test("map-side retry upstream of a shuffle: aggregate unchanged") {
    // the failure hits a SCAN-side task; its retry re-reads the input
    // split and re-emits map output, and the downstream reduce must
    // see exactly-once data (Spark's shuffle consumes one committed
    // map output per (map, reduce) pair)
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
    def counts(injectFirst: Boolean): Map[String, Long] = {
      val rdd0 = base.select(col("l_returnflag")).rdd.map(_.getString(0))
      val rdd = if (injectFirst) rdd0.mapPartitionsWithIndex(inject[String](0)) else rdd0
      rdd.map(_ -> 1L).reduceByKey(_ + _).collect().toMap
    }
    val clean = counts(injectFirst = false)
    val retried = counts(injectFirst = true)
    assert(clean.nonEmpty && retried == clean)
  }

  test("foreachBatch sink: mid-write task failure commits exactly-once parquet") {
    import spark.implicits._
    val in = Tmp.dir("fi_in")
    val outClean = Tmp.dir("fi_out_clean").toString
    val outInjected = Tmp.dir("fi_out_inj").toString
    spark.range(0, 1000L).select(col("id"), (col("id") % 7).as("k"))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$in/data")

    def run(out: String, injectFirst: Boolean): Unit = {
      val q = spark.readStream
        .schema("id LONG, k LONG")
        .parquet(s"$in/data")
        .writeStream
        .option("checkpointLocation", Tmp.dir("fi_ckpt").toString)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val rows = if (injectFirst)
            batch.as[(Long, Long)].rdd.mapPartitionsWithIndex(inject[(Long, Long)](0))
              .toDF("id", "k")
          else batch
          // the injected failure lands INSIDE this write job: the task
          // fails after the committer set up its attempt, the retry
          // rewrites the partition, and only the committed attempt's
          // files may appear in the sink
          rows.write.mode("overwrite").parquet(s"$out/batch=$id")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
    }
    run(outClean, injectFirst = false)
    run(outInjected, injectFirst = true)
    val clean = canonical(spark.read.parquet(outClean).select("id", "k").collect())
    val injected = canonical(spark.read.parquet(outInjected).select("id", "k").collect())
    assert(clean.length == 1000)
    assert(injected == clean)
  }
}
