package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Per-JOB wall breakdown for one or more SparkEntry keys: runs each key
  * in a Bench-identical session (local[32], shuffle.partitions=32) and
  * prints every Spark job the key submitted with its wall time, task
  * count, and the job's callSite — so "key X costs 7 s" decomposes into
  * "checkpoint build 1.2 s + wedge close 3.8 s + ...". Guide §1
  * (measure first) tooling: read-only, never part of a query path.
  *
  *   tools/run.sh graft.tools.JobProfile <sfDir> key1 [key2 ...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = args.drop(1).toSeq
    require(keys.nonEmpty, "usage: JobProfile <sfDir> key...")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Tmp.dir("wh").toString)
      .config("spark.local.dir", graft.Tmp.dir("local").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.register(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/lineitem.parquet").count()

    case class J(start: Long, var end: Long, nTasks: Int, site: String,
        stages: Seq[Int])
    val jobs = TrieMap[Int, J]()
    val stageTasks = TrieMap[Int, Vector[Long]]() // stageId -> task ms
    val stageBytes = TrieMap[Int, (Long, Long)]() // shuffle read, write
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(e.jobId,
          J(e.time, -1L, e.stageInfos.map(_.numTasks).sum, site,
            e.stageInfos.map(_.stageId)))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val dur = Option(e.taskInfo).map(_.duration).getOrElse(0L)
        stageTasks.updateWith(e.stageId)(v => Some(v.getOrElse(Vector.empty) :+ dur))
        val m = Option(e.taskMetrics)
        val r = m.map(_.shuffleReadMetrics.totalBytesRead).getOrElse(0L)
        val w = m.map(_.shuffleWriteMetrics.bytesWritten).getOrElse(0L)
        stageBytes.updateWith(e.stageId) {
          case Some((a, b)) => Some((a + r, b + w)); case None => Some((r, w))
        }
      }
    })

    // streaming keys: per-micro-batch duration breakdown from the
    // engine's own progress events (triggerExecution = total; the rest
    // decompose the driver-side gap the job listener cannot see)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          import scala.jdk.CollectionConverters._
          val d = e.progress.durationMs.asScala.toSeq.sortBy(-_._2)
            .map { case (n, v) => s"$n=$v" }.mkString(" ")
          val wm = Option(e.progress.eventTime)
            .map(_.asScala.getOrElse("watermark", "-")).getOrElse("-")
          println(s"      batch ${e.progress.batchId} rows=${e.progress.numInputRows} wm=$wm $d")
        }
      })

    for (k <- keys) {
      jobs.clear(); stageTasks.clear(); stageBytes.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(k)(spark, d).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let the async listener bus drain before reading
      Thread.sleep(500)
      println(f"\n===== $k: $wall%.2f s total ($n rows) =====")
      val js = jobs.toSeq.sortBy(_._1)
      var covered = 0L
      js.foreach { case (id, j) =>
        val ms = if (j.end > 0) j.end - j.start else -1L
        covered += math.max(0L, ms)
        println(f"  job $id%3d ${ms / 1000.0}%7.2f s  ${j.nTasks}%4d tasks  ${j.site}")
        j.stages.sorted.foreach { sid =>
          stageTasks.get(sid).filter(_.nonEmpty).foreach { ds =>
            val s = ds.sorted
            val (rd, wr) = stageBytes.getOrElse(sid, (0L, 0L))
            println(f"      stage $sid%3d: ${s.length}%4d tasks  med ${s(s.length / 2)}%6d ms  max ${s.last}%6d ms  sum ${s.sum / 1000.0}%8.1f s  shufR ${rd / 1048576.0}%7.1f MB  shufW ${wr / 1048576.0}%7.1f MB")
          }
        }
      }
      println(f"  jobs sum ${covered / 1000.0}%.2f s of $wall%.2f s wall (gap = driver/planning)")
    }
    spark.stop()
  }
}
