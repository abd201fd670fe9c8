package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hub-skew A/B probe for ops/PairMining (r13): on a synthetic
  * power-law (key, item) relation with ONE hub key of degree d plus a
  * cold background, times the naive inverted-index self-join (the hub's
  * C(d,2) pair fan rides a single join key = one task) against the
  * chunk-bucketed cooccur, and reports the LONGEST TASK per pass — the
  * straggler signal that decides wall-clock on a real cluster, where
  * one 134 M-row task pins a core while 31 idle.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.map(_.toInt).getOrElse(16384)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Tmp.dir("wh").toString)
      .config("spark.local.dir", graft.Tmp.dir("local").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val maxTask = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) maxTask.getAndUpdate(m => math.max(m, e.taskInfo.duration))
    })

    // hub key 0 carries d distinct items; 10 000 cold keys carry 8 each
    val hub = spark.range(d).select(lit(0L).as("k"), col("id").as("v"))
    val cold = spark.range(10000L * 8).select(
      (col("id") % 10000L + 1L).as("k"), (col("id") + 1000000L).as("v"))
    val rows = hub.unionAll(cold).repartition(32).localCheckpoint(true)

    def run(label: String)(pairs: => DataFrame): Unit = {
      maxTask.set(0)
      val t0 = System.nanoTime()
      val n = pairs.agg(count(lit(1)), sum("n")).collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // listener settle
      println(f"$label%-22s wall ${wall}%7.2f s  longest task ${maxTask.get / 1000.0}%7.2f s  " +
        f"distinct pairs ${n.getLong(0)}%d  sum n ${n.getLong(1)}%d")
    }

    def runCount(label: String)(df: => DataFrame): Unit = {
      maxTask.set(0)
      val t0 = System.nanoTime()
      val n = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"$label%-22s wall ${wall}%7.2f s  longest task ${maxTask.get / 1000.0}%7.2f s  rows $n%d")
    }

    // component isolation for the chunked path — a DELIBERATE inline
    // copy of PairMining.cooccur's interior (window df, chunk hash,
    // two-sided explode): if cooccur's chunking changes, re-sync these
    // stages or the component timings stop describing the shipped
    // operator (the full-pipeline A/B below always measures the real
    // cooccur, so the headline numbers cannot desynchronize)
    import org.apache.spark.sql.expressions.Window
    def base(cap: Int) = rows
      .withColumn("df", count(lit(1)).over(Window.partitionBy("k")))
      .withColumn("ng", expr(s"(df + ${cap - 1}) div $cap"))
      .withColumn("c", pmod(xxhash64(col("v")), col("ng")))
    def xsOf(b: DataFrame) = b.select(col("k"), col("v").as("xv"), col("c").as("b1"),
      explode(sequence(col("c"), col("ng") - 1)).as("b2"))
    def ysOf(b: DataFrame) = b.select(col("k"), col("v").as("yv"),
      explode(sequence(lit(0L), col("c"))).as("b1"), col("c").as("b2"))

    for (round <- 1 to 2) {
      println(s"--- round $round (hub degree $d, C(d,2) = ${d.toLong * (d - 1) / 2} pairs)")
      runCount("explode sides only") { val b = base(64); xsOf(b).unionAll(ysOf(b)) }
      runCount("join, no final agg") {
        val b = base(64)
        xsOf(b).join(ysOf(b).hint("SHUFFLE_HASH"), Seq("k", "b1", "b2"))
          .filter(col("b1") =!= col("b2") || col("xv") < col("yv"))
      }
      runCount("naive join, no agg") {
        rows.as("x").join(rows.as("y"),
          col("x.k") === col("y.k") && col("x.v") < col("y.v"))
      }
      run("PairMining cap=64") {
        graft.ops.PairMining.cooccur(rows, "k", "v", 64)
      }
      run("naive self-join") {
        rows.as("x").join(rows.as("y"),
            col("x.k") === col("y.k") && col("x.v") < col("y.v"))
          .groupBy(col("x.v").as("a"), col("y.v").as("b"))
          .agg(count(lit(1)).as("n"))
      }
    }
    spark.stop()
  }
}
