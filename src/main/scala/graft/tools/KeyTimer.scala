package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-key wall-clock probe: runs the named SparkEntry keys in
  * ONE warm JVM, cold memo/cache state per sample (the Bench contract),
  * two samples each, min kept. For adjudicating single-key timing
  * questions without a full Bench pass.
  *
  *   sbt "runMain graft.tools.KeyTimer <sfDir> key1 key2 ..."
  */
object KeyTimer {
  def main(rawArgs: Array[String]): Unit = {
    // --keep-memo: do NOT clear SessionMemo/cache between samples —
    // the Bench-like billing where a family's shared mining is paid by
    // the first key that touches it and later keys ride it warm
    val keepMemo = rawArgs.contains("--keep-memo")
    val args = rawArgs.filterNot(_.startsWith("--"))
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = args.drop(1).toSeq
    require(keys.nonEmpty, "usage: KeyTimer [--keep-memo] <sfDir> key...")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Tmp.dir("wh").toString)
      .config("spark.local.dir", graft.Tmp.dir("local").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.register(spark) // keys using native exprs (Bench parity)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warm-up
    spark.read.parquet(s"$d/lineitem.parquet").count()
    for (k <- keys) {
      val samples = (1 to 2).map { _ =>
        if (!keepMemo) {
          spark.catalog.clearCache()
          graft.SessionMemo.clear(spark)
        }
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(k)(spark, d).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = samples.map(_._1).min
      println(f"$k%-28s ${best}%6.2f s  (${samples.map(s => f"${s._1}%.2f").mkString("/")}; ${samples.head._2} rows)")
    }
    spark.stop()
  }
}
