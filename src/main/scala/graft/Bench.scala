package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE complete JSON line (the driver's BENCH_r{N} capture).
  *
  * Hygiene learned from round 1: the r01 capture was head-truncated and
  * a thrown query was recorded as a fast timing. So (a) the JSON line is
  * compact (3-dp times) and printed LAST, (b) failed queries are
  * recorded as value -1 AND listed in "failed", (c) the full result is
  * also written to /root/repo/bench_prev.json, which the NEXT run reads
  * to emit a "vs_prev" per-query delta section for regression diffing.
  */
object Bench {
  private val PrevPath = "/root/repo/bench_prev.json"

  /** minimal parser for the "queries":{"k":v,...} section we wrote. */
  private def readPrev(): Map[String, Double] =
    try {
      val txt = new String(Files.readAllBytes(Paths.get(PrevPath)), "UTF-8")
      val m = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt)
      m.map(_.group(1).split(",").flatMap { kv =>
        kv.split(":") match {
          case Array(k, v) => Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.toDouble)
          case _ => None
        }
      }.toMap).getOrElse(Map.empty)
    } catch { case _: Throwable => Map.empty }

  private def f3(d: Double): String = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JVM/codegen/parquet-reader paths, so per-query
    // numbers reflect steady state rather than first-job init cost.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val prev = readPrev()
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f3(v) else "-1") }.mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val vsPrev = results.collect { case (k, v, true) if prev.get(k).exists(_ >= 0) =>
      "\"" + k + "\":" + f3(v - prev(k)) }.mkString("{", ",", "}")
    val total = results.filter(_._3).map(_._2).sum
    val json = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"failed":$failed,"vs_prev":$vsPrev,"sf":"$sfDir"}"""
    try Files.write(Paths.get(PrevPath), json.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
    // printed last so log noise can't interleave into the capture
    println(json)
  }
}
