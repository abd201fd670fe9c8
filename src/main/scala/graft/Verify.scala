package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfArg, outDir, onlyNames @ _*) = args
    val only = onlyNames.toSet // empty = run everything (driver mode)
    // multi-SF sweep mode (round-8): a comma-separated first arg runs
    // the full inventory once per scale factor in ONE JVM/session,
    // dumping to outDir/<sf-basename>/. The single-SF layout — what the
    // driver's t2 gate invokes — is byte-identical to before.
    val sfDirs = sfArg.split(',').toSeq
    // two sfDirs sharing a basename would silently collide in one dest
    // dir (r8 ADVICE) — reject up front, before any compute
    require(sfDirs.map(p => Paths.get(p).getFileName.toString).distinct.size == sfDirs.size,
      s"duplicate sf-dir basenames in $sfArg")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // default INT96 timestamp output is kept deliberately: it
      // serializes naive wall-clock values, matching the oracle's naive
      // TIMESTAMPs when the driver re-reads the dumps (TIMESTAMP_MICROS
      // would tag isAdjustedToUTC=true and read back tz-aware).
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Tmp.dir("wh").toString)
      .config("spark.local.dir", Tmp.dir("local").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark) // native exprs + the HOF-dot rewrite rule
    new java.io.File(outDir).mkdirs()
    for (sfDir <- sfDirs) {
      val dest =
        if (sfDirs.length == 1) outDir
        else s"$outDir/${Paths.get(sfDir).getFileName}"
      SparkEntry.queries
        .filter { case (name, _) => only.isEmpty || only(name) }
        .foreach { case (name, fn) =>
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$dest/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // sweep mode: tools/check.py reads <dir>/oracle_sql.json per SF dir
    if (sfDirs.length > 1) sfDirs.foreach { sfDir =>
      val dest = Paths.get(outDir, Paths.get(sfDir).getFileName.toString)
      // the dir only exists if ≥1 parquet write succeeded for this SF —
      // an all-failed SF must not throw away the other SFs' summary
      // (r8 ADVICE)
      Files.createDirectories(dest)
      Files.writeString(dest.resolve("oracle_sql.json"), json)
    }
    spark.stop()
  }
}
