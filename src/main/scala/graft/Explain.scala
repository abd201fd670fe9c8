package graft
import org.apache.spark.sql.SparkSession

/** Plan audit: prints the formatted physical plan of the named queries
  * (default: a representative set) so broadcast choices, pushed filters,
  * read schemas, and codegen spans can be inspected.
  *
  * Usage: tools/run.sh graft.Explain [sfDir] [query ...]
  * env: GRAFT_PLANS_OUT=<dir> additionally writes one <dir>/<key>.txt
  * per query and REFUSES to leave a 0-byte file (r17 shipped two empty
  * dump files for dedup_minhash_lsh because this tool didn't register
  * GraftFunctions — the native-expr keys crashed after the shell
  * redirect had already created the file; r17 verdict #6).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("join_5way_flagship", "agg_group_pricing", "project_exprs",
        "win_topk_per_group", "topk_limit", "dedup_jaccard_pairs")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark) // native-expr keys (minhash/bloom/md5)
    val outDir = sys.env.get("GRAFT_PLANS_OUT")
    outDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    def formatted(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // keys whose plan embeds the memoized Jaccard mining: the query
    // plans as an InMemoryTableScan whose cached subtree formatted-
    // explain never expands, so the raw mining plan is printed too
    val miningBacked = Set("dedup_jaccard_pairs", "dedup_cluster_cc", "dedup_keeplist")
    var failed = List.empty[String]
    names.foreach { n =>
      println(s"\n===== $n =====")
      val txt =
        try {
          val base =
            if (n == "dedup_jaccard_pairs")
              formatted(graft.queries.DedupQueries.minePairs(spark, sfDir))
            else {
              val main = formatted(SparkEntry.queries(n)(spark, sfDir))
              if (miningBacked(n))
                main + s"\n----- $n: raw Jaccard mining subplan (memoized above) -----\n" +
                  formatted(graft.queries.DedupQueries.minePairs(spark, sfDir))
              else main
            }
          println(base)
          base
        } catch { case e: Throwable =>
          System.err.println(s"explain($n) FAILED: $e")
          failed ::= n
          ""
        }
      outDir.foreach { d =>
        val p = java.nio.file.Paths.get(d, s"$n.txt")
        if (txt.trim.isEmpty) { // refuse 0-byte dumps (r17 verdict #6)
          System.err.println(s"explain($n): EMPTY plan — not writing $p")
          failed ::= n
        } else
          java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      }
    }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"explain: FAILED keys: ${failed.distinct.mkString(", ")}")
      sys.exit(1)
    }
  }
}
