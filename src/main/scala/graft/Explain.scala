package graft
import org.apache.spark.sql.SparkSession

/** Plan audit: prints the formatted physical plan of the named queries
  * (default: a representative set) so broadcast choices, pushed filters,
  * read schemas, and codegen spans can be inspected.
  *
  * Usage: tools/run.sh graft.Explain [sfDir] [query ...]
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
    // keys whose plan embeds the memoized Jaccard mining: the query
    // plans as an InMemoryTableScan whose cached subtree formatted-
    // explain never expands, so the raw mining plan is printed too
    val miningBacked = Set("dedup_jaccard_pairs", "dedup_cluster_cc", "dedup_keeplist")
    names.foreach { n =>
      println(s"\n===== $n =====")
      if (n == "dedup_jaccard_pairs")
        graft.queries.DedupQueries.minePairs(spark, sfDir).explain("formatted")
      else {
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
        if (miningBacked(n)) {
          println(s"----- $n: raw Jaccard mining subplan (memoized above) -----")
          graft.queries.DedupQueries.minePairs(spark, sfDir).explain("formatted")
        }
      }
    }
    spark.stop()
  }
}
