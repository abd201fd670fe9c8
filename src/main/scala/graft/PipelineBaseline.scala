package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pipeline-scale measurement (the GraphBaseline pattern for the corpus
  * pipeline): counts the actual intermediate volumes behind
  * pipeline_corpus / dedup_span_* at every SF, so the scale claims in
  * the query comments ("reconstruction explodes only the few-% touched
  * slice", "the funnel re-runs only on the delta") are backed by
  * counted rows rather than prose. Re-runnable:
  * `sbt "runMain graft.PipelineBaseline"` → one markdown table row per
  * SF (pasted into BASELINE.md §pipeline-scale).
  */
object PipelineBaseline {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Tmp.dir("local").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("| sf | docs | tokens | covered pos | covered % | touched docs | touched % | p4 survivors | corpus rows | clean chars |")
    println("|---|---|---|---|---|---|---|---|---|---|")
    sfs.foreach { d =>
      val docs = Tables.documents(spark, d)
      val nDocs = docs.count()
      val nTok = docs
        .select(sum(size(graft.ops.TextOps.tokens(col("text")))).as("n"))
        .head.getLong(0)
      val cov = graft.queries.PipelineQueries.spanCoveredOn(docs)
      val covered = cov.count()
      val touched = cov.select("doc_id").distinct().count()
      val p4 = SparkEntry.queries("pipeline_funnel")(spark, d)
        .filter(col("stage") === "04_exact_dedup").head.getLong(1)
      val corpus = SparkEntry.queries("pipeline_corpus")(spark, d)
        .agg(count(lit(1)).as("n"), sum("clean_chars").as("ch")).head
      val sf = d.split("/").last
      println(f"| $sf | $nDocs | $nTok | $covered | ${100.0 * covered / nTok}%.2f%% " +
        f"| $touched | ${100.0 * touched / nDocs}%.2f%% | $p4 " +
        f"| ${corpus.getLong(0)} | ${corpus.getLong(1)} |")
    }
    spark.stop()
  }
}
