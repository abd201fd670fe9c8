package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the triangle operator's actual intermediate volumes on the
  * graphs the bench keys run (quotient + raw co-purchase), printing ONE
  * JSON line — the numbers behind BASELINE.md §graph-scale. The point
  * is to confirm the compact-forward claim with data, not prose: the
  * shuffled wedge volume equals Σ outdeg²-ish after orientation and is
  * orders of magnitude below the un-oriented Σ deg² a naive wedge join
  * would ship. Re-run with `sbt "runMain graft.GraphBaseline"`
  * (SPARK_GRAFT_SF_DIR selects the scale, default sf0.1).
  */
object GraphBaseline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Tmp.dir("wh").toString)
      .config("spark.local.dir", Tmp.dir("local").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def measure(tag: String, edges: DataFrame): String = {
      val (und, dag, wedges) = ops.Triangles.stages(edges)
      val m = und.count()
      // un-oriented wedge volume: what a naive (join on either
      // endpoint) wedge generation would shuffle — Σ deg·(deg−1)/2
      val naive = und.select(col("a").as("node"))
        .unionAll(und.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .agg(sum(col("deg") * (col("deg") - 1) / 2).cast("long")).head.getLong(0)
      // oriented wedge volume: Σ outdeg·(outdeg−1)/2 — the bound the
      // wedge count below must land on exactly
      val bound = dag.groupBy("x").agg(count(lit(1)).as("od"))
        .agg(sum(col("od") * (col("od") - 1) / 2).cast("long")).head.getLong(0)
      val w = wedges.count()
      // what actually reaches the closing exchange after the bloom
      val pruned = ops.Triangles.prune(und, wedges).count()
      val tris = wedges
        .join(und, col("y") === col("a") && col("z") === col("b")).count()
      s""""$tag":{"edges":$m,"wedges_naive":$naive,"wedges_bound":$bound,"wedges":$w,"wedges_after_bloom":$pruned,"triangles":$tris}"""
    }

    val quotient = Tables.orders(spark, sfDir).select(
      pmod(col("o_custkey"), lit(1000L)).as("src"),
      pmod(col("o_orderkey"), lit(1000L)).as("dst"))
    val op = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val copurchase = op
      .join(op.withColumnRenamed("p", "p2"), "ok")
      .filter(col("p") < col("p2"))
      .select(col("p").as("src"), col("p2").as("dst"))

    val parts = Seq(
      measure("quotient_1000", quotient),
      measure("copurchase_raw", copurchase))
    spark.stop()
    println(s"""{"sf":"$sfDir",${parts.mkString(",")}}""")
  }
}
