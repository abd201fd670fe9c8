package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** throwaway A/B probe for the graph_jaccard_neighbors candidate
  * generation (r13 verdict #3) — times the naive self-join, the
  * chunked PairMining path, and the components, in ONE warm JVM.
  */
object JaccardProbe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Tmp.dir("wh").toString)
      .config("spark.local.dir", graft.Tmp.dir("local").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.{Tables => T}
    val und = T.orders(spark, d).select(
        pmod(col("o_custkey"), lit(1000L)).as("src"),
        pmod(col("o_orderkey"), lit(1000L)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val adj = und.select(col("src").as("node"), col("dst").as("nbr"))
      .unionAll(und.select(col("dst").as("node"), col("src").as("nbr")))
      .distinct()
      .localCheckpoint(true)
    println(s"adj rows: ${adj.count()}")

    def run(label: String)(inter: => DataFrame): Unit = time(label) {
      val deg = adj.groupBy("node").agg(count(lit(1)).as("deg"))
      inter
        .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
        .withColumn("j", round(col("ni").cast("double")
          / (col("da") + col("db") - col("ni")), 6))
        .orderBy(col("j").desc, col("a"), col("b"))
        .limit(25)
        .select("a", "b", "ni", "j")
        .collect()
    }

    for (round <- 1 to 2) {
      println(s"--- round $round")
      run("naive self-join") {
        adj.as("x").join(adj.as("y"),
            col("x.nbr") === col("y.nbr") && col("x.node") < col("y.node"))
          .groupBy(col("x.node").as("a"), col("y.node").as("b"))
          .agg(count(lit(1)).as("ni"))
      }
      run("naive shuffle_hash hint") {
        adj.as("x").join(adj.as("y").hint("SHUFFLE_HASH"),
            col("x.nbr") === col("y.nbr") && col("x.node") < col("y.node"))
          .groupBy(col("x.node").as("a"), col("y.node").as("b"))
          .agg(count(lit(1)).as("ni"))
      }
      run("PairMining cap=64") {
        graft.ops.PairMining.cooccur(adj, "nbr", "node", 64)
          .withColumnRenamed("n", "ni")
      }
      run("PairMining cap=512") {
        graft.ops.PairMining.cooccur(adj, "nbr", "node", 512)
          .withColumnRenamed("n", "ni")
      }
      // posting-list explode WITHOUT chunking (dedup_jaccard device)
      run("posting-list explode") {
        adj.groupBy("nbr").agg(array_sort(collect_list("node")).as("ds"))
          .select(explode(expr(
            "flatten(transform(ds, (x, i) -> " +
              "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"))
            .as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(count(lit(1)).as("ni"))
      }
    }
    spark.stop()
  }
}
