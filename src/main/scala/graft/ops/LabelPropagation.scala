package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (LPA).
  *
  * Round 0 seeds every node with its own id as label; each round, every
  * node adopts the MODE of its neighbors' current labels, ties broken
  * toward the SMALLEST label — fully deterministic, so a fixed-round
  * run is CTE-unrollable for the DuckDB oracle (the PageRank/KCore
  * iteration precedent). Synchronous update (all nodes flip together)
  * rather than the classic asynchronous sweep: async depends on visit
  * order, which no declarative engine can replay.
  *
  * Scale shape per round: one shuffle join (edge list against the
  * label table, keyed on the neighbor id — both sides hash-partition;
  * the label table is V rows so it broadcasts when small), one
  * partial-aggregated (node, label) count, and one tie-safe argmax via
  * `max(struct(cnt, -label))` — a hash aggregate, never a window, so a
  * deg-10⁶ hub contributes partial counts from every map task instead
  * of a single-reducer sort. R rounds = R such stages; labels converge
  * toward dense-community consensus.
  */
object LabelPropagation {

  /** adj: directed adjacency (node, nbr) with BOTH directions present
    * for an undirected graph, deduped. Returns (node, community).
    */
  def run(adj: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var labels = adj.select(col("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to rounds) {
      val counts = adj
        .join(labels.select(col("node").as("nbr"), col("lbl")), "nbr")
        .groupBy("node", "lbl")
        .agg(count(lit(1)).as("cnt"))
      labels = counts
        .groupBy("node")
        .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("lbl"))
    }
    labels.withColumnRenamed("lbl", "community")
  }
}
