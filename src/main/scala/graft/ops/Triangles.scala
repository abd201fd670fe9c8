package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the canonical MapReduce graph
  * benchmark alongside BFS in Mimir's application family ([IPDPS17]
  * §V), and the clustering-coefficient signal a link-graph audit
  * reads. Implements the degree-oriented "compact-forward" scheme:
  * orient every undirected edge from its lower-(degree, id) endpoint
  * to the higher one, generate wedges only from out-neighbors, and
  * close them against the canonical edge set. Orientation bounds every
  * node's out-degree by O(√m) on skew-free graphs and — decisively —
  * caps the wedge blow-up of hub nodes: a degree-D hub generates ZERO
  * wedges from its in-edges, so the shuffled wedge volume is
  * Σ outdeg² ≪ Σ deg², which is what makes the plan survive a
  * power-law graph at 100× scale. Every step is an equi-join or a
  * hash aggregate; the degree table is dimension-sized and broadcasts.
  */
object Triangles {

  /** @param edges DataFrame with `src`, `dst` long columns (directed
    *              multigraph in; self-loops and duplicates dropped)
    * @return (node, n_tri) — per-node triangle participation counts
    *         (each triangle counts once for each of its 3 corners)
    */
  def perNode(edges: DataFrame): DataFrame = {
    val (und, _, wedges) = stages(edges)
    val tris = wedges.join(und, col("y") === col("a") && col("z") === col("b"))
    tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }

  /** the algorithm's three intermediates — (canonical undirected edges,
    * degree-oriented DAG, open wedges) — exposed so GraphBaseline can
    * measure the actual shuffle volumes the Σ outdeg² bound predicts
    * and PlanSpec/bench tooling can inspect stages without duplicating
    * the construction. */
  private[graft] def stages(edges: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    // simple undirected edge set, canonical a < b; read three times
    // below (degrees, orientation, closing probe) — pin it
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, node) — a total order, so exactly one direction
    // survives per edge and every triangle has exactly one "apex" x
    // with out-edges to both of its other corners
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val dag = und
      .join(broadcast(deg.toDF("a", "da")), "a")
      .join(broadcast(deg.toDF("b", "db")), "b")
      .select(when(lowFirst, col("a")).otherwise(col("b")).as("x"),
        when(lowFirst, col("b")).otherwise(col("a")).as("y"))
      .localCheckpoint(true) // the wedge self-join reads it twice
    // wedges from each apex's out-neighborhood, emitted in canonical
    // id order (y < z) so the closing probe is an equi-join against
    // the canonical edge set itself
    val wedges = dag
      .join(dag.select(col("x"), col("y").as("z")), Seq("x"))
      .filter(col("y") < col("z"))
    (und, dag, wedges)
  }
}
