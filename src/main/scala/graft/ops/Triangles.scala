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
  /** @param bloomPrune Bloom-filter the open wedges against the edge
    *        set before the closing shuffle (see [[prune]]). OFF by
    *        default: A/B-measured at sf0.1 local[32] (BASELINE.md
    *        §graph-scale), the plain shape wins — the shuffle is
    *        RAM-backed, so shipping the 5–9% closing survivors plus
    *        the dead 91–95% costs less than building the 2 MB filter.
    *        Turn it on when the closing exchange is NETWORK-bound
    *        (multi-rack clusters): the pruned shuffle is 3.7× / 20.8×
    *        smaller (quotient / raw co-purchase, measured row counts)
    *        for one 2 MB broadcast. Result-identical either way —
    *        both paths run against the same brute-force reference in
    *        OpsSpec. */
  def perNode(edges: DataFrame, bloomPrune: Boolean = false): DataFrame = {
    val (und, _, wedges) = stages(edges)
    val probe = if (bloomPrune) prune(und, wedges) else wedges
    val tris = probe
      .join(und, col("y") === col("a") && col("z") === col("b"))
    tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }

  /** Bloom-prune open wedges against the canonical edge set BEFORE the
    * closing shuffle: wedge→triangle selectivity is low — measured
    * 26.7% quotient / 4.8% raw co-purchase (BASELINE.md §graph-scale)
    * — so the closing join's shuffle input is mostly rows the probe
    * will discard. A ~2 MB Bloom of xxhash64(a,b) over the edge set
    * drops the dead wedges map-side between the wedge join and the
    * closing exchange. The hash is Spark-internal — no cross-engine
    * contract to honor — false positives die in the closing equi-join
    * (measured fpp 0.22% on the raw graph), and false negatives are
    * impossible, so the RESULT is unchanged. Sizing: 16 M bits / 2 M
    * est. items; at larger edge counts the filter degrades gracefully
    * toward no-op pruning, never toward wrong answers. */
  private[graft] def prune(und: DataFrame, wedges: DataFrame): DataFrame = {
    graft.GraftFunctions.register(und.sparkSession)
    // might_contain demands a CONSTANT (or scalar subquery) filter, so
    // the bloom rides as a literal: the aggregation itself is
    // distributed (partial blooms OR-merged), only the finished 2 MB
    // filter crosses the driver — a bounded scalar sized by the
    // literals, not the data (the snapshot-diff base exception) — and
    // ships to executors once per stage in the broadcast task binary.
    val bf = und.agg(expr(
      "graft_bloom_agg(xxhash64(a, b), CAST(2000000 AS LONG), CAST(16000000 AS LONG))").as("bf"))
      .head.getAs[Array[Byte]](0)
    wedges
      .filter(call_function("graft_might_contain", lit(bf),
        xxhash64(col("y"), col("z"))))
      .select("x", "y", "z")
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
