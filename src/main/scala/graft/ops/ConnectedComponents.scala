package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Min-label propagation connected components over an undirected pair
  * list — the step a dedup pipeline runs AFTER near-dup pair mining:
  * pairs → duplicate clusters → keep one representative per cluster.
  *
  * Same driver-loop discipline as [[BFS]]: the labels stay distributed
  * (persisted per round, materialized by the convergence count, old
  * round unpersisted), the driver carries only a changed-row count, and
  * each round is one shuffle-join on vertex id plus a min-aggregate —
  * rounds needed = graph diameter (dup clusters are shallow; the cap is
  * a safety net, not a tuning knob).
  */
object ConnectedComponents {

  /** @param pairs DataFrame with two long columns `a`, `b` (one row per
    *              undirected edge)
    * @return DataFrame (v, rep): every vertex of the pair graph mapped
    *         to the minimum vertex id reachable from it
    */
  def labels(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    val edges = pairs.select(col("a").as("u"), col("b").as("v"))
      .unionAll(pairs.select(col("b").as("u"), col("a").as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var rep = edges.select(col("u")).distinct()
      .select(col("u").as("v"), col("u").as("rep"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      round += 1
      val msgs = edges.join(rep.select(col("v").as("u"), col("rep")), "u")
        .select(col("v"), col("rep"))
      val next = rep.unionAll(msgs).groupBy("v").agg(min("rep").as("rep"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.join(rep.select(col("v"), col("rep").as("prev")), "v")
        .filter(col("rep") < col("prev")).count() // materializes `next`
      rep.unpersist()
      rep = next
    }
    edges.unpersist()
    rep
  }
}
