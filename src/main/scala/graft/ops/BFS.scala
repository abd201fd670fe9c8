package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Level-synchronous BFS over an edge list — the general form of
  * Mimir's BFS application ([IPDPS17] §V): iterate (frontier ⋈ edges) →
  * new frontier minus visited, until the frontier is empty.
  *
  * The driver loop carries only a row COUNT per level (the frontier
  * itself stays distributed and partition-cached); each level is one
  * shuffle on the join key plus an anti-join against visited — exactly
  * the plan a 1000-executor BFS wants. Frontiers are persisted so a
  * level isn't recomputed by its successor, and unpersisted as soon as
  * the next level materializes.
  */
object BFS {

  /** @param edges DataFrame with `src`, `dst` string columns
    * @param roots DataFrame with a `node` string column (level 0)
    * @return DataFrame of (node, level) — first-visit level per node
    */
  def levels(edges: DataFrame, roots: DataFrame, maxLevels: Int = 30): DataFrame = {
    // per-level frontiers stay persisted until the session drops them:
    // `visited` is the union of every frontier, so an early unpersist
    // would force full recomputation when the result is consumed.
    var frontier = roots.select(col("node")).distinct()
      .withColumn("level", lit(0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = frontier
    var level = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0 && level < maxLevels) {
      level += 1
      val next = edges
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("level", lit(level))
        .persist(StorageLevel.MEMORY_AND_DISK)
      frontierSize = next.count() // materializes `next`; cuts lineage growth
      visited = visited.unionAll(next)
      frontier = next
    }
    visited
  }
}
