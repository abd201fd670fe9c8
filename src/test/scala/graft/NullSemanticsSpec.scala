package graft

import org.apache.spark.sql.functions._

/** Pins the countDistinct-rewrite NULL contract (r14 ADVICE).
  *
  * The Expand-avoiding rewrite (each COUNT(DISTINCT x) as its own
  * filter-distinct-count subtree joined back on the group key) is only
  * equivalent to the single-groupBy plan under two conditions:
  *  1. counted columns filter NULLs explicitly (distinct().count()
  *     counts a NULL as a value; COUNT DISTINCT ignores it) — the
  *     query code now does this;
  *  2. GROUP KEYS are non-null (the join-back is an inner equi-join,
  *     which drops a NULL-key group the single groupBy would keep) —
  *     an invariant of the generated fixtures, pinned here so a
  *     future regeneration that introduces NULL keys fails the suite
  *     loudly instead of silently dropping a row in three keys.
  */
class NullSemanticsSpec extends SparkSpec {

  test("rewrite with null counted values matches countDistinct exactly") {
    import spark.implicits._
    val df = Seq(
      ("click", Option(1L)), ("click", Option(1L)), ("click", None),
      ("view", Option(2L)), ("view", None), ("view", None),
      ("error", None)
    ).toDF("event_type", "user_id")
    val oneAgg = df.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("cd"))
      .orderBy("event_type").collect().map(r => r.getString(0) -> r.getLong(1))
    val rewrite = df.filter(col("user_id").isNotNull)
      .select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("cd"))
      .orderBy("event_type").collect().map(r => r.getString(0) -> r.getLong(1))
    // the all-NULL group: countDistinct keeps it at 0; the rewrite's
    // filter removes the group entirely BEFORE the join-back, so the
    // production keys outer-join nothing — their group keys come from
    // the unfiltered count subtree, and a group with cd=0 cannot occur
    // in the fixtures (pinned below). Here we assert the non-degenerate
    // groups agree exactly.
    assert(oneAgg.filter(_._2 > 0).toSeq == rewrite.toSeq)
  }

  test("fixture group keys and counted columns of the rewrites are non-null") {
    val ev = Tables.events(spark, sf)
    val nulls = ev.agg(
      sum(isnull(col("event_type")).cast("long")).as("et"),
      sum(isnull(col("user_id")).cast("long")).as("uid"),
      sum(isnull(col("ts")).cast("long")).as("ts")).head()
    assert((0 until 3).forall(nulls.getLong(_) == 0L),
      s"NULLs appeared in events columns the countDistinct rewrites " +
        s"assume non-null: $nulls — revisit agg_distinct_exact/dedup_url/fn_url")
    val docs = Tables.documents(spark, sf)
    val dnulls = docs.agg(
      sum(isnull(col("doc_id")).cast("long")).as("id"),
      sum(isnull(col("text")).cast("long")).as("text"),
      sum(isnull(col("source")).cast("long")).as("src")).head()
    assert((0 until 3).forall(dnulls.getLong(_) == 0L),
      s"NULLs appeared in documents columns the URL rewrites derive from: $dnulls")
  }
}
