package graft

import org.apache.spark.sql.functions._

/** SessionMemo footprint budget (r10 verdict #3): past the byte cap the
  * least-recently-used memoized artifacts are unpersisted and dropped,
  * so the shared-artifact population can never squeeze execution memory
  * unboundedly. Evicted entries rebuild on next use — a perf trade, not
  * a correctness event — which is also why this suite can safely fire
  * the cap on the shared test session: concurrent suites' memo entries
  * just rebuild.
  */
class SessionMemoSpec extends SparkSpec {

  test("memoized entries materialize, count storage, and survive under budget") {
    val a = SessionMemo(spark, "memospec_a") {
      spark.range(50000L).select(col("id"), (col("id") * 2).as("v"))
    }
    assert(a.count() == 50000L)
    assert(SessionMemo.isMemoized(spark, "memospec_a"))
    // materialized persisted RDDs are visible to the telemetry accessor
    assert(SessionMemo.storageBytes(spark) > 0L,
      "materialized memo entry contributes 0 storage bytes")
    // default budget (8 GiB) is far above the test population: no evict
    val b = SessionMemo(spark, "memospec_b") {
      spark.range(50000L).select(col("id"), (col("id") + 7).as("w"))
    }
    assert(b.count() == 50000L)
    assert(SessionMemo.isMemoized(spark, "memospec_a"),
      "entry evicted while under budget")
  }

  test("the byte cap evicts least-recently-used entries") {
    val saved = SessionMemo.budgetBytes
    try {
      SessionMemo(spark, "memospec_lru_old") {
        spark.range(50000L).select(col("id"), (col("id") * 3).as("x"))
      }.count()
      SessionMemo(spark, "memospec_lru_new") {
        spark.range(50000L).select(col("id"), (col("id") * 5).as("y"))
      }.count()
      assert(SessionMemo.isMemoized(spark, "memospec_lru_old"))
      // 1-byte budget: the next memo call must evict until under budget
      // (i.e. everything materialized), oldest-use first
      SessionMemo.budgetBytes = 1L
      SessionMemo(spark, "memospec_lru_trigger") {
        spark.range(10L).select(col("id"))
      }.count()
      assert(!SessionMemo.isMemoized(spark, "memospec_lru_old"),
        "over-budget memo population did not evict the LRU entry")
      assert(!SessionMemo.isMemoized(spark, "memospec_lru_new"),
        "1-byte budget should evict every materialized entry")
    } finally SessionMemo.budgetBytes = saved
  }

  test("non-reclaimable storage does not thrash the memo (r11 ADVICE)") {
    // The r10 budget compared against context-TOTAL storage, which also
    // counts bytes eviction can never reclaim (localCheckpoint RDDs from
    // memo builds survive unpersist). Once those alone exceeded the
    // budget, EVERY memo call evicted the whole population and freed
    // nothing — permanent rebuild thrash. Pin the fix: the budget now
    // covers memo-OWNED bytes only, so a big checkpoint must not evict
    // a small memo entry.
    val saved = SessionMemo.budgetBytes
    try {
      SessionMemo(spark, "memospec_nonreclaim") {
        spark.range(50000L).select(col("id"), (col("id") * 11).as("z"))
      }.count()
      // budget exactly covers today's memo-owned population...
      SessionMemo.budgetBytes = math.max(1L, SessionMemo.memoOwnedBytes(spark))
      // ...then park non-reclaimable bytes on the context, way past it
      val ck = spark.range(3000000L).select(col("id")).localCheckpoint(true)
      assert(ck.count() == 3000000L)
      assert(SessionMemo.storageBytes(spark) > SessionMemo.budgetBytes,
        "checkpoint too small to exercise the thrash scenario")
      SessionMemo(spark, "memospec_nonreclaim_trigger") {
        spark.range(10L).select(col("id"))
      }.count()
      assert(SessionMemo.isMemoized(spark, "memospec_nonreclaim"),
        "non-reclaimable context storage evicted a within-budget memo entry")
    } finally SessionMemo.budgetBytes = saved
  }

  test("pair entries evict as a unit") {
    val saved = SessionMemo.budgetBytes
    try {
      val (c, d) = SessionMemo.pair(spark, "memospec_pair") {
        val base = spark.range(20000L).select(col("id"), (col("id") % 16).as("g"))
        (base.groupBy("g").agg(count(lit(1)).as("n")),
         base.groupBy("g").agg(sum("id").as("s")))
      }
      assert(c.count() == 16 && d.count() == 16)
      assert(SessionMemo.isMemoized(spark, "memospec_pair"))
      SessionMemo.budgetBytes = 1L
      SessionMemo(spark, "memospec_pair_trigger") {
        spark.range(10L).select(col("id"))
      }.count()
      assert(!SessionMemo.isMemoized(spark, "memospec_pair"),
        "pair entry survived a 1-byte budget")
    } finally SessionMemo.budgetBytes = saved
  }
}
