package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe exact co-occurrence pair mining.
  *
  * For a (key, item) relation with distinct items per key, emits every
  * unordered item pair {a < b} sharing a key, with its shared-key count
  * — semantically identical to the naive inverted-index self-join
  * `x JOIN y ON x.key = y.key AND x.item < y.item GROUP BY a, b`, and
  * oracle-compatible with it (this is a PLAN device, not a semantics
  * change).
  *
  * Why it exists: the naive self-join routes a key of frequency d
  * through ONE join key that fans out C(d,2) pairs in a single task —
  * the power-law hub killer (a deg-10⁶ hub would emit 5·10¹¹ rows from
  * one partition; AQE can split the probe side but not the fan itself).
  * Here each key group is hash-chunked into g = ⌈d/cap⌉ chunks and the
  * join key is widened to the CHUNK-PAIR bucket (k, b1, b2), b1 ≤ b2:
  * a row with chunk c is replicated to buckets (c, c..g−1) on the
  * x side and (0..c, c) on the y side, so each unordered pair {p, q}
  * meets in exactly one bucket — the diagonal (c, c) when they share a
  * chunk (deduped by x.v < y.v), the off-diagonal (min, max) otherwise
  * (each endpoint arrives from exactly one side). No single join key
  * ever fans more than ~(2·cap)² pairs regardless of d. The total pair
  * volume Σ C(d,2) is unchanged — that is the irreducible cost of
  * EXACT co-occurrence counting — but it parallelizes perfectly; the
  * replication overhead is Σ d·(g+1) ≈ 2·Σ C(d,2)/cap, i.e. ~3% extra
  * input rows at cap = 64, and for cold keys (g = 1) the plan
  * degenerates to the naive self-join exactly.
  *
  * Everything stays inside whole-stage codegen: a first-round probe of
  * a higher-order-function expansion (posting lists + nested transform)
  * measured 1.5-2x SLOWER than this join shape at sf0.1 — HOF lambdas
  * don't codegen — so the fan is expressed as a plain equi-join and the
  * downstream groupBy(a, b) gets map-side partial aggregation before
  * the pair shuffle.
  */
object PairMining {

  /** Exact co-occurring pairs of `itemCol` values per `keyCol` group.
    * Items MUST be distinct within a group (dedupe upstream). Returns
    * (a, b, n) with a < b and n = number of shared keys.
    */
  def cooccur(rows: DataFrame, keyCol: String, itemCol: String,
              cap: Int = 64): DataFrame = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    // group size via a count-window over the SAME hash(key) exchange
    // the replicated sides consume — then the chunk id is a hash of
    // the item, so assignment needs no second pass and no driver state.
    // (The window puts a hub's d rows in one task, but that is O(d),
    // not the C(d,2) fan — counting is not the bottleneck.)
    val base = rows
      .select(col(keyCol).as("k"), col(itemCol).as("v"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("k")))
      .withColumn("ng", expr(s"(df + ${cap - 1}) div $cap"))
      .withColumn("c", pmod(xxhash64(col("v")), col("ng")))
    // x side owns bucket column b1 (= its own chunk), y side owns b2.
    val xs = base.select(col("k"), col("v").as("xv"), col("c").as("b1"),
      explode(sequence(col("c"), col("ng") - 1)).as("b2"))
    val ys = base.select(col("k"), col("v").as("yv"),
      explode(sequence(lit(0L), col("c"))).as("b1"), col("c").as("b2"))
    // bounded per-bucket fan → a hash join beats sort-merge (no sort of
    // the replicated streams); AQE sizes the shuffle partitions.
    xs.join(ys.hint("SHUFFLE_HASH"), Seq("k", "b1", "b2"))
      .filter(col("b1") =!= col("b2") || col("xv") < col("yv"))
      .select(least(col("xv"), col("yv")).as("a"),
        greatest(col("xv"), col("yv")).as("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n"))
  }
}
