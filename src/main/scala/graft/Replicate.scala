package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Independent-shard corpus replication, shared by the throughput probe
  * (graft.ScaleProbe) and the sf1 correctness fixture (graft.FixtureGen).
  *
  * Replication preserves the workload's statistical shape while keeping
  * shards independent — the regime the linear-scaling claim is actually
  * about (F× more content), not F× literal copies (which would
  * manufacture a quadratic near-dup pair explosion the fixtures don't
  * have):
  *   - documents: per-replica vocabulary remap (every token suffixed
  *     `_i`) — replica i shares no shingles/tokens with replica j, so
  *     mining/tf-idf see F independent corpora; n_chars recomputed.
  *   - embeddings: dimensions rotated by i (a permutation — norms and
  *     intra-replica geometry exactly preserved, cross-replica cosine
  *     decorrelated), vec_id offset in lockstep with doc_id.
  *   - events: event_id offset by exactly n·i (the replay contract
  *     needs a dense 0-based id), ts shifted +35 d·i (id order stays
  *     time order), user_id offset — F× users, the stateful-streaming
  *     state-size axis.
  *   - orders/lineitem/customer/part/supplier: FK ids offset per
  *     replica → F disjoint graph components.
  *
  * `identityRep0 = true` leaves replica 0 byte-identical to the base
  * corpus (no token suffix, no id/ts offset — the arithmetic below is a
  * no-op at rep=0 for everything except the token remap, which is
  * gated). The sf1 FIXTURE wants this: keys whose queries carry
  * corpus-constant literals (bm25 query terms, date-window filters)
  * still see matching rows, so the oracle gate exercises their full
  * logic instead of comparing empty frames. The PROBE keeps `false` for
  * continuity with the numbers recorded in BASELINE.md (its x1 corpus
  * has always been the `_0`-suffixed remap).
  */
object Replicate {

  val IdOffset = 10000000L // doc/vec/user/FK id stride per replica

  def corpus(spark: SparkSession, base: String, dest: String, f: Int,
      identityRep0: Boolean = false): Unit = {
    import spark.implicits._
    val reps = (0 until f).toDF("rep")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dest/$name.parquet")

    val remapped = array_join(transform(split(col("text"), " "),
      t => concat(t, lit("_"), col("rep"))), " ")
    val docs = Tables.documents(spark, base).crossJoin(reps)
      .select(
        (col("doc_id") + col("rep") * IdOffset).as("doc_id"),
        (if (identityRep0) when(col("rep") === 0, col("text")).otherwise(remapped)
         else remapped).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    write(docs, "documents")

    val dim = 64
    val emb = Tables.embeddings(spark, base).crossJoin(reps)
      .select(
        (col("vec_id") + col("rep") * IdOffset).as("vec_id"),
        concat(
          slice(col("embedding"), (col("rep") % dim) + 1,
            lit(dim) - (col("rep") % dim)),
          slice(col("embedding"), lit(1), col("rep") % dim)).as("embedding"),
        col("label"))
    write(emb, "embeddings")

    val evBase = Tables.events(spark, base)
    val n = evBase.count()
    val ev = evBase.crossJoin(reps)
      .select(
        (col("event_id") + col("rep") * n).as("event_id"),
        (col("ts") + col("rep") * expr("INTERVAL 35 DAYS")).as("ts"),
        (col("user_id") + col("rep") * IdOffset).as("user_id"),
        col("event_type"), col("value"), col("props"))
    write(ev, "events")

    val ord = Tables.orders(spark, base).crossJoin(reps)
      .select(
        (col("o_orderkey") + col("rep") * IdOffset).as("o_orderkey"),
        (col("o_custkey") + col("rep") * IdOffset).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    write(ord, "orders")

    val li = Tables.lineitem(spark, base).crossJoin(reps)
      .select(
        (col("l_orderkey") + col("rep") * IdOffset).as("l_orderkey"),
        (col("l_partkey") + col("rep") * IdOffset).as("l_partkey"),
        (col("l_suppkey") + col("rep") * IdOffset).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    write(li, "lineitem")

    val cust = Tables.customer(spark, base).crossJoin(reps)
      .select((col("c_custkey") + col("rep") * IdOffset).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
    write(cust, "customer")
    val part = Tables.part(spark, base).crossJoin(reps)
      .select((col("p_partkey") + col("rep") * IdOffset).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice"))
    write(part, "part")
    val supp = Tables.supplier(spark, base).crossJoin(reps)
      .select((col("s_suppkey") + col("rep") * IdOffset).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal"))
    write(supp, "supplier")
    // constant dimensions pass through unchanged
    write(Tables.region(spark, base), "region")
    write(Tables.nation(spark, base), "nation")
  }
}
