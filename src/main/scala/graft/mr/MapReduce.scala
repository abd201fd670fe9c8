package graft.mr

import org.apache.spark.sql.{Dataset, Encoder}

/** Mimir-style MapReduce facade (SURVEY.md §2A) — the reference's
  * algebra {map, combine, shuffle/convert, reduce} re-expressed on typed
  * Datasets so a MapReduce-API user can port programs 1:1:
  *
  *   Mimir `ctx.map(user_map)`     → [[MapReduce.map]]
  *   Mimir combine + shuffle + convert + `ctx.reduce(user_reduce)`
  *                                 → [[MapReduce.reduce]] (groupByKey +
  *                                    flatMapGroups; Spark's partial
  *                                    aggregation/shuffle replaces the
  *                                    hand-rolled combiner + MPI
  *                                    alltoallv + hash-bucket convert)
  *   Mimir `ctx.scan(fn)`          → Dataset.foreach / toLocalIterator
  *
  * Keeping the reduce as flatMapGroups preserves Mimir's (key, value
  * iterator) contract including multi-record emission. When the reduction
  * is associative, prefer [[MapReduce.reduceByKey]] — it map-side
  * combines (Mimir's in-mapper combining, [IPDPS17] §IV.C) instead of
  * shuffling every record.
  */
object MapReduce {

  /** map phase: one input record → any number of KV records. */
  def map[I, K: Encoder, V: Encoder](input: Dataset[I])(f: I => IterableOnce[(K, V)])(
      implicit kv: Encoder[(K, V)]): Dataset[(K, V)] =
    input.flatMap(f)

  /** reduce phase with the full (key, value-iterator) contract. */
  def reduce[K: Encoder, V, O: Encoder](kvs: Dataset[(K, V)])(
      f: (K, Iterator[V]) => IterableOnce[O]): Dataset[O] =
    kvs.groupByKey(_._1).flatMapGroups((k, it) => f(k, it.map(_._2)).iterator)

  /** associative reduce — combiner runs map-side before the shuffle. */
  def reduceByKey[K: Encoder, V: Encoder](kvs: Dataset[(K, V)])(f: (V, V) => V)(
      implicit kv: Encoder[(K, V)]): Dataset[(K, V)] =
    kvs.groupByKey(_._1).reduceGroups((a, b) => (a._1, f(a._2, b._2)))
      .map { case (_, v) => v }

  /** Mimir `ctx.insert(k,v)`: inject app-side KV records. */
  def insert[K, V](spark: org.apache.spark.sql.SparkSession, kvs: Seq[(K, V)])(
      implicit kv: Encoder[(K, V)]): Dataset[(K, V)] = {
    import spark.implicits._
    spark.createDataset(kvs)
  }

  /** Mimir `ctx.scan(fn)`: per-record callback, executed where the data
    * lives (Mimir ran it rank-local; Spark runs it executor-local).
    */
  def scan[T](ds: Dataset[T])(f: T => Unit): Unit =
    ds.foreachPartition((it: Iterator[T]) => it.foreach(f))

  /** Mimir `ctx.output(...)`: write KVs as text, one file per partition
    * (≡ Mimir's one file per rank), tab-separated.
    */
  def output[K, V](kvs: Dataset[(K, V)], path: String): Unit = {
    val spark = kvs.sparkSession
    import spark.implicits._
    kvs.map { case (k, v) => s"$k\t$v" }
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)
  }
}
