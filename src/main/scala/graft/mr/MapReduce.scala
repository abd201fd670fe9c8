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

  /** Mimir `src/hashbucket.h` hook (⚠UNV): the user-replaceable
    * partitioner `hash(key) % nprocs`. Spark shape: an explicit
    * hash-exchange on an arbitrary user key expression — downstream
    * per-partition work (scan/output) then sees Mimir's bucket layout.
    */
  def partitionBy[T](ds: Dataset[T], numParts: Int,
      keyExpr: org.apache.spark.sql.Column): Dataset[T] =
    ds.repartition(numParts, keyExpr)

  /** Mimir `user_combine` hook with the full non-associative contract
    * (createCombiner/mergeValue/mergeCombiners). Mimir runs the combine
    * page-locally before the alltoallv; the Spark shape is the same:
    * an explicit per-partition combine (mapPartitions over a hash map —
    * bounded by per-partition DISTINCT keys, the same bound Mimir's
    * page combiner assumes) followed by a shuffle that merges combiners
    * with mergeCombiners only. mergeValue never crosses a partition, so
    * non-associative value folds keep their per-partition order
    * semantics — this is the piece `reduceByKey` (associative-only)
    * could not express for a 1:1 Mimir port.
    */
  def combineByKey[K: Encoder, V, C](kvs: Dataset[(K, V)])(
      createCombiner: V => C, mergeValue: (C, V) => C, mergeCombiners: (C, C) => C)(
      implicit kc: Encoder[(K, C)]): Dataset[(K, C)] = {
    val partial = kvs.mapPartitions { it =>
      val m = scala.collection.mutable.LinkedHashMap.empty[K, C]
      it.foreach { case (k, v) =>
        m.update(k, m.get(k) match {
          case Some(c) => mergeValue(c, v)
          case None => createCombiner(v)
        })
      }
      m.iterator
    }
    partial.groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, mergeCombiners(a._2, b._2)))
      .map { case (_, kc0) => kc0 }
  }

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
