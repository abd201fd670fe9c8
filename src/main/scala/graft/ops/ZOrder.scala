package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * A 100 TB table filtered by TWO dimensions cannot be laid out to
  * serve both with a linear sort: sorting by dim A makes every file's
  * A-range tight and its B-range full-width, so a box predicate prunes
  * on A only. Interleaving the bits of both dimensions' quantized
  * codes into one Morton key and sorting the WRITE by it gives every
  * file a tight min/max envelope in BOTH dimensions — parquet
  * row-group stats then prune most of the table for any 2-dim box.
  * This is the layout trick behind Delta/Iceberg OPTIMIZE ZORDER,
  * expressed here with nothing but built-in expressions (the codes,
  * the interleave, the range-partitioned sorted write are all
  * codegen-friendly Column arithmetic — no UDF).
  *
  * The layout changes which files a scan reads, never the answer —
  * which is what makes the query over it oracle-able.
  */
object ZOrder {

  /** 8-bit min/max-scaled code of a numeric column (0..255). Layout
    * only — never part of a query result, so the double divide carries
    * no cross-engine parity risk. */
  def code8(c: Column, mn: Column, mx: Column): Column =
    floor((c - mn) * lit(255.0) / greatest(mx - mn, lit(1))).cast("int")

  /** 16-bit Morton interleave of two 8-bit codes (a gets the odd bits). */
  def morton8(a: Column, b: Column): Column =
    (0 until 8).map { i =>
      shiftright(a, i).bitwiseAND(lit(1)) * lit(1 << (2 * i + 1)) +
        shiftright(b, i).bitwiseAND(lit(1)) * lit(1 << (2 * i))
    }.reduce(_ + _)

  /** Write `df` to `path` as parquet clustered on the Morton key of
    * (dimA, dimB): 8-bit codes from a broadcast 1-row bounds aggregate,
    * range-partitioned into `files` output files, sorted by z within
    * each — every file's stats envelope is a tight box in both dims.
    * The z key is layout scaffolding and is NOT written.
    */
  def writeClustered(df: DataFrame, dimA: String, dimB: String,
      files: Int, path: String): Unit = {
    val cols = df.columns.toSeq
    val b = df.agg(min(dimA).as("__amn"), max(dimA).as("__amx"),
      min(dimB).as("__bmn"), max(dimB).as("__bmx"))
    df.crossJoin(broadcast(b))
      .withColumn("__z", morton8(
        code8(col(dimA), col("__amn"), col("__amx")),
        code8(col(dimB), col("__bmn"), col("__bmx"))))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .select(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
