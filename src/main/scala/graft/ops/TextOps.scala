package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable text-pipeline building blocks (SURVEY.md §2B-I).
  *
  * Cross-engine portable hashing: Spark's xxhash64/hash and DuckDB's
  * hash() are different algorithms, so oracled queries derive integer
  * hashes from md5 hex — identical in every engine. 15 hex chars = 60
  * bits, always positive in a signed 64-bit value.
  */
object TextOps {

  /** space-tokenize (the testdata is single-space separated). */
  def tokens(c: Column): Column = split(c, " ")

  /** adjacent k-token shingles as strings, e.g. "a b c" for k=3;
    * empty array when the doc has fewer than k tokens (Spark `sequence`
    * would otherwise count DOWN for a negative span).
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(o => element_at(toks, i + o + 1)): _*)))

  /** 60-bit portable hash of a string column (Spark side). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 60-bit portable hash (DuckDB SQL text, same value as [[md5Long]]). */
  def md5LongSql(e: String): String =
    s"CAST(('0x' || substring(md5($e), 1, 15)) AS BIGINT)"

  /** 16-bit portable hash of a string column (Spark side), for simhash. */
  def md5Short(c: Column): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("int")

  /** 16-bit portable hash (DuckDB SQL text). */
  def md5ShortSql(e: String): String =
    s"CAST(('0x' || substring(md5($e), 1, 4)) AS INT)"
}
