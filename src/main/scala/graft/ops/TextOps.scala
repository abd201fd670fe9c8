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
    * empty array when the doc has fewer than k tokens.
    *
    * Built as zip_with over k shifted slices rather than
    * `transform(sequence…, i => element_at(toks, i+o))`: higher-order
    * lambdas are interpreted, so an element_at(split(...)) INSIDE the
    * lambda re-tokenizes the whole string per element (measured 10×
    * slowdown); slices evaluate the token array once per row.
    */
  def shingles(toks: Column, k: Int): Column = {
    val n = size(toks) - (k - 1) // number of shingles
    val parts = (0 until k).map(o => slice(toks, lit(o + 1), n))
    val joined = parts.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    when(size(toks) < k, array().cast("array<string>")).otherwise(joined)
  }

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
