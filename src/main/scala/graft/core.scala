package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of queries plus their DuckDB oracle SQL.
  *
  * Contract (SURVEY.md §2B / §7.4): every query reads only
  * `s"$sfDir/<table>.parquet"`, ends in a total-order ORDER BY with a
  * unique tie-break, rounds double aggregates (2 dp money / 4 dp
  * ratios+sims), and aliases every computed column to the SAME name used
  * in the oracle SQL (the driver sorts columns by name before hashing).
  */
trait QueryPack {
  type QueryFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QueryFn]
  /** DuckDB 1.0.0 SQL per oracled query key; TEST-only keys are omitted. */
  def oracleSql: Map[String, String]
}

/** Table loaders for the driver-generated parquet testdata. */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String)    = t(s, d, "region")
  def nation(s: SparkSession, d: String)    = t(s, d, "nation")
  def customer(s: SparkSession, d: String)  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = t(s, d, "supplier")
  def part(s: SparkSession, d: String)      = t(s, d, "part")
  def orders(s: SparkSession, d: String)    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = t(s, d, "lineitem")
  def events(s: SparkSession, d: String)    = t(s, d, "events")
  def documents(s: SparkSession, d: String) = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")
}
