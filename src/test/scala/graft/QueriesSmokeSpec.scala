package graft

import org.apache.spark.sql.functions._

/** Every declared query runs end-to-end at sf0.001 and yields a sane,
  * non-degenerate result (t1-shaped smoke; DuckDB parity is the
  * driver-side t2 gate).
  */
class QueriesSmokeSpec extends SparkSpec {

  // queries whose correct result CAN be empty on a clean corpus
  private val mayBeEmpty = Set("dedup_exact")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs and is non-degenerate") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship smoke (driver t1 contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("golden pins: wordcount top word and flagship nations") {
    val wc = SparkEntry.queries("text_wordcount")(spark, sf).limit(1).collect()(0)
    // sf0.001 corpus: 'key' is the most frequent token (measured fixture)
    assert(wc.getLong(1) > 100, s"top word count suspiciously low: $wc")
    val flag = SparkEntry.queries("join_5way_flagship")(spark, sf).collect()
    assert(flag.length == 5, "ASIA has 5 nations")
  }
}
