package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, one session). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sf = "/root/testdata/sf0.001"

  // local[4, 2]: 4 threads, maxTaskFailures 2 — plain local[N] makes
  // the FIRST task failure fatal, which would leave the retry story
  // (FaultInjectionSpec: intra-run task retries preserve results)
  // untestable in the suite. Green tests never retry, so the second
  // attempt slot changes nothing for every other suite.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark) // native exprs + the HOF-dot rewrite rule
  }
}
