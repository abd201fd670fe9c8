package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** The native graft_md5_prefix expression and its adoption rule:
  * bit-identical values vs the declarative conv(substring(md5)) chain,
  * null handling, plan pins, and guarded non-matches.
  */
class Md5PrefixSpec extends SparkSpec {

  private def withoutNativeMd5[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ == graft.plans.RewriteMd5Prefix)
    try body finally spark.experimental.extraOptimizations = prev
  }

  private def plansNative(q: org.apache.spark.sql.DataFrame): Boolean =
    q.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[graft.expr.Md5PrefixLong]))

  test("md5Prefix equals the hex-prefix parse for every nibble width") {
    // driver-side reference: parse the first n hex chars of the JDK
    // digest — exactly what conv(substring(md5(x),1,n),16,10) computes
    val md = java.security.MessageDigest.getInstance("MD5")
    val samples = Seq("", "a", "hello world", "bf:12345", "über-Straße",
      "\u0000binary\u0001", "x" * 1000)
    for (s <- samples; n <- Seq(1, 4, 8, 15)) {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(n)
      val expected = java.lang.Long.parseLong(hex, 16)
      val got = graft.expr.Md5PrefixLong.md5Prefix(s.getBytes("UTF-8"), n)
      assert(got == expected, s"value mismatch for ($s, $n)")
    }
  }

  test("rule rewrites md5Long/md5Short and SQL-text chains; values survive") {
    import spark.implicits._
    // range input, not Seq.toDF: ConvertToLocalRelation would evaluate
    // a literal LocalRelation before the user batch runs
    val df = spark.range(64).select(concat(lit("k"), col("id")).as("s"))
    def mkLong() = df.select(TextOps.md5Long(col("s")).as("h"))
    def mkShort() = df.select(TextOps.md5Short(col("s")).as("h"))
    def mkSql() = df.selectExpr(
      "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS h")
    assert(plansNative(mkLong()), "md5Long did not plan native")
    assert(plansNative(mkShort()), "md5Short did not plan native")
    assert(plansNative(mkSql()), "SQL-text chain did not plan native")
    assert(withoutNativeMd5 { !plansNative(mkLong()) },
      "withoutNativeMd5 helper is vacuous")
    val fast = mkLong().as[Long].collect().toSeq
    val ref = withoutNativeMd5 { mkLong().as[Long].collect().toSeq }
    assert(fast == ref, "native and chain values diverge (long)")
    val fastS = mkShort().as[Int].collect().toSeq
    val refS = withoutNativeMd5 { mkShort().as[Int].collect().toSeq }
    assert(fastS == refS, "native and chain values diverge (short)")
    assert(fast.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("null input stays null; guarded shapes keep string semantics") {
    import spark.implicits._
    val df = Seq(Some("k"), None).toDF("s")
    val got = df.select(TextOps.md5Long(col("s")).as("h")).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
    // non-matches: substring not at position 1, and a dynamic length —
    // both must keep the Conv chain (no Md5PrefixLong in the plan)
    val off = spark.range(4).select(col("id"),
      concat(lit("k"), col("id")).as("s"))
    assert(!plansNative(off.selectExpr(
      "CAST(conv(substring(md5(s), 2, 15), 16, 10) AS BIGINT) AS h")))
    assert(!plansNative(off.selectExpr(
      "CAST(conv(substring(md5(s), 1, CAST(id + 1 AS INT)), 16, 10) AS BIGINT) AS h")))
    // INT cast with n >= 8 can exceed Int range: legacy string->int
    // overflow yields NULL, long->int would wrap — must NOT rewrite
    assert(!plansNative(off.selectExpr(
      "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS INT) AS h")))
  }

  test("graft_md5_prefix SQL function equals the declarative chain") {
    GraftFunctions.register(spark)
    val df = spark.range(16).selectExpr("concat('k', id) AS s")
    val fast = df.selectExpr("graft_md5_prefix(s, 15) AS h")
      .collect().map(_.getLong(0)).toSeq
    // the reference MUST run without RewriteMd5Prefix, or it is
    // rewritten into the very expression under test (tautology)
    val ref = withoutNativeMd5 {
      df.selectExpr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS h")
        .collect().map(_.getLong(0)).toSeq
    }
    assert(fast == ref)
  }
}
