package graft

import org.apache.spark.sql.functions._

/** The native graft_dot Catalyst expression: correctness vs the HOF
  * fold, null handling, and SQL-surface registration.
  */
class DotProductSpec extends SparkSpec {

  /** evaluate with RewriteHofDot removed, so "reference" queries really
    * run the interpreted HOF fold instead of being rewritten to the
    * very expression under test (planning is lazy — wrapping the
    * action is enough)
    */
  private def withoutHofDot[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ == graft.plans.RewriteHofDot)
    try body finally spark.experimental.extraOptimizations = prev
  }

  test("graft_dot equals zip_with/aggregate fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(0.3, 0.7)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val got = withoutHofDot {
      df.select(
        GraftFunctions.dotCol(spark, col("a"), col("b")).as("fast"),
        graft.ops.VectorOps.dot(col("a"), col("b")).as("ref"))
        .collect()
    }
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
    assert(got(0).getDouble(0) == 32.0)
  }

  test("RewriteHofDot: the declarative HOF dot plans as native DotProduct") {
    // range input, not Seq.toDF: a literal LocalRelation is collapsed
    // (project evaluated) by ConvertToLocalRelation before the
    // user-provided batch runs, leaving nothing to rewrite
    val df = spark.range(3).select(
      array(col("id").cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), lit(4.0)).as("b"))
    def plansNative(q: org.apache.spark.sql.DataFrame): Boolean =
      q.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.expr.DotProduct]))
    // QueryExecution memoizes the optimized plan per DataFrame —
    // rebuild the query in each rule context or the check is vacuous
    def mk() = df.select(graft.ops.VectorOps.dot(col("a"), col("b")).as("d"))
    val q = mk()
    assert(plansNative(q), s"rule did not fire:\n${q.queryExecution.optimizedPlan}")
    val fast = q.collect().map(_.getDouble(0)).sorted
    assert(fast.sameElements(Array(8.0, 11.0, 14.0)))
    assert(withoutHofDot { !plansNative(mk()) }, "withoutHofDot helper is vacuous")
    // guarded NON-matches keep HOF semantics: a reused lambda variable
    // (x*x is not a dot), and a non-zero fold seed
    val notDot = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * x), 0.0d, (acc, e) -> acc + e)").as("d"))
    assert(!plansNative(notDot), "x*x must not rewrite")
    val seeded = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 1.0d, (acc, e) -> acc + e)").as("d"))
    assert(!plansNative(seeded), "non-zero seed must not rewrite")
    // POSITIVE match through the SQL parser too — without this, the two
    // SQL cases above are only non-match guards and a parser/analyzer
    // shape change could silently stop the rule firing for SQL dots
    val sqlDot = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, e) -> acc + e)").as("d"))
    assert(plansNative(sqlDot), "SQL-spelled dot must rewrite")
    // and the rewrite IS the fold: values agree with the HOF reference
    val ref = withoutHofDot { mk().collect().map(_.getDouble(0)).sorted }
    assert(fast.sameElements(ref))
  }

  test("graft_dot is null-safe") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(GraftFunctions.dotCol(spark, col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("graft_dot matches the HOF fold off the happy path: null elements and length mismatch → NULL") {
    GraftFunctions.register(spark)
    // null element: zip_with product poisons the aggregate fold to NULL
    val cases = Seq(
      "SELECT graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)) AS d",
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d)) AS d", // len mismatch
      "SELECT graft_dot(array(1.0d), array(1.0d, 2.0d)) AS d")
    cases.foreach { q =>
      val fast = spark.sql(q).collect()(0)
      assert(fast.isNullAt(0), s"graft_dot not NULL for: $q")
      // reference semantics: same query through the zip_with+aggregate fold
      val ref = spark.sql(q.replace("graft_dot(",
        "aggregate(zip_with(").replace(") AS d",
        ", (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) AS d")).collect()(0)
      assert(ref.isNullAt(0), s"HOF fold not NULL for: $q")
    }
  }

  test("graft_dot reachable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect()(0)
    assert(r.getDouble(0) == 11.0)
  }

  test("GraftExtensions registers graft_dot via injectFunction") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; descriptor is valid
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT graft_dot(array(2.0d), array(8.0d))").collect()(0).getDouble(0) == 16.0)
  }
}
