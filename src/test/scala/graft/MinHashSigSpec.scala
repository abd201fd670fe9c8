package graft

import org.apache.spark.sql.functions._
import graft.ops.{MinHashLSH, TextOps}

/** The native graft_minhash_sig expression: bit-equality with the
  * declarative numPerm-transform form on the real corpus, null/empty
  * semantics, and the SQL surface.
  */
class MinHashSigSpec extends SparkSpec {

  /** the declarative reference signature (the pre-r14 form). */
  private def refSig(hashes: org.apache.spark.sql.Column, numPerm: Int) =
    array((0 until numPerm).map { i =>
      val (a, b) = MinHashLSH.coef(i)
      array_min(transform(hashes, x =>
        pmod(pmod(x, lit(MinHashLSH.P)) * a + b, lit(MinHashLSH.P))))
    }: _*)

  test("graft_minhash_sig equals the declarative 16-transform form bit-for-bit") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(
        TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("hashes", transform(col("sh"), TextOps.md5Long(_)))
    val both = docs.select(
      call_function("graft_minhash_sig", col("hashes"), lit(16)).as("fast"),
      refSig(col("hashes"), 16).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"signature mismatch: $r")
    }
  }

  test("null array, empty array, and null elements match array_min semantics") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq[Option[Long]](Some(7L), Some(123456789L)))),
      (2L, Some(Seq[Option[Long]]())),             // empty -> null slots
      (3L, None),                                  // null array -> null
      (4L, Some(Seq[Option[Long]](None, Some(5L)))) // null elem skipped
    ).toDF("id", "hashes")
    val rows = df.select(col("id"),
        call_function("graft_minhash_sig", col("hashes"), lit(4)).as("fast"),
        refSig(col("hashes"), 4).as("ref"))
      .orderBy("id").collect()
    rows.foreach { r =>
      if (r.getLong(0) == 3L) {
        // the ONE deliberate divergence: a NULL input array is NULL
        // natively (standard unary null propagation) where the
        // declarative array(array_min(transform(null))...) constructor
        // yields a non-null array of nulls. No signature caller passes
        // a nullable hash array (docs are size-filtered first).
        assert(r.isNullAt(1) && !r.isNullAt(2), s"null-array semantics: $r")
      } else {
        assert(!r.isNullAt(1) && !r.isNullAt(2), s"unexpected null: $r")
        assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"value mismatch: $r")
      }
    }
  }

  test("numPerm accepts any foldable int/long; non-constants raise AnalysisException") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(7L, 9L))).toDF("id", "hashes")
    df.createOrReplaceTempView("mh_args")
    // a long literal and an un-folded constant expression both work
    // (r14 ADVICE: `graft_minhash_sig(h, 16L)` used to throw a raw
    // IllegalArgumentException at function-build time)
    val viaLong = spark.sql(
      "SELECT graft_minhash_sig(hashes, 4L) AS s FROM mh_args").collect()
    val viaExpr = spark.sql(
      "SELECT graft_minhash_sig(hashes, 2 + 2) AS s FROM mh_args").collect()
    assert(viaLong.head.getSeq[Long](0) == viaExpr.head.getSeq[Long](0))
    assert(viaLong.head.getSeq[Long](0).length == 4)
    // a non-foldable argument surfaces as the standard analysis error,
    // not a raw exception
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash_sig(hashes, CAST(id AS INT)) FROM mh_args")
        .collect()
    }
    assert(e.getCondition == "NON_FOLDABLE_ARGUMENT", e.getMessage)
    // same contract on the md5-prefix surface
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_md5_prefix(hashes, CAST(id AS INT)) FROM mh_args")
        .collect()
    }
    assert(e2.getCondition == "NON_FOLDABLE_ARGUMENT", e2.getMessage)
    assert(spark.sql("SELECT graft_md5_prefix('x', 8L) AS h").head().getLong(0) ==
      spark.sql("SELECT graft_md5_prefix('x', 8) AS h").head().getLong(0))
  }
}
