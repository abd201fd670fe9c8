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
}
