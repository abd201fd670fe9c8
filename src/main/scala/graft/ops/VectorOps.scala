package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns, built on
  * codegen'd higher-order functions (zip_with / aggregate) — no UDFs.
  * Floats are widened to double BEFORE arithmetic in both engines so the
  * oracles see bit-identical math (SURVEY.md §7.4.1).
  */
object VectorOps {

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)


  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** unit-normalized copy — lets pair joins pay one dot per pair
    * instead of dot + two norms (cosine(a,b) == dot(unit(a), unit(b))).
    */
  def unit(v: Column): Column = {
    val n = norm(v)
    transform(v, _ / n)
  }

  /** dot product against a constant integer coefficient vector. */
  def dotConst(v: Column, coefs: Seq[Int]): Column =
    aggregate(zip_with(v, array(coefs.map(c => lit(c.toDouble)): _*), _ * _),
      lit(0.0), _ + _)

  /** Deterministic random-hyperplane LSH bucket (numPlanes sign bits).
    * Plane j has integer coefficients c(j,i) = ((i*31 + j*13) mod 17) - 8
    * — reproducible in plain SQL for the oracle. The modulus must exceed
    * the plane count: round 1 used mod 7 with stride 17 ≡ 3, which is
    * period 7 in j, so planes 7+ DUPLICATED plane j-7 (an 8-bit bucket
    * had only 7 distinct bits). mod 17 / stride 13 keeps all j < 17
    * distinct.
    */
  def lshCoefs(plane: Int, dim: Int): Seq[Int] =
    (0 until dim).map(i => ((i * 31 + plane * 13) % 17) - 8)

  def lshBucket(v: Column, numPlanes: Int, dim: Int): Column =
    (0 until numPlanes).map { j =>
      when(dotConst(v, lshCoefs(j, dim)) > 0, 1 << j).otherwise(0)
    }.reduce(_ + _)
}
