package graft

import org.apache.spark.sql.functions._
import graft.multimodal.BinaryFeatures
import graft.mr.MapReduce
import graft.ops.TextOps
import graft.udaf.GeometricMean

/** Unit + property tests for the reusable operators. */
class OpsSpec extends SparkSpec {

  test("shingles: empty below k, correct k-grams otherwise") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "x").toDF("text")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a b c", "b c d"), Nil, Nil))
  }

  test("md5Long/md5Short deterministic, non-negative, stable across runs") {
    import spark.implicits._
    val rows = Seq("tok", "tok", "other").toDF("w")
      .select(TextOps.md5Long(col("w")).as("l"), TextOps.md5Short(col("w")).as("s"))
      .collect()
    assert(rows(0).getLong(0) == rows(1).getLong(0))
    assert(rows.forall(_.getLong(0) >= 0))
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 65536))
    assert(rows(0).getLong(0) != rows(2).getLong(0))
  }

  test("GeometricMean == exp(avg(ln)) on a known sample") {
    import spark.implicits._
    val gm = udaf(GeometricMean)
    val got = Seq(1.0, 10.0, 100.0).toDF("x").agg(gm(col("x"))).collect()(0).getDouble(0)
    assert(math.abs(got - 10.0) < 1e-9)
  }

  test("GeometricMean split-merge equals whole fold (seeded property)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val vals = List.fill(1 + rnd.nextInt(30))(rnd.nextDouble() * 1000 + 0.1)
      val (l, r) = vals.splitAt(rnd.nextInt(vals.size + 1))
      def fold(v: List[Double]) = v.foldLeft(GeometricMean.zero)(GeometricMean.reduce)
      val merged = GeometricMean.finish(GeometricMean.merge(fold(l), fold(r)))
      val whole = GeometricMean.finish(fold(vals))
      assert(math.abs(merged - whole) <= 1e-9 * math.max(1.0, whole.abs))
    }
  }

  test("BinaryFeatures stub decode: known bytes") {
    val (n, head, crc) = BinaryFeatures.decodeStub("ab".getBytes("UTF-8"))
    assert(n == 2 && head == 97)
    assert(crc == (97L * 31 + 98) % BinaryFeatures.CrcMod)
  }

  test("MapReduce facade wordcount == DataFrame wordcount") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select(col("text")).as[String]
    val viaMr = MapReduce.reduceByKey(
      MapReduce.map(docs)(l => l.split(" ").iterator.filter(_.nonEmpty).map(w => (w, 1L))))(_ + _)
      .collect().toMap
    val viaDf = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaMr == viaDf)
  }

  test("MapReduce reduce preserves the (key, iterator) contract") {
    import spark.implicits._
    val kvs = Seq(("a", 1), ("a", 2), ("b", 5)).toDS()
    val out = MapReduce.reduce(kvs)((k, it) => Iterator((k, it.sum)))
      .collect().toMap
    assert(out == Map("a" -> 3, "b" -> 5))
  }
}
