package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.mr.MapReduce
import graft.ops.BFS

/** Iterative BFS operator + the full Mimir algebra surface of the
  * MapReduce facade (insert / scan / output).
  */
class BfsMrSpec extends SparkSpec {

  test("BFS terminates on a cyclic graph with correct first-visit levels") {
    import spark.implicits._
    // 1→2→3→1 cycle plus 3→4 tail
    val edges = Seq(("1", "2"), ("2", "3"), ("3", "1"), ("3", "4"))
      .toDF("src", "dst")
    val roots = Seq("1").toDF("node")
    val got = BFS.levels(edges, roots).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("1" -> 0, "2" -> 1, "3" -> 2, "4" -> 3))
  }

  test("BFS from an isolated root visits only the root") {
    import spark.implicits._
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val roots = Seq("z").toDF("node")
    val got = BFS.levels(edges, roots).collect()
    assert(got.length == 1 && got(0).getString(0) == "z" && got(0).getInt(1) == 0)
  }

  test("MapReduce partitionBy routes equal keys to one partition under a custom key") {
    import spark.implicits._
    val kvs = MapReduce.insert(spark,
      (1 to 100).map(i => (s"k${i % 7}", i.toLong))).repartition(8)
    val parted = MapReduce.partitionBy(kvs, 4, col("_1"))
    assert(parted.rdd.getNumPartitions == 4)
    // every key's records land in exactly one partition (Mimir's
    // hashbucket contract: reduce sees all records of a key rank-local)
    val spread = parted.mapPartitions(it => Iterator(it.map(_._1).toSet))
      .collect().flatMap(s => s.map(_ -> 1)).groupBy(_._1).map(_._2.length)
    assert(spread.forall(_ == 1))
  }

  test("MapReduce combineByKey honors the createCombiner/mergeValue/mergeCombiners contract") {
    import spark.implicits._
    // non-associative value fold: collect values into a list combiner —
    // mergeValue appends, mergeCombiners concatenates. Count-per-key and
    // sum survive regardless of partitioning.
    val kvs = MapReduce.insert(spark,
      (1 to 50).map(i => (s"k${i % 3}", i.toLong))).repartition(7)
    val combined = MapReduce.combineByKey(kvs)(
      v => List(v), (c: List[Long], v) => v :: c, (a: List[Long], b: List[Long]) => a ++ b)
      .collect().toMap
    val expect = (1 to 50).map(i => (s"k${i % 3}", i.toLong))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    assert(combined.keySet == expect.keySet)
    combined.foreach { case (k, c) =>
      assert(c.sorted == expect(k).map(identity).sorted.toList)
    }
  }

  test("MapReduce insert/scan/output round the full Mimir algebra") {
    import spark.implicits._
    val kvs = MapReduce.insert(spark, Seq(("k1", 1L), ("k2", 2L), ("k1", 3L)))
    val reduced = MapReduce.reduceByKey(kvs)(_ + _)
    // scan: executor-side callback over final KVs (counted via accumulator)
    val seen = spark.sparkContext.longAccumulator("seen")
    MapReduce.scan(reduced)(_ => seen.add(1))
    assert(seen.value == 2L)
    // output: one text file per partition, tab-separated
    val out = Files.createTempDirectory("graft_mr_out").toString
    MapReduce.output(reduced, out)
    val back = spark.read.text(out).collect().map(_.getString(0)).sorted
    assert(back.toList == List("k1\t4", "k2\t2"))
  }
}
