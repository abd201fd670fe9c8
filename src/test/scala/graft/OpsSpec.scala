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

  test("ZOrder.morton8: exact bit interleave, aligned squares are contiguous z-intervals") {
    // pin the Morton key against a reference Scala interleave on every
    // (a, b) code pair, and the property sink_zorder_layout's pruning
    // relies on: an aligned 32x32 code square maps to ONE contiguous
    // 1024-length z interval (a straddling box would not).
    import spark.implicits._
    def ref(a: Int, b: Int): Int =
      (0 until 8).map(i => (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i))).sum
    val rows = (0 until 256).flatMap(a => Seq((a, a), (a, 255 - a), (a, (a * 37) % 256)))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.ops.ZOrder.morton8(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2))).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a, b), s"morton8($a,$b)")
    }
    // the aligned square [64,96)x[64,96): min z at (64,64), max at (95,95),
    // span exactly 1024 and every corner inside
    val zs = for (a <- 64 until 96; b <- 64 until 96) yield ref(a, b)
    assert(zs.min == ref(64, 64) && zs.max == ref(95, 95))
    assert(zs.max - zs.min == 1023 && zs.distinct.length == 1024,
      "aligned square must be one contiguous 1024-length z interval")
  }

  test("ConnectedComponents == union-find min-label on random graphs (seeded property)") {
    // the scale-critical dedup op is otherwise exercised only through
    // the corpus-derived pair graph (one fixed topology); random graphs
    // hit chains, self-loops, duplicate edges, and multi-component mixes
    import spark.implicits._
    val rnd = new scala.util.Random(20260812)
    for (trial <- 1 to 5) {
      val nV = 10 + rnd.nextInt(30)
      val nE = 1 + rnd.nextInt(2 * nV)
      val pairs = Seq.fill(nE)((rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      // driver-side reference: path-compressed union-find, min id per root
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val minOfRoot = verts.groupBy(find).map { case (r, vs) => r -> vs.min }
      val expected = verts.map(v => v -> minOfRoot(find(v))).toMap
      // maxRounds > any possible diameter here: chain graphs legitimately
      // need ~nV rounds and must converge, not hit the safety cap
      val got = graft.ops.ConnectedComponents.labels(pairs.toDF("a", "b"), maxRounds = 100)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial (nV=$nV nE=$nE) mismatch: " +
        s"wrong=${got.filter { case (v, r) => expected.get(v).contains(r) == false }}")
    }
  }

  test("MetricBlocking dedup_embedding: candidate recall 1.0 on the fixture (== brute force)") {
    val blocked = SparkEntry.queries("dedup_embedding")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.ops.VectorOps.unit(
        graft.ops.VectorOps.toDouble(col("embedding"))).as("v"))
    val brute = e.select(col("vec_id").as("a"), col("v").as("va"))
      .join(e.select(col("vec_id").as("b"), col("v").as("vb")), col("a") < col("b"))
      .select(col("a"), col("b"),
        round(GraftFunctions.dotCol(spark, col("va"), col("vb")), 4).as("sim"))
      .filter(col("sim") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked == brute,
      s"blocked != brute: missing=${brute -- blocked} extra=${blocked -- brute}")
  }

  test("MetricBlocking similarityJoin: two-table recall 1.0 on the fixture (== brute force)") {
    // contamination-check shape: probe half × reference half of the
    // embeddings fixture; exact equality against the brute-force join
    // (recall AND precision — the blocking must neither drop nor add)
    val emb = Tables.embeddings(spark, sf)
    val probe = emb.filter(col("vec_id") < 250)
    val ref = emb.filter(col("vec_id") >= 250)
    val got = graft.ops.MetricBlocking.similarityJoin(spark, probe, ref, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def u(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      graft.ops.VectorOps.unit(graft.ops.VectorOps.toDouble(col("embedding"))).as("v"))
    val brute = u(probe).select(col("vec_id").as("a"), col("v").as("va"))
      .crossJoin(u(ref).select(col("vec_id").as("b"), col("v").as("vb")))
      .select(col("a"), col("b"),
        round(GraftFunctions.dotCol(spark, col("va"), col("vb")), 4).as("sim"))
      .filter(col("sim") >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute && brute.nonEmpty,
      s"two-table blocked != brute: missing=${brute -- got} extra=${got -- brute}")
  }

  test("MetricBlocking sub-cell split preserves the exact pair set") {
    // the round-12 scale path: labels alone give a FIXED cell count, so
    // subCells re-keys into data-proportional md5 buckets. Output must
    // be assignment-invariant — force the split on the fixture (target
    // 64 → ~7 sub-cells per label) and demand equality with the
    // unsplit result (which OpsSpec already pins against brute force).
    val emb = Tables.embeddings(spark, sf)
    def pairs(target: Long) =
      graft.ops.MetricBlocking.nearDupPairs(spark, emb, 0.35, target)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val split = pairs(64L)
    val unsplit = pairs(Long.MaxValue)
    assert(split == unsplit && split.nonEmpty,
      s"sub-cell split changed the pair set: missing=${unsplit -- split} " +
        s"extra=${split -- unsplit}")
  }

  test("MetricBlocking fan-split preserves the exact pair set") {
    // the round-14 scale path (r13 verdict #5): a tiny fan budget forces
    // the projected-fan re-key (parent anchors, md5 sub-buckets) on the
    // fixture; the pair set must be identical to the unsplit result.
    val emb = Tables.embeddings(spark, sf)
    def pairs(budget: Long) =
      graft.ops.MetricBlocking.nearDupPairs(spark, emb, 0.35,
        fanBudget = budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val split = pairs(1000L) // fixture fan ≫ 1000 → every cell re-keys
    val unsplit = pairs(Long.MaxValue)
    assert(split == unsplit && split.nonEmpty,
      s"fan-split changed the pair set: missing=${unsplit -- split} " +
        s"extra=${split -- unsplit}")
  }

  test("MetricBlocking dot budget: sub-budget equality, over-budget fail-fast with the price") {
    // r15 verdict #4: the recall-1.0 contract prices ~n²/2 dots on a
    // loose-geometry corpus — a caller must opt into that, not fall in.
    // (a) an exact budget (just at the fixture's priced volume) leaves
    // the output identical to the default; (b) a sub-volume budget
    // refuses BEFORE the pair join runs, and the refusal names the
    // measured price and the bounded alternatives.
    val emb = Tables.embeddings(spark, sf)
    def pairs(budget: Long) =
      graft.ops.MetricBlocking.nearDupPairs(spark, emb, 0.35, dotBudget = budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val default = pairs(graft.ops.MetricBlocking.DotBudget)
    assert(pairs(Long.MaxValue) == default && default.nonEmpty)
    val ex = intercept[IllegalStateException] { pairs(10L) }
    assert(ex.getMessage.contains("exceeds the dot budget 10"), ex.getMessage)
    assert(ex.getMessage.contains("GRAFT_DOT_BUDGET"), ex.getMessage)
    assert(ex.getMessage.contains("sim_ann"), ex.getMessage)
    // the two-table shape carries the same guard
    val probe = emb.filter(col("vec_id") < 50)
    val ex2 = intercept[IllegalStateException] {
      graft.ops.MetricBlocking.similarityJoin(spark, probe, emb, 0.3, dotBudget = 10L)
        .count()
    }
    assert(ex2.getMessage.contains("similarityJoin"), ex2.getMessage)
  }

  test("MetricBlocking degrade mode: priced banded subset, refuse stays default (r16 verdict #5)") {
    val emb = Tables.embeddings(spark, sf)
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = collectPairs(
      graft.ops.MetricBlocking.nearDupPairs(spark, emb, 0.35))
    // the fixture's exact priced volume, read from the refusal itself
    val ex = intercept[IllegalStateException] {
      collectPairs(graft.ops.MetricBlocking.nearDupPairs(spark, emb, 0.35,
        dotBudget = 10L))
    }
    val price = "volume (\\d+) ordered".r.findFirstMatchIn(ex.getMessage)
      .map(_.group(1).toLong).getOrElse(fail(s"no price in: ${ex.getMessage}"))
    assert(price > 10L)
    // refuse stays the DEFAULT over-budget behavior (mode unset)
    assert(ex.getMessage.contains("GRAFT_DOT_BUDGET_MODE=degrade"))
    // degrade just under the exact price: banded candidates run (their
    // own volume is ~bands/2^bits of exact — far under), output is a
    // SUBSET of the exact pair set (precision 1.0 via the 4-dp re-rank)
    val degraded = collectPairs(graft.ops.MetricBlocking.nearDupPairs(
      spark, emb, 0.35, dotBudget = price - 1, mode = "degrade"))
    assert(degraded.subsetOf(exact),
      s"degrade emitted non-pairs: ${degraded -- exact}")
    // recall CURVE pinned on the fixture (16 bands × 8 bits): banding
    // retention rises steeply with similarity — at the loose 0.35
    // boundary (per-plane collision ~0.61) most near-threshold pairs
    // are lost (that IS the trade degrade mode sells; the module doc
    // predicted it), while genuinely-near pairs collide almost surely.
    def recallAt(lo: Double): Double = {
      val e = exact.filter(_._3 >= lo)
      if (e.isEmpty) 1.0 else degraded.count(p => p._3 >= lo).toDouble / e.size
    }
    val rAll = degraded.size.toDouble / exact.size
    info(f"degrade recall: all=$rAll%.3f sim>=0.5=${recallAt(0.5)}%.3f " +
      f"sim>=0.6=${recallAt(0.6)}%.3f sim>=0.7=${recallAt(0.7)}%.3f " +
      f"(n exact=${exact.size})")
    assert(rAll > 0.05 && rAll < 1.0,
      s"boundary recall $rAll (${degraded.size}/${exact.size}) out of the pinned band")
    assert(recallAt(0.6) >= 0.75,
      s"high-sim recall ${recallAt(0.6)} below the pinned curve at sim>=0.6")
    // degrade is priced too: a budget under even the banded volume
    // still refuses, naming the banded price
    val ex2 = intercept[IllegalStateException] {
      collectPairs(graft.ops.MetricBlocking.nearDupPairs(spark, emb, 0.35,
        dotBudget = 10L, mode = "degrade"))
    }
    assert(ex2.getMessage.contains("banded candidate volume"), ex2.getMessage)
  }

  test("MetricBlocking prunes on a clustered corpus (and still finds every pair)") {
    import spark.implicits._
    // 4 tight clusters around orthogonal axes: radii ~11°, inter-cell
    // angle 90° > r_i + r_j + acos(0.8) — only the diagonal cell pairs
    // are admissible, so pruning must drop 12 of 16 ordered pairs.
    val rnd = new scala.util.Random(7)
    val dim = 8
    val rows = for (c <- 0 until 4; i <- 0 until 25) yield {
      val base = Array.fill(dim)(0.0f); base(c) = 1.0f
      val noisy = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      (c.toLong * 100 + i, c.toLong, noisy)
    }
    val emb = rows.toDF("vec_id", "label", "embedding")
    val e = emb.select(col("vec_id"), col("label"),
      graft.ops.VectorOps.toDouble(col("embedding")).as("v"))
    val (_, cells) = graft.ops.MetricBlocking.assignAndStats(spark, e)
    val adm = graft.ops.MetricBlocking
      .admissiblePairs(spark, cells, math.acos(0.8 - 1e-4)).collect()
    assert(adm.length == 4, s"expected only diagonal cell pairs, got ${adm.length}")
    // completeness on the clustered corpus: blocked == brute at t=0.8
    val blocked = graft.ops.MetricBlocking.nearDupPairs(spark, emb, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val u = e.select(col("vec_id"), graft.ops.VectorOps.unit(col("v")).as("uv"))
    val brute = u.select(col("vec_id").as("a"), col("uv").as("ua"))
      .join(u.select(col("vec_id").as("b"), col("uv").as("ub")), col("a") < col("b"))
      .select(col("a"), col("b"),
        round(GraftFunctions.dotCol(spark, col("ua"), col("ub")), 4).as("sim"))
      .filter(col("sim") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute && brute.nonEmpty)
  }

  test("KMeans == driver-side Lloyd reference on random vectors; inertia non-increasing") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812)
    val dim = 4; val k = 4; val n = 60
    val vecs = (0 until n).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))).toMap
    // driver reference: identical recurrence incl. the 6-dp rounded
    // argmin + label tie-break (tiny fold-order noise stays ≪ rounding)
    def d2(v: Array[Double], c: Array[Double]): Double = {
      val vv = v.map(x => x * x).sum
      val cc = c.map(x => x * x).sum
      val vc = v.zip(c).map { case (a, b) => a * b }.sum
      BigDecimal(vv - 2.0 * vc + cc)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var ref = vecs.map { case (id, _) => id -> (id % k) }
    var prevInertia = Double.MaxValue
    val e = vecs.toSeq.sortBy(_._1).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "v")
    for (iters <- 1 to 3) {
      val cents = ref.groupBy(_._2).map { case (cell, members) =>
        val vs = members.keys.map(vecs)
        cell -> (0 until dim).map(j => vs.map(_(j)).sum / vs.size).toArray
      }
      ref = vecs.map { case (id, v) =>
        id -> cents.toSeq.map { case (c, cv) => (d2(v, cv), c) }.min._2
      }
      val got = graft.ops.KMeans.assignments(spark, e, k, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.map(g => g._1 -> g._2).toMap == ref,
        s"iters=$iters assignment mismatch")
      val inertia = got.map(_._3).sum
      assert(inertia <= prevInertia + 1e-6,
        s"iters=$iters inertia $inertia rose above $prevInertia")
      prevInertia = inertia
    }
  }

  test("Triangles == driver-side brute force on random multigraphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812)
    for (trial <- 1 to 3) {
      val nV = 8 + rnd.nextInt(20)
      val nE = 2 * nV + rnd.nextInt(4 * nV)
      // raw directed multigraph with self-loops — the operator must
      // canonicalize before counting
      val raw = Seq.fill(nE)((rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val und = raw.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val undSet = und.toSet
      val verts = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val expected = (for {
        i <- verts; j <- verts if i < j; k <- verts if j < k
        if undSet((i, j)) && undSet((j, k)) && undSet((i, k))
      } yield Seq(i, j, k)).flatten
        .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
      val got = graft.ops.Triangles.perNode(raw.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial (nV=$nV nE=$nE): got $got expected $expected")
      // the bloom-pruned closing path must be result-identical (false
      // positives die in the closing join, false negatives impossible)
      val gotBloom = graft.ops.Triangles
        .perNode(raw.toDF("src", "dst"), bloomPrune = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotBloom == expected, s"trial $trial bloom path diverged")
      // the size-adaptive entry (r15): budget 0 forces the prune ON,
      // the default budget leaves this tiny graph plain — both must
      // equal brute force (the switch may only ever change bytes)
      val gotAuto0 = graft.ops.Triangles
        .perNodeAuto(raw.toDF("src", "dst"), budget = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotAuto0 == expected, s"trial $trial auto(0) path diverged")
      val gotAuto = graft.ops.Triangles.perNodeAuto(raw.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotAuto == expected, s"trial $trial auto path diverged")
    }
  }

  test("span-dedup apply == brute force on random corpora with seeded duplicate spans") {
    // randomized corpora engineered to hit the edge cases the real
    // fixture may not: docs shorter than K (no grams), docs that ARE
    // exactly the duplicated span (fully covered → zero survivors),
    // spans inserted at doc boundaries, and a small vocabulary so
    // accidental cross-doc grams arise beyond the seeded ones.
    import spark.implicits._
    val rnd = new scala.util.Random(20260813)
    for (trial <- 1 to 2) {
      val vocab = Vector.tabulate(25)(i => s"w$i")
      val dupSpan = Vector.tabulate(13)(i => s"d$i") // > K: interior grams duplicate too
      val nDocs = 18 + rnd.nextInt(18)
      val docs = (0L until nDocs.toLong).map { id =>
        val base = Vector.fill(8 + rnd.nextInt(45))(vocab(rnd.nextInt(vocab.size)))
        val t = rnd.nextDouble() match {
          case p if p < 0.10 => dupSpan // the span IS the doc
          case p if p < 0.55 =>
            val at = rnd.nextInt(base.size + 1)
            base.take(at) ++ dupSpan ++ base.drop(at)
          case _ => base
        }
        (id, if (id % 3 == 0) "aa" else "bb", t.toArray)
      }
      val expected = SpanRef.perLang(docs)
      val df = docs.map { case (id, l, t) => (id, l, t.mkString(" ")) }
        .toDF("doc_id", "lang", "text")
      val got = graft.queries.PipelineQueries.spanApplyOn(df).collect()
      assert(got.map(_.getAs[String]("lang")).toSet == expected.keySet, s"trial $trial langs")
      got.foreach { r =>
        val e = expected(r.getAs[String]("lang"))
        assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_touched"),
          r.getAs[Long]("n_surviving"), r.getAs[Long]("toks_removed"),
          r.getAs[Long]("chars_removed")) == e,
          s"trial $trial lang ${r.getAs[String]("lang")}")
      }
    }
  }

  test("PageRank == driver-side reference recurrence on random weighted digraphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812)
    for (trial <- 1 to 3) {
      val nV = 5 + rnd.nextInt(15)
      val nE = nV + rnd.nextInt(3 * nV)
      val raw = Seq.fill(nE)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong, 1.0 + rnd.nextInt(5)))
      val edges = raw.groupBy(e => (e._1, e._2))
        .map { case ((s0, d0), es) => (s0, d0, es.map(_._3).sum) }.toSeq
      // reference: dense leaky-PageRank recurrence on the driver
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val n = verts.length
      val outw = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._3).sum }
      var pr = verts.map(v => v -> 1.0 / n).toMap
      for (_ <- 1 to 3) {
        val cin = edges.groupBy(_._2).map { case (d0, es) =>
          d0 -> es.map(e => pr(e._1) * e._3 / outw(e._1)).sum
        }
        pr = verts.map(v => v -> (0.15 / n + 0.85 * cin.getOrElse(v, 0.0))).toMap
      }
      val got = graft.ops.PageRank.run(edges.toDF("src", "dst", "w"), 0.85, 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == pr.keySet, s"trial $trial node-set mismatch")
      pr.foreach { case (v, expect) =>
        assert(math.abs(got(v) - expect) < 1e-12,
          s"trial $trial node $v: got ${got(v)}, expected $expect")
      }
      // leaky mass invariant: (1-d) ≤ Σpr ≤ 1 (equality iff no danglers)
      val mass = got.values.sum
      assert(mass > 0.15 - 1e-9 && mass < 1.0 + 1e-9, s"mass $mass out of range")
    }
  }

  test("PairMining.cooccur == naive self-join, with chunking ACTIVE on a hot key") {
    import spark.implicits._
    // seeded (key, item) relation with one deliberately hot key (300
    // distinct items ≫ cap=64 → g=5 chunks, 15 chunk-pair buckets) plus
    // a spread of cold keys — the chunked path and the single-bucket
    // path both execute, and the hot key's C(300,2)=44 850 pairs must
    // come back exactly once each.
    val rnd = new scala.util.Random(7)
    val hot = (0 until 300).map(i => (0L, i.toLong))
    val cold = (1 to 40).flatMap { k =>
      rnd.shuffle((0 until 500).toList).take(1 + rnd.nextInt(20))
        .map(v => (k.toLong, v.toLong))
    }
    val rows = (hot ++ cold).toDF("k", "v")
    val got = graft.ops.PairMining.cooccur(rows, "k", "v", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // driver-side brute-force reference
    val expect = (hot ++ cold).groupBy(_._1).values.flatMap { grp =>
      val items = grp.map(_._2).sorted
      for (i <- items.indices; j <- i + 1 until items.size)
        yield (items(i), items(j))
    }.groupBy(identity).map { case (p, occ) => p -> occ.size.toLong }
    assert(got == expect,
      s"cooccur mismatch: ${got.size} pairs vs expected ${expect.size}")
    // the exact-map equality above IS the complete check: with cap=64
    // and 300 hot items, ng = 5 chunks, so all 15 chunk-pair buckets
    // (incl. every cross-chunk product) must have produced their pairs
    // exactly once for the 44 850-pair hot block to match.
  }

  test("LabelPropagation == driver-side synchronous reference") {
    import spark.implicits._
    // seeded random undirected graph: 40 nodes, ~250 distinct edges
    val rnd = new scala.util.Random(11)
    val es = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val und = (es ++ es.map(_.swap)).distinct
    val adj = und.toDF("node", "nbr")
    val got = graft.ops.LabelPropagation.run(adj, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: synchronous mode-of-neighbor-labels, ties to smallest
    val nbrs = und.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    var lbl = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = nbrs.map { case (n, ns) =>
        val cnt = ns.groupBy(lbl).view.mapValues(_.size)
        n -> cnt.maxBy { case (l, c) => (c, -l) }._1
      }
    }
    assert(got == lbl, "LPA labels diverge from the synchronous reference")
    // labels coarsen: after 3 rounds there are fewer distinct labels
    // than nodes on a connected-ish random graph
    assert(got.values.toSet.size < got.size)
  }

  test("PairMining.cooccur handles singleton and two-item groups") {
    import spark.implicits._
    val rows = Seq((1L, 10L), (2L, 20L), (2L, 30L)).toDF("k", "v")
    val got = graft.ops.PairMining.cooccur(rows, "k", "v", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((20L, 30L, 1L)))
  }
}
