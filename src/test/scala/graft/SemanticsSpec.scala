package graft

import org.apache.spark.sql.functions._
import graft.{Tables => T}

/** Semantic invariants for the TEST-only (non-oracled) operators:
  * sketch error bounds, LSH recall, and streaming statefulness.
  */
class SemanticsSpec extends SparkSpec {

  test("agg_approx_hll within 5% of exact distinct counts") {
    val approx = SparkEntry.queries("agg_approx_hll")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = T.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"$k: approx $ap vs exact $ex exceeds 5%")
    }
  }

  test("agg_distinct_kmv: exact below k, estimator within theory bounds above") {
    // the sketch's two regimes: a group with fewer than k=256 distinct
    // members must report EXACTLY its distinct count (the sketch holds
    // the whole hash set), and a sketched group's error must sit well
    // inside the KMV standard-error envelope (~1/√(k−2) ≈ 6.3%; 3σ
    // bound asserted). The oracle already pins the exact output values;
    // this pins the STATISTICAL claim the key exists to make.
    val rows = SparkEntry.queries("agg_distinct_kmv")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, exact, est, errBp) =>
      if (exact < 256)
        assert(est == exact, s"$et: sub-k group must be exact, got $est vs $exact")
      else
        assert(errBp <= 1900, // 3/√254 ≈ 18.8% in basis points
          s"$et: err $errBp bp exceeds the 3σ KMV envelope")
      assert(errBp == math.floor(math.abs(est - exact) * 10000.0 / exact).toLong)
    }
  }

  test("agg_bloom_det: zero false negatives, FP rate inside theory, bit set union-mergeable") {
    // (a) no (maybe=false, actual=true) row may exist — bits are only
    // ever SET, so a member's k bits are always present; (b) the FP
    // KEY-rate is bounded by ~2x the fill-rate theory (1-e^{-kn/m})^k;
    // (c) the filter is union-mergeable: per-shard bit sets OR-folded
    // equal the whole-build bit set — the partial-aggregate property.
    val rows = SparkEntry.queries("agg_bloom_det")(spark, sf)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(!rows.exists { case (maybe, actual, _) => !maybe && actual },
      "bloom produced a false negative")
    // probe-bit derivation SHARED with the query (SketchQueries
    // .bloomProbeBits) — the pins always test the filter as built
    def kmBits(key: org.apache.spark.sql.Column) =
      graft.queries.SketchQueries.bloomProbeBits(key)
    def bitsOf(filter: org.apache.spark.sql.Column): Set[Long] =
      T.part(spark, sf).filter(col("p_size") === 50).filter(filter)
        .select(explode(kmBits(col("p_partkey"))).as("b"))
        .distinct().collect().map(_.getLong(0)).toSet
    val whole = bitsOf(lit(true))
    assert((bitsOf(col("p_partkey") % 2 === 0) union
      bitsOf(col("p_partkey") % 2 =!= 0)) == whole,
      "per-shard OR-folded bit sets != whole-build bit set")
    // FP KEY-rate vs fill-rate theory, re-derived on distinct probe
    // keys with the key's exact hash formula against the whole bit set
    val n = T.part(spark, sf).filter(col("p_size") === 50).count()
    val fpTheory = math.pow(1.0 - math.exp(-3.0 * n / 4096.0), 3)
    val bitsLit = typedLit(whole.toSeq.sorted)
    val keys = T.lineitem(spark, sf).select(col("l_partkey")).distinct()
      .join(T.part(spark, sf).filter(col("p_size") === 50)
        .select(col("p_partkey").as("bk")), col("l_partkey") === col("bk"), "left")
    val nonMemberKeys = keys.filter(col("bk").isNull).count()
    val fpKeys = keys.filter(col("bk").isNull)
      .filter(size(array_except(kmBits(col("l_partkey")), bitsLit)) === 0)
      .count()
    assert(fpKeys <= math.max(4.0, 2.0 * fpTheory * nonMemberKeys),
      s"FP keys $fpKeys exceed 2x theory ${fpTheory * nonMemberKeys}")
  }

  test("text_rake_keywords: matches a driver-side reference RAKE") {
    val stops = Set("a", "data", "value", "key", "row", "table", "column", "order")
    val docs = T.documents(spark, sf).select("text")
      .collect().map(_.getString(0))
    val allPhrases = docs.flatMap { text =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = List.empty[String]
      // split(_, -1): keep trailing empty tokens, matching Spark's
      // split() and DuckDB's string_split on trailing-space texts
      for (t <- text.split(" ", -1)) {
        if (stops(t)) { if (cur.nonEmpty) { out += cur.reverse; cur = Nil } }
        else cur = t :: cur
      }
      if (cur.nonEmpty) out += cur.reverse
      out
    }
    val freq = allPhrases.flatten.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val deg = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (p <- allPhrases; w <- p) deg(w) += p.length
    val wScore = freq.keys.map(w => w -> deg(w) * 1000000L / freq(w)).toMap
    val expected = allPhrases
      .map(p => (p.mkString(" "), p.map(wScore).sum))
      .groupBy(_._1).toSeq
      .map { case (ph, xs) => (ph, xs.head._2, xs.length.toLong) }
      .sortBy { case (ph, sc, _) => (-sc, ph) }.take(20)
    val got = SparkEntry.queries("text_rake_keywords")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    assert(got == expected, s"\ngot      $got\nexpected $expected")
  }

  test("sample_mixture_ipf: fitted margins hit their targets within truncation") {
    // IPF's whole claim: after the alternating fits, BOTH margins are
    // near their targets. The LAST half-step fits source, so each
    // source margin is exact up to per-cell truncation (each cell
    // loses < 1 ppm unit); lang was fitted one step earlier, so its
    // margin drifts by the source correction — assert a loose 25%.
    val rows = SparkEntry.queries("sample_mixture_ipf")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.forall(_._4 >= 0))
    val tSrc = 1000000L / rows.map(_._2).distinct.length
    val bySrc = rows.groupBy(_._2).map { case (src, cs) =>
      (src, cs.map(_._4).sum, cs.length)
    }
    for ((src, margin, nCells) <- bySrc) {
      assert(margin <= tSrc && margin > tSrc - nCells,
        s"source $src margin $margin outside ($tSrc - $nCells, $tSrc]")
    }
    // lang targets re-derived exactly as the query builds them
    val langN = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val sqs = langN.view.mapValues(n => math.sqrt(n.toDouble).toLong).toMap
    val sqTot = sqs.values.sum
    for ((lang, cs) <- rows.groupBy(_._1)) {
      val t = sqs(lang) * 1000000L / sqTot
      val margin = cs.map(_._4).sum
      assert(math.abs(margin - t) <= math.max(t / 4, 1000),
        s"lang $lang margin $margin vs temperature target $t")
    }
  }

  test("agg_quantile_det: two-pass bin selection equals direct rank selection") {
    // the operator's whole claim: histogram + within-bin residual rank
    // picks exactly the value a global sort would put at rank
    // k = ceil(q*n), for every target, including duplicate-heavy data
    val rows = SparkEntry.queries("agg_quantile_det")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5, s"expected 5 quantiles, got ${rows.length}")
    val cents = T.lineitem(spark, sf)
      .select(expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    for ((qbp, nn, k, v) <- rows) {
      assert(nn == n)
      assert(k == (qbp.toLong * n + 9999) / 10000, s"rank formula drift at $qbp")
      assert(v == cents((k - 1).toInt), s"value at rank $k differs for q_bp=$qbp")
    }
  }

  test("agg_hll_det: estimate within the m=64 error envelope, registers max-mergeable") {
    // the two claims the deterministic HLL exists to make: (a) the
    // estimate sits inside the classic 1.04/√m ≈ 13% envelope (3σ
    // asserted — the fixture's deterministic draw measures 6-12%), and
    // (b) registers are MAX-mergeable: per-shard register tables folded
    // cell-wise by max must equal the whole-input registers — the
    // partial-aggregate property that makes it a one-pass sketch at
    // 100 TB. The oracle already pins the exact output values; this
    // pins the statistics and the merge algebra.
    val rows = SparkEntry.queries("agg_hll_det")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, exact, est, errBp) =>
      assert(errBp <= 3900, s"$et: err $errBp bp exceeds the 3σ HLL envelope")
      assert(errBp == math.floor(math.abs(est - exact) * 10000.0 / exact).toLong)
    }
    import graft.ops.TextOps
    def regs(filter: org.apache.spark.sql.Column): Map[(String, Long), Int] =
      T.events(spark, sf).filter(filter)
        .select(col("event_type"),
          TextOps.md5Long(concat(lit("hll:"), col("user_id"))).as("h"))
        .selectExpr("event_type", "pmod(h, 64) AS j", "h DIV 64 AS w")
        .withColumn("rho", when(col("w") === 0L, lit(55))
          .otherwise(instr(lpad(bin(col("w")), 54, "0"), "1")).cast("int"))
        .groupBy("event_type", "j").agg(max("rho").as("mj"))
        .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getInt(2)).toMap
    val even = regs(col("user_id") % 2 === 0)
    val odd = regs(col("user_id") % 2 =!= 0)
    val whole = regs(lit(true))
    val folded = (even.keySet ++ odd.keySet).map { k =>
      k -> math.max(even.getOrElse(k, 0), odd.getOrElse(k, 0)) }.toMap
    assert(folded == whole, "per-shard max-folded registers != whole-input registers")
  }

  test("sink_zorder_layout: the 2-dim box prunes scan rows a 1-dim sort cannot") {
    // the key's oracle proves the ANSWER is layout-invariant; this pins
    // the layout's point — identical data written (a) z-clustered and
    // (b) linearly sorted by l_orderkey alone, same box predicate, and
    // the z layout's parquet row-group pruning must read strictly less:
    // the 1-dim sort serves only the orderkey bound (~1/8 of files),
    // the Morton layout serves both bounds (~1/64 of the space plus
    // square-boundary fringe files).
    import graft.ops.ZOrder
    import org.apache.spark.sql.SaveMode
    val li = T.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val total = li.count()
    val r = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head()
    def lv(i: Int) = r.getAs[Number](i).longValue
    // the key's code-grid-aligned box (codes [64,95] on each dim)
    val (oLo, oHi) = (lv(0) + (64 * (lv(1) - lv(0)) + 254) / 255,
      lv(0) + (96 * (lv(1) - lv(0)) + 254) / 255 - 1)
    val (pLo, pHi) = (lv(2) + (64 * (lv(3) - lv(2)) + 254) / 255,
      lv(2) + (96 * (lv(3) - lv(2)) + 254) / 255 - 1)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scanRows(dir: String): Long = {
        val df = spark.read.parquet(dir)
          .filter(col("l_orderkey").between(oLo, oHi) &&
            col("l_partkey").between(pLo, pHi))
        df.queryExecution.executedPlan.executeCollect()
        df.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.map(_.metrics("numOutputRows").value).sum
      }
      val zDir = graft.Tmp.dir("z_sem").toString
      val sDir = graft.Tmp.dir("s_sem").toString
      ZOrder.writeClustered(li, "l_orderkey", "l_partkey", 64, zDir)
      li.repartitionByRange(64, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode(SaveMode.Overwrite).parquet(sDir)
      val (zRows, sRows) = (scanRows(zDir), scanRows(sDir))
      assert(zRows * 2 < sRows,
        s"z layout read $zRows rows, 1-dim sort $sRows — expected <half")
      assert(zRows <= total / 8,
        s"z layout read $zRows of $total rows — box should prune ≥ 7/8")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("multimodal_phash: seeded twins recalled despite differing bytes, cap holds") {
    // every planted chroma-rotated twin SHOULD pair with its original
    // (identical red plane ⇒ identical dHash56); the 32-member bucket
    // cap may drop twins sitting in degenerate hot buckets — recall
    // must stay ≥ 0.9 — and every seeded pair must differ at byte
    // level (the whole point: byte hashing is blind to these dups).
    val rows = SparkEntry.queries("multimodal_phash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getInt(4)))
    val seeded = rows.filter(_._3 == 1)
    val nTwins = T.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0).count()
    assert(seeded.length >= 0.9 * nTwins,
      s"seeded recall ${seeded.length}/$nTwins below 0.9")
    seeded.foreach { case (a, b, _, bytesDiffer) =>
      assert(b - a == (1L << 40), s"seeded pair ($a,$b) is not a twin pair")
      assert(bytesDiffer == 1, s"twin pair ($a,$b) should differ at byte level")
    }
  }

  test("agg_countmin: one-sided error (never under), within the ε-envelope") {
    // the two claims the sketch exists to make: estimate ≥ truth ALWAYS
    // (collisions only add), and overshoot ≤ ε·N with ε = e/w for all
    // ten probes (P(fail) ≤ e^−d ≈ 1.8% per item; the deterministic
    // md5 grid makes the fixture's outcome reproducible, so pin it).
    val rows = SparkEntry.queries("agg_countmin")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 10)
    val nTok = T.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").count()
    val eps = math.E / 64.0
    rows.foreach { case (w, exact, est) =>
      assert(est >= exact, s"$w: CMS under-estimated ($est < $exact)")
      assert(est - exact <= eps * nTok,
        s"$w: overshoot ${est - exact} exceeds ε·N = ${eps * nTok}")
    }
  }

  test("agg_countmin grid is linear: sketch(A) + sketch(B) = sketch(A∪B)") {
    // mergeability IS the 100 TB property — per-shard grids summed
    // cell-wise must equal the whole-corpus grid, which is why the
    // build is a partial aggregate. Re-derive the d×w grid on the
    // even/odd doc_id halves and on the full corpus with the key's
    // exact hash formula and compare cell-for-cell.
    import graft.ops.TextOps
    def grid(filter: org.apache.spark.sql.Column): Map[(Int, Long), Long] =
      T.documents(spark, sf).filter(filter)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .select(explode(array((0 until 4).map(r =>
          struct(lit(r).as("r"),
            pmod(TextOps.md5Long(concat(lit(s"cm$r:"), col("w"))),
              lit(64L)).as("b"))): _*)).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.b").as("b")).count()
        .collect().map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    val even = grid(col("doc_id") % 2 === 0)
    val odd = grid(col("doc_id") % 2 === 1)
    val full = grid(lit(true))
    val merged = (even.keySet ++ odd.keySet).map(k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))).toMap
    assert(merged == full, "cell-wise sum of half-grids must equal the full grid")
  }

  test("MinHash-LSH near-dup output ⊇ exact Jaccard pairs at J≥0.9 and ⊆ at J≥0.5") {
    val exact = SparkEntry.queries("dedup_jaccard_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // exact verification ⇒ no false positives at the 0.5 threshold
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh -- exact}")
    // banding (32 perms × 4 rows) must not lose high-similarity pairs
    val high = exact.filter(_._3 >= 0.9)
    assert(high.subsetOf(lsh), s"LSH missed high-J pairs: ${high -- lsh}")
  }

  test("merge_scd2 history is consistent with the snapshot diff's verdicts") {
    // cross-key invariant over the SAME prev/curr derivation: a changed
    // doc contributes exactly two history rows (closed + open), every
    // other status one — so total rows and the open-row count are both
    // linear functions of the diff's per-status counts.
    val diff = SparkEntry.queries("dedup_snapshot_diff")(spark, sf)
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
      .withDefaultValue(0L)
    val hist = SparkEntry.queries("merge_scd2")(spark, sf).cache()
    try {
      val total = hist.count()
      val open = hist.filter(col("is_current") === 1).count()
      val closed = hist.filter(col("vto").isNotNull).count()
      assert(total == diff("unchanged") + diff("added") + diff("removed")
        + 2 * diff("changed"),
        s"history rows $total vs diff $diff")
      assert(open == diff("unchanged") + diff("added") + diff("changed"))
      assert(closed == diff("removed") + diff("changed"))
    } finally hist.unpersist()
  }

  test("dedup_containment: every seeded excerpt is found fully contained in its parent") {
    // the seeding contract: the %29 slice's excerpt (parent_id + base)
    // shares a contiguous shingle run with its parent, so the pair
    // (parent, excerpt) must surface with overlap coefficient 1.0 —
    // unless the excerpt is too short to carry a 3-shingle at all.
    val docs = T.documents(spark, sf)
    val base = docs.agg(max("doc_id")).head.getLong(0) + 1L
    val eligible = docs.filter(col("doc_id") % 29 === 0)
      .filter(size(split(col("text"), " ")) >= 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = SparkEntry.queries("dedup_containment")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val excerptPairs = pairs.filter { case (a, b, _) => b - base == a }
    assert(excerptPairs.nonEmpty, "no excerpt-in-parent pairs surfaced")
    excerptPairs.foreach { case (a, b, ov) =>
      assert(ov == 1.0, s"excerpt $b in parent $a has ov $ov != 1.0")
    }
    // completeness: every eligible seeded excerpt is recovered
    val found = excerptPairs.map(_._1).toSet
    assert(eligible.subsetOf(found),
      s"seeded excerpts missed by the mining: ${eligible -- found}")
  }

  test("ts_anomaly flags the seeded day-13 spike") {
    val rows = SparkEntry.queries("ts_anomaly")(spark, sf).collect()
    val day13 = rows.filter(_.getTimestamp(1).toLocalDateTime.getDayOfMonth == 13)
    assert(day13.nonEmpty, "no day-13 rows in the full-frame output")
    assert(day13.exists(_.getInt(5) == 1),
      "the seeded 3x day-13 spike was not flagged by the 3-sigma fence")
  }

  test("streaming watermark job drops held-back late events") {
    val streamed = SparkEntry.queries("stream_watermark_late")(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    val total = T.events(spark, sf).count()
    val late = T.events(spark, sf).filter(col("event_id") % 40 === 0).count()
    assert(streamed < total, "no events were dropped")
    // at least the on-time events survive
    assert(streamed >= total - late, s"dropped more than the late set: $streamed")
  }

  test("streaming dedup removes every reinjected duplicate") {
    val streamed = SparkEntry.queries("stream_dedup_stateful")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = T.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      s"streaming dedup counts $streamed != batch counts $batch")
  }

  test("state-store provider invariance: rocksdb replay equals the hdfs replay") {
    // r16 verdict #4: the RocksDB+changelog provider is the A/B lever
    // on the stateful family's commit floor — a provider stores state,
    // it must not change semantics. Pin that: the same stateful dedup
    // replay under both providers yields identical rows, so the bench
    // A/B (GRAFT_STREAM_STATE_PROVIDER=rocksdb) compares walls over a
    // provably unchanged result surface.
    def counts(): Map[String, Long] =
      SparkEntry.queries("stream_dedup_stateful")(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hdfs = counts()
    System.setProperty("graft.stream.stateProvider", "rocksdb")
    try {
      val rocks = counts()
      assert(rocks == hdfs,
        s"provider changed the result: rocksdb=$rocks hdfs=$hdfs")
      // the knob must not leak into the shared session conf (getOption
      // surfaces the registered HDFS default after unset — assert the
      // override is gone, not that the conf is absent)
      assert(!spark.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
        .exists(_.contains("RocksDB")),
        "providerClass leaked into the session after the scoped replay")
    } finally System.clearProperty("graft.stream.stateProvider")
  }

  test("stream_ingest_dedup equals the cross-split minhash pairs; index reuse is warm") {
    // batch equivalence: the streamed ingest screen (candidates from
    // the PERSISTED band index, verified at J>=0.5) must equal the
    // corpus x incoming restriction of dedup_minhash_lsh's pair set —
    // same shingles, same permutations, same banding, so the file
    // replay may change nothing
    val ingest = SparkEntry.queries("stream_ingest_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ingest.nonEmpty, "no cross-split near-dups found at this sf")
    ingest.foreach { case (a, b, j) =>
      assert(a % 5 < 3 && b % 5 >= 3, s"pair ($a,$b) crosses the wrong way")
      assert(j >= 0.5, s"pair ($a,$b) below the verify threshold: $j")
    }
    val batch = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 5 < 3) != (b % 5 < 3) }
      .map { case (a, b, j) => if (a % 5 < 3) (a, b, j) else (b, a, j) }
    assert(ingest.toSet == batch.toSet,
      s"streamed pairs != batch cross-split pairs " +
        s"(${ingest.length} vs ${batch.length})")
    // persisted-index reuse: the second run must serve off the stamp
    // check without rewriting the index (cross-SESSION reuse shape)
    val marker = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_MINHASH_INDEX_ROOT", "/tmp/graft_minhash_index"),
      java.nio.file.Paths.get(sf).getFileName.toString, "_INDEX")
    val mtime = java.nio.file.Files.getLastModifiedTime(marker)
    val again = SparkEntry.queries("stream_ingest_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSet == ingest.toSet, "second serve differs")
    assert(java.nio.file.Files.getLastModifiedTime(marker) == mtime,
      "index was rebuilt despite a matching provenance stamp")
  }

  test("stream_session_tws: exactly-once emission, gap structure, and batch equality") {
    val out = SparkEntry.queries("stream_session_tws")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    // exactly-once: no session emitted twice (in-fold AND by its timer)
    assert(out.map(s => (s._1, s._2)).distinct.length == out.length,
      "duplicate (user, session_start) — a session was emitted twice")
    // session accounting: every event lands in exactly one session
    assert(out.map(_._4).sum == T.events(spark, sf).count(),
      "session n_events do not sum to the event count")
    // gap structure: within a user, consecutive sessions are separated
    // by MORE than the 1-day gap, and each session spans start <= end
    out.groupBy(_._1).foreach { case (u, ss) =>
      val sorted = ss.sortBy(_._2.getTime)
      sorted.foreach(s => assert(!s._2.after(s._3), s"user $u: start > end"))
      sorted.sliding(2).map(_.toSeq).foreach {
        case Seq(a, b) =>
          // getTime is ms (floor of the µs gap), so the strict µs
          // inequality weakens to >= at ms granularity
          assert(b._2.getTime - a._3.getTime >= 24L * 3600 * 1000,
            s"user $u: sessions closer than the gap — should have merged")
        case _ => ()
      }
    }
    // equality with batch gaps-islands sessionization (the oracle's
    // Spark-side replay — pins the operator against the declarative
    // form inside one engine too)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val batch = T.events(spark, sf)
      .withColumn("us", expr("unix_micros(ts)")) // µs-exact, not cast-to-seconds
      .withColumn("brk", when(col("us") - lag(col("us"), 1).over(w)
        > 24L * 3600 * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))).toSet
    assert(out.toSet == batch, "streamed sessions != batch gaps-islands sessions")
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = SparkEntry.queries("stream_stream_join")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = T.events(spark, sf)
    val batch = ev.as("p").filter(col("p.event_type") === "purchase")
      .join(ev.as("c").filter(col("c.event_type") === "click"),
        col("p.user_id") === col("c.user_id") &&
          col("c.ts") >= col("p.ts") - expr("INTERVAL 10 MINUTES") &&
          col("c.ts") < col("p.ts"))
      .groupBy(col("p.user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    // r5 weak mark: the raw pair rows used to land in a driver-heap
    // `memory` sink (O(matches) rows on the driver — a scale-killer).
    // Pin the executor-side path: the job's sink must be foreachBatch.
    assert(graft.streaming.StreamingJobs.sinkDescription("ss_join").contains("ForeachBatchSink"),
      s"stream_stream_join sink regressed to " +
        s"'${graft.streaming.StreamingJobs.sinkDescription("ss_join")}'")
  }

  test("staging contract: a chunk beyond maxChunk fails loudly, not silently") {
    // the replay trusts event_id to be 0-based dense; if it weren't,
    // rows would stage into a chunk the feeder never moves and silently
    // vanish. assertStagedWithin must catch that from the staged dirs.
    import spark.implicits._
    val rows = Seq((0L, "a", 0L), (1L, "b", 3L)).toDF("id", "v", "chunk")
    val stage = graft.streaming.StreamingJobs.stageChunks(rows, "contract", 3L)
    try {
      graft.streaming.StreamingJobs.assertStagedWithin(stage, 3L) // in-bounds passes
      val e = intercept[IllegalArgumentException] {
        graft.streaming.StreamingJobs.assertStagedWithin(stage, 2L)
      }
      assert(e.getMessage.contains("maxChunk=2"))
    } finally Tmp.quietDeleteRecursively(java.nio.file.Paths.get(stage).getParent)
  }

  test("streaming stateful per-user counts equal batch counts") {
    val streamed = SparkEntry.queries("stream_stateful_count")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = T.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    // per-user updates are O(users) — data-dependent — so they must
    // reach the result via executor-side parquet, never a driver-heap
    // memory sink (same pin as stream_stream_join)
    assert(graft.streaming.StreamingJobs.sinkDescription("user_state").contains("ForeachBatchSink"),
      s"stream_stateful_count sink regressed to " +
        s"'${graft.streaming.StreamingJobs.sinkDescription("user_state")}'")
  }

  test("stream_tws_ttl: unexpired TTL state equals the batch aggregate") {
    // 1-h TTL over a seconds-long replay: nothing expires, so the
    // TTL-configured state must fold exactly like NoTimeout state
    val streamed = graft.streaming.StreamingJobs
      .twsTtlCounts(spark, sf, ttlMs = 3600L * 1000, sleepMs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = T.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("stream_tws_ttl: expired state DROPS across the inter-batch gap") {
    // 300 ms TTL + a 1.5 s pause between the two micro-batches: every
    // value written in batch 0 is past its horizon when batch 1 reads,
    // so a user seen in both chunks RESTARTS at zero — its final count
    // is its last-chunk count, not the cumulative total. This is the
    // unbounded-key-space guard at 100 TB: idle keys leave the store.
    val streamed = graft.streaming.StreamingJobs
      .twsTtlCounts(spark, sf, ttlMs = 300L, sleepMs = 1500L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected: per user, the event count of that user's LAST chunk
    // (the same 2-chunk split formula the replay stages)
    val ev = T.events(spark, sf).select("event_id", "user_id")
    val n = ev.count()
    val per = math.max(1L, math.ceil(n / 2.0).toLong)
    val chunked = ev.withColumn("chunk",
      floor(col("event_id") / lit(per.toDouble)).cast("long"))
    val lastChunk = chunked.groupBy("user_id").agg(max("chunk").as("mc"))
    val expected = chunked.join(lastChunk, "user_id")
      .filter(col("chunk") === col("mc"))
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == expected)
    // non-vacuity: the assertion only bites if some user spans both
    // chunks (i.e. had pre-gap state that MUST have been dropped)
    val spanning = chunked.groupBy("user_id")
      .agg(countDistinct("chunk").as("c")).filter(col("c") === 2).count()
    assert(spanning > 0, "vacuous TTL test: no user spans both chunks")
  }

  test("bloom filter has zero false negatives and bounded false-positive rate") {
    val flags = SparkEntry.queries("agg_bloom_filter")(spark, sf)
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    // ground truth: customers with ≥1 order vs without
    val c = T.customer(spark, sf).select(col("c_custkey"))
    val withOrders = c.join(T.orders(spark, sf)
      .select(col("o_custkey").as("c_custkey")).distinct(), "c_custkey").count()
    val without = c.count() - withOrders
    // no false negatives: every key that was inserted must probe true
    assert(flags.getOrElse(true, 0L) >= withOrders,
      s"bloom filter dropped inserted keys: $flags vs $withOrders")
    // false positives = (true-flagged) - (actually present), bounded
    val fp = flags.getOrElse(true, 0L) - withOrders
    assert(without == 0 || fp.toDouble / without <= 0.05,
      s"bloom FPR ${fp.toDouble / without} above 5%")
    // every customer has orders in this corpus, so measure FPR against
    // keys KNOWN absent (shifted far outside the key range)
    GraftFunctions.register(spark)
    val absentTrue = spark.sql(
      """SELECT CAST(COUNT(*) AS BIGINT) FROM (
        |  SELECT graft_might_contain(
        |    (SELECT graft_bloom_agg(o_custkey, CAST(50000 AS LONG),
        |                            CAST(400000 AS LONG)) FROM sk_orders),
        |    c_custkey + 1000000000) AS maybe
        |  FROM sk_customer) WHERE maybe""".stripMargin).collect()(0).getLong(0)
    val total = T.customer(spark, sf).count()
    assert(absentTrue.toDouble / total <= 0.05,
      s"bloom FPR on absent keys ${absentTrue.toDouble / total} above 5%")
  }

  test("approx_top_k contains the true heavy hitters with near-exact counts") {
    val approx = SparkEntry.queries("agg_approx_topk")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = T.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w")).filter(col("w") =!= "")
      .groupBy("w").count().orderBy(col("count").desc, col("w")).limit(5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, n) =>
      assert(approx.contains(w), s"approx_top_k missed heavy hitter $w")
      // CMS-backed estimate only over-counts, and with 1000 tracked
      // items on this vocab it should be ≤ 1% off
      assert(approx(w) >= n && approx(w) <= (n * 1.01).toLong + 1,
        s"$w: approx ${approx(w)} vs exact $n")
    }
  }

  test("approx quantile sketch within 1% relative error of exact percentiles") {
    val approx = SparkEntry.queries("agg_approx_quantile")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = SparkEntry.queries("agg_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (k, (e50, e90, e99)) =>
      val (a50, a90, a99) = approx(k)
      Seq((a50, e50), (a90, e90), (a99, e99)).foreach { case (a, e) =>
        assert(math.abs(a - e) / e <= 0.01, s"$k: approx $a vs exact $e")
      }
    }
  }

  test("bucketed interval join ≡ naive range self-join, pair for pair") {
    val naive = SparkEntry.queries("join_interval")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketed = SparkEntry.queries("join_interval_bucketed")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed == naive)
  }

  test("temperature resampling: downsample-only, max-lift lang keeps everything") {
    val rows = SparkEntry.queries("sample_temperature")(spark, sf).collect()
    // exactly one lang pins the normalization at 10000 bp (its own
    // f/fmax is literally 1.0) and nothing exceeds it
    assert(rows.map(_.getAs[Long]("rate_bp")).max == 10000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("rate_bp") <= 10000L)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
    // α = 0.5 flattens the mixture: over-represented langs (share >
    // target) must be the downsampled ones
    rows.filter(r => r.getAs[Double]("share") > r.getAs[Double]("target_share"))
      .foreach(r => assert(r.getAs[Long]("rate_bp") < 10000L,
        s"over-represented ${r.getAs[String]("lang")} not downsampled"))
  }

  test("graph_pagerank_raw: bipartite FK structure — sinks rank above sources, mass leaks") {
    // on the raw customer→order graph every customer has zero in-edges
    // (pr pinned at (1−d)/N from round 1) and every order is a dangling
    // sink with at least its FK in-edge (pr strictly above the floor),
    // so the top-50 must be all orders; and the leaky formulation never
    // exceeds total mass 1.
    val rows = SparkEntry.queries("graph_pagerank_raw")(spark, sf).collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getAs[String]("node").startsWith("o:")),
      "a zero-in-edge customer out-ranked an order")
    val prs = rows.map(_.getAs[Double]("pr"))
    assert(prs.sameElements(prs.sortBy(-_)), "not rank-descending")
    val full = graft.ops.PageRank.run(
      spark.read.parquet(s"$sf/orders.parquet")
        .groupBy(concat(lit("c:"), col("o_custkey")).as("src"),
          concat(lit("o:"), col("o_orderkey")).as("dst"))
        .agg(count(lit(1)).cast("double").as("w")), 0.85, 3)
    val n = full.count().toDouble
    val floor = 0.15 / n
    val (cs, os) = full.collect()
      .map(r => (r.getAs[String]("node"), r.getAs[Double]("pr")))
      .partition(_._1.startsWith("c:"))
    assert(cs.forall(c => math.abs(c._2 - floor) < 1e-12),
      "customer off the (1-d)/N floor")
    assert(os.forall(_._2 > floor), "an order at/below the floor")
    assert((cs ++ os).map(_._2).sum <= 1.0 + 1e-9, "leaky total mass exceeded 1")
  }

  test("graph_triangles_raw equals a driver-side brute-force on the co-purchase graph") {
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = op.groupBy(_._1).values.flatMap { ls =>
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = (pairs.toSeq.flatMap(e => Seq(e, e.swap)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val counts = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- pairs; c <- adj(a) & adj(b); if c > b)
      Seq(a, b, c).foreach(n => counts(n) += 1)
    val expected = counts.toSeq.sortBy { case (n, t) => (-t, n) }.take(20)
    val got = SparkEntry.queries("graph_triangles_raw")(spark, sf).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("n_tri"))).toSeq
    assert(got == expected, s"top-20 mismatch: got $got expected $expected")
  }

  test("dedup_span_apply equals a driver-side brute-force reference") {
    // independent reimplementation of the declared semantics with plain
    // Scala collections (the OpsSpec pattern): mine 10-gram occurrences,
    // keep only the lexicographic-min (doc, pos) occurrence of each
    // cross-doc duplicated gram, expand the rest to covered token
    // positions, and account per lang. Any divergence between the
    // distributed plan and the spec (owner tie-break, coverage bounds,
    // the ±1 space arithmetic) breaks an exact Long comparison here.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
      .toSeq
    val expected = SpanRef.perLang(docs)
    val rows = SparkEntry.queries("dedup_span_apply")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("lang")).toSet == expected.keySet)
    rows.foreach { r =>
      val e = expected(r.getAs[String]("lang"))
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_touched"),
        r.getAs[Long]("n_surviving"), r.getAs[Long]("toks_removed"),
        r.getAs[Long]("chars_removed")) == e, s"lang ${r.getAs[String]("lang")}")
    }
    // the audit and the apply must agree on what "duplicated" means:
    // langs with zero removals ⇔ no text_dup_spans rows in that lang
    assert(rows.exists(_.getAs[Long]("chars_removed") > 0),
      "corpus has duplicated spans (text_dup_spans finds them) — apply removed nothing")
  }

  test("dedup_span_corpus is token-exact against the documents and the apply report") {
    val corpus = SparkEntry.queries("dedup_span_corpus")(spark, sf).collect()
    val report = SparkEntry.queries("dedup_span_apply")(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_touched"), r.getAs[Long]("toks_removed"))).toMap
    // cross-key consistency: the artifact's touched-doc rows and
    // removed-token sums must equal the report's per-lang accounting
    val byLang = corpus.groupBy(_.getAs[String]("lang"))
    report.foreach { case (lang, (touched, toks)) =>
      val rows = byLang.getOrElse(lang, Array.empty)
      assert(rows.length == touched, s"$lang touched-doc count")
      assert(rows.map(_.getAs[Long]("n_removed")).sum == toks, s"$lang removed tokens")
    }
    // per-doc token arithmetic: kept + removed == original
    val orig = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong).toMap
    corpus.foreach { r =>
      val clean = r.getAs[String]("clean_text")
      val kept = if (clean.isEmpty) 0L else clean.split(" ", -1).length.toLong
      assert(kept + r.getAs[Long]("n_removed") == orig(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")} token arithmetic")
    }
  }

  test("domain cap keeps exactly min(100, domain size) docs per source") {
    val rows = SparkEntry.queries("sample_domain_cap")(spark, sf).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val docs = rs.map(_.getAs[Long]("n_docs")).sum
      val kept = rs.map(_.getAs[Long]("n_kept")).sum
      assert(kept == math.min(100L, docs), s"$src: kept $kept of $docs")
    }
  }

  test("pipeline_corpus is consistent with the funnel, the span artifact, and the split") {
    // cross-key consistency for the end-to-end artifact (r9 verdict #1
    // fallback, kept alongside the DuckDB oracle): the corpus rows ARE
    // the funnel's stage-4 survivors; a surviving span-touched doc's
    // text is the dedup_span_corpus reconstruction (pre-seed/scrub — so
    // compare on the %7!=0 slice the seeder leaves untouched); split
    // tags match sample_split's md5 buckets doc for doc.
    val corpus = SparkEntry.queries("pipeline_corpus")(spark, sf).collect()
    val funnel = SparkEntry.queries("pipeline_funnel")(spark, sf).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(corpus.length.toLong == funnel("04_exact_dedup"),
      s"corpus rows ${corpus.length} != funnel stage-4 ${funnel("04_exact_dedup")}")
    val spanClean = SparkEntry.queries("dedup_span_corpus")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    val touchedChecked = corpus.count { r =>
      val id = r.getAs[Long]("doc_id")
      spanClean.get(id) match {
        case Some(txt) if id % 7 != 0 => // seeder untouched ⇒ text comparable
          assert(r.getAs[String]("clean_text") == txt, s"doc $id span text")
          true
        case _ => false
      }
    }
    assert(touchedChecked > 0, "no span-touched survivor to cross-check")
    // the split tag is pure doc_id arithmetic — recompute it per row
    val md5 = java.security.MessageDigest.getInstance("MD5")
    corpus.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // TextOps.md5Long: first 15 hex chars of the digest as a long
      val hex = md5.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val b = java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
      val expected = if (b < 90) "train" else if (b < 95) "val" else "test"
      assert(r.getAs[String]("split") == expected, s"doc $id split tag")
    }
  }

  test("ts_active_hll estimates the exact 30-day MAU within 5%, window for window") {
    // the sketch path must cover the same window ends as the exact key
    // and land within standard HLL error (lgK default 12 → ~1.6% RSE;
    // 5% is the generous gate the other sketch keys use)
    val exact = SparkEntry.queries("ts_active_monthly")(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val est = SparkEntry.queries("ts_active_hll")(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet, "window ends differ from the exact key")
    exact.foreach { case (w, ex) =>
      val e = est(w)
      assert(math.abs(e - ex).toDouble / ex <= 0.05,
        s"window $w: estimate $e vs exact $ex exceeds 5%")
    }
  }

  test("trained IVF cells beat hash-bucket cells on recall@3") {
    // the index-quality claim behind sim_ann_ivf_kmeans: Lloyd-trained
    // coarse cells put neighbors together, so the same single-cell
    // search recovers strictly more of the exact top-3 than hash
    // buckets (measured ~3× at sf0.001/sf0.01 — everything here is
    // deterministic, so the comparison cannot flake)
    def top3(name: String) = SparkEntry.queries(name)(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hash = top3("sim_ann_ivf")
    val trained = top3("sim_ann_ivf_kmeans")
    // exact top-3 via a driver-side brute force over unit vectors
    // (fine at the test SF), same rounded-sim + b tie-break contract
    import graft.ops.VectorOps
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        VectorOps.unit(VectorOps.toDouble(
          org.apache.spark.sql.functions.col("embedding"))).as("u"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val exactSet = e.filter(_._1 < 100).flatMap { case (a, ua) =>
      e.filter(_._1 != a)
        .map { case (b, ub) =>
          val sim = math.rint(ua.zip(ub).map { case (x, y) => x * y }.sum * 1e4) / 1e4
          (b, sim)
        }
        .sortBy { case (b, sim) => (-sim, b) }
        .take(3).map { case (b, _) => (a, b) }
    }.toSet
    val rHash = (hash & exactSet).size.toDouble / exactSet.size
    val rTrained = (trained & exactSet).size.toDouble / exactSet.size
    assert(rTrained > rHash,
      s"trained recall $rTrained not above hash-bucket recall $rHash")
  }

  test("sim_ann_ivf_pq composes its parents: pruned scan, bounded recall") {
    // the IVF×PQ composition must behave like IVF ∘ ADC, not like a
    // third algorithm: (a) its candidate count is strictly below the
    // full ADC scan's nq × (n−1) — the IVF stage actually pruned — and
    // with nprobe=4 of k=16 cells it should admit well under half the
    // corpus per probe; (b) restricting the ADC scan can only LOSE
    // exact-top-3 hits, so its recall is ≤ the full-scan ADC recall;
    // (c) both keys grade against the same exact-L2 baseline, so
    // n_exact agrees.
    val ivfpq = SparkEntry.queries("sim_ann_ivf_pq")(spark, sf).collect()(0)
    val adc = SparkEntry.queries("sim_ann_pq_adc")(spark, sf).collect()(0)
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val nq = ivfpq.getAs[Long]("n_exact") / 3  // 3 exact hits per probe
    val nCands = ivfpq.getAs[Long]("n_cands")
    assert(nCands < nq * (n - 1), "IVF stage admitted the full corpus")
    assert(nCands < nq * n / 2, s"nprobe=4/16 admitted $nCands of ${nq * n} — no locality")
    assert(ivfpq.getAs[Long]("n_exact") == adc.getAs[Long]("n_exact"),
      "the two PQ search keys grade against different exact baselines")
    assert(ivfpq.getAs[Double]("recall") <= adc.getAs[Double]("recall"),
      "restricting the ADC scan to IVF cells cannot gain recall")
  }

  test("stream_stateful_count replays identically under the RocksDB state store") {
    // SURVEY §7.4.5 names RocksDB as the at-scale provider (state >
    // executor memory); transformWithState already requires it, but the
    // mapGroupsWithState/dropDuplicates family runs the default
    // HDFS-backed store. Pin provider-independence: the same replay
    // under RocksDB yields row-identical results (r9 verdict #5).
    val default = SparkEntry.queries("stream_stateful_count")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = SparkEntry.queries("stream_stateful_count")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rocks == default,
        s"RocksDB replay diverged: only-rocks=${(rocks -- default).take(3)} " +
          s"only-default=${(default -- rocks).take(3)}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("win_skyline equals the brute-force dominance frontier") {
    // the oracle replays the same cents-grid algorithm in DuckDB, so an
    // algorithmic error would pass the hash gate in lockstep — this
    // pins the DEFINITION: p is on the frontier iff no q has
    // (price ≤, size ≥) with one strict.
    val parts = T.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expect = parts.filter { case (_, pp, ps) =>
      !parts.exists { case (_, qp, qs) =>
        qp <= pp && qs >= ps && (qp < pp || qs > ps)
      }
    }.map(_._1).toSet
    val got = SparkEntry.queries("win_skyline")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect,
      s"skyline diverged: extra=${(got -- expect).take(5)} missing=${(expect -- got).take(5)}")
  }

  test("agg_weighted_median: half the revenue mass sits at or below the median") {
    // direct check of the defining property on exact cent sums
    val li = T.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"),
        expr(s"CAST(${graft.Sql.lineNetDec} * 100 AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val med = SparkEntry.queries("agg_weighted_median")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    med.foreach { case (flag, m) =>
      val grp = li.filter(_._1 == flag)
      val tot = grp.map(_._3).sum
      val below = grp.filter(_._2 <= m).map(_._3).sum
      val strictlyBelow = grp.filter(_._2 < m).map(_._3).sum
      assert(below * 2 >= tot, s"$flag: mass at/below median is under half")
      assert(strictlyBelow * 2 < tot,
        s"$flag: median is not minimal — mass strictly below already covers half")
    }
  }

  test("win_rolling_median equals a driver-side sliding median of the daily series") {
    val daily = T.orders(spark, sf)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)").as("c"))
      .orderBy("day").collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    val got = SparkEntry.queries("win_rolling_median")(spark, sf)
      .collect().map(r => r.getTimestamp(0) -> r.getDouble(3)).toMap
    daily.indices.foreach { i =>
      val win = daily.slice(math.max(0, i - 6), i + 1).map(_._2).sorted
      val n = win.length
      val medX2 = if (n % 2 == 1) win(n / 2) * 2 else win(n / 2 - 1) + win(n / 2)
      assert(got(daily(i)._1) == medX2.toDouble / 200.0,
        s"day ${daily(i)._1}: rolling median diverged")
    }
  }

  test("text_bm25: every hit contains a query term; tf=1 single-term docs tie exactly") {
    // BM25's per-term score depends on (tf, dl) only — sanity-pin the
    // rank structure: scores strictly positive, descending, and the
    // top doc beats any doc with a subset of its matched terms
    val rows = SparkEntry.queries("text_bm25")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 > 0), "BM25 scores must be positive")
    val scores = rows.map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "results must be score-descending")
  }

  test("sample_class_balance: minority class keeps everything, others downsample toward it") {
    val rows = SparkEntry.queries("sample_class_balance")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val minN = rows.map(_._2).min
    rows.foreach { case (label, nBefore, rateBps, nAfter) =>
      if (nBefore == minN)
        assert(rateBps == 10000 && nAfter == nBefore,
          s"label $label: minority class must keep all rows")
      else {
        assert(nAfter <= nBefore, s"label $label: upsampled?")
        // md5 buckets are uniform: expect n_after within 4σ of the
        // binomial mean n·p (p = rate_bps/1e4)
        val p = rateBps / 10000.0
        val mean = nBefore * p
        val sd = math.sqrt(nBefore * p * (1 - p))
        assert(math.abs(nAfter - mean) <= 4 * sd + 1,
          s"label $label: kept $nAfter, expected ~$mean ± ${4 * sd}")
      }
    }
  }

  test("agg_gini equals a driver-side Gini on exact cent revenues") {
    val rev = T.orders(spark, sf)
      .join(T.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(T.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = SparkEntry.queries("agg_gini")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    rev.foreach { case (nation, xs) =>
      val n = xs.length
      val s = xs.sum.toDouble
      val s1 = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum.toDouble
      val expect = math.rint((2.0 * s1 / (n * s) - (n + 1.0) / n) * 1e4) / 1e4
      assert(math.abs(got(nation) - expect) < 2e-4,
        s"$nation: gini ${got(nation)} vs driver $expect")
      assert(got(nation) >= 0 && got(nation) < 1, s"$nation: gini out of range")
    }
  }

  test("quality_kappa: kappa bounded and consistent with raw agreement") {
    val rows = SparkEntry.queries("quality_kappa")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, agree, kappa) =>
      assert(agree <= n, s"$lang: agree > n")
      assert(kappa >= -1.0001 && kappa <= 1.0001, s"$lang: kappa $kappa out of range")
      // the two labelers both proxy document length — they must agree
      // far better than chance
      assert(kappa > 0.2, s"$lang: length-proxy labelers should correlate, got $kappa")
    }
  }

  test("text_bpe_train: round-2 best weight never exceeds round-1 best") {
    // after merging the best pair, any new pair containing the merged
    // symbol inherits at most its weight, and surviving old pairs can
    // only lose adjacencies
    val rows = SparkEntry.queries("text_bpe_train")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val r1 = rows.filter(_._1 == 1)
    val r2 = rows.filter(_._1 == 2)
    assert(r1.length == 10 && r2.length == 10)
    assert(r2.map(_._3).max <= r1.map(_._3).max,
      "merging the top pair cannot increase the best pair weight")
    // every pair is two space-separated non-empty symbols
    assert(rows.forall { case (_, p, _) =>
      val s = p.split(" "); s.length == 2 && s.forall(_.nonEmpty) })
  }

  test("join_fuzzy_blocked equals the brute-force edit-distance pair set within blocks") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = T.part(spark, sf).select("p_name").distinct()
      .collect().map(_.getString(0))
    val expect = (for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last && lev(a, b) <= 2
    } yield (a, b)).toSet
    val got = SparkEntry.queries("join_fuzzy_blocked")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expect,
      s"fuzzy pairs diverged: extra=${(got -- expect).take(3)} missing=${(expect -- got).take(3)}")
    assert(got.nonEmpty, "fixture corpus has lev≤2 name pairs (cold/old etc.)")
  }

  test("sim_centroid_classify: centroid classifier beats chance decisively") {
    // labels 0..9 → chance accuracy 10%; the fixture embeddings carry
    // real label structure (measured 41% at sf0.01)
    val rows = SparkEntry.queries("sim_centroid_classify")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val total = rows.map(_._3).sum
    val diag = rows.filter(r => r._1 == r._2).map(_._3).sum
    assert(total > 0)
    assert(diag.toDouble / total > 0.25,
      s"accuracy ${diag.toDouble / total} — centroids lost the label structure")
  }

  test("sample_epoch_plan: plan arithmetic is exact and hits the target from below") {
    val rows = SparkEntry.queries("sample_epoch_plan")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, target, epochs, fracBps, out) =>
      assert(epochs == target / n, s"$lang: epochs off")
      assert(fracBps == 10000 * (target % n) / n, s"$lang: frac off")
      assert(out == epochs * n + n * fracBps / 10000, s"$lang: expected_out off")
      // the plan may undershoot only by the basis-point truncation
      assert(out <= target && out > target - n / 100 - epochs - 1,
        s"$lang: out $out vs target $target outside truncation slack")
    }
  }

  test("quality_profile agrees with directly computed column facts") {
    val o = T.orders(spark, sf)
    val nRows = o.count()
    val ndKey = o.select(countDistinct("o_orderkey")).collect()(0).getLong(0)
    val rows = SparkEntry.queries("quality_profile")(spark, sf)
      .collect().map(r => r.getString(1) -> (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.size == 6)
    rows.foreach { case (c, (n, nulls, _)) =>
      assert(n == nRows, s"$c: n_rows off")
      assert(nulls == 0, s"$c: fixture has no nulls, profile found $nulls")
    }
    assert(rows("o_orderkey")._3 == ndKey, "orderkey distinct count off")
    assert(rows("o_orderkey")._3 == nRows, "orderkey must be unique")
  }

  test("sim_label_separation: pair bookkeeping exact, cosines in the orthogonal regime") {
    // the fixture's labels separate in their MEANS (the centroid
    // classifier reads 41% vs 10% chance) but NOT in pairwise cosine —
    // 64-dim near-orthogonal vectors keep |avg cos| ≈ 0.01 on both
    // sides, and the audit REPORTING that honestly is its job. What is
    // pinned: exact pair accounting against the probe/corpus splits,
    // and the near-orthogonal range.
    val e = T.embeddings(spark, sf)
    val probesByLabel = e.filter(col("vec_id") < 100)
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val corpusByLabel = e.filter(col("vec_id") >= 100)
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nCorpus = corpusByLabel.values.sum
    val rows = SparkEntry.queries("sim_label_separation")(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getBoolean(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    probesByLabel.foreach { case (l, np) =>
      val intra = rows.get((l, true)).map(_._1).getOrElse(0L)
      val inter = rows.get((l, false)).map(_._1).getOrElse(0L)
      assert(intra == np * corpusByLabel.getOrElse(l, 0L), s"label $l: intra pairs off")
      assert(intra + inter == np * nCorpus, s"label $l: pair total off")
    }
    rows.values.foreach { case (_, avg) =>
      assert(math.abs(avg) < 0.05, s"avg cosine $avg outside the orthogonal regime")
    }
  }

  test("dedup_keep_best picks the true quality argmax of every duplicate cluster") {
    val qSql =
      "CAST(ROUND((0.3 * LEAST(n_tok / 50, 1.0) + 0.4 * (1.0 - stop_ratio)" +
        " + 0.3 * LEAST(avg_tok_len / 6, 1.0)) * 10000) AS BIGINT)"
    val docs = T.documents(spark, sf)
      .withColumn("hh", sha2(array_join(array_sort(array_distinct(
        split(lower(trim(col("text"))), " "))), " "), 256))
      .withColumn("n_tok", size(split(col("text"), " ")).cast("double"))
      .withColumn("stop_ratio",
        size(filter(split(col("text"), " "), t => t.isin("the", "a"))).cast("double") / col("n_tok"))
      .withColumn("avg_tok_len",
        (length(col("text")) - (col("n_tok") - 1)) / col("n_tok"))
      .withColumn("q", expr(qSql))
      .select("hh", "doc_id", "q")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byH = docs.groupBy(_._1).filter(_._2.length > 1)
    val got = SparkEntry.queries("dedup_keep_best")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == byH.keySet, "cluster sets diverged")
    byH.foreach { case (h, members) =>
      val (n, keep, keepQ, naive) = got(h)
      assert(n == members.length)
      assert(naive == members.map(_._2).min)
      val best = members.map(m => (m._3, m._2)).max
      assert((keepQ, keep) == best,
        s"$h: kept ($keepQ,$keep) but argmax is $best")
    }
  }

  test("pipeline_lineage_mask: masks partition the corpus, shares sum to ~10000 bps") {
    val rows = SparkEntry.queries("pipeline_lineage_mask")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nDocs = T.documents(spark, sf).count()
    assert(rows.map(_._2).sum == nDocs, "mask histogram must partition the corpus")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 15), "mask outside 4 bits")
    val bps = rows.map(_._3).sum
    assert(bps <= 10000 && bps > 10000 - rows.length,
      s"floor-truncated shares must sum within ${rows.length} bps of 10000, got $bps")
  }

  test("ts_drawdown: peak is monotone, drawdown zero exactly at new peaks") {
    val rows = SparkEntry.queries("ts_drawdown")(spark, sf)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    var peak = 0.0
    rows.foreach { case (rev, p, dd) =>
      peak = math.max(peak, rev)
      assert(math.abs(p - peak) < 1e-9, "peak must be the running max")
      assert((dd == 0) == (rev == peak), "dd_bps = 0 iff at the running peak")
      assert(dd >= 0 && dd < 10000, s"dd_bps $dd out of range")
    }
  }

  test("sim_hard_negatives: every negative is cross-label, ranked by descending sim") {
    val rows = SparkEntry.queries("sim_hard_negatives")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._4 != r._5), "a hard negative must be cross-label")
    rows.groupBy(_._1).foreach { case (a, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.length <= 3, s"probe $a has more than 3 negatives")
      assert(byRank.map(_._2).toSeq == (1 to byRank.length).toSeq, s"probe $a: rank gap")
      val sims = byRank.map(_._6)
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y },
        s"probe $a: sims not descending")
    }
  }

  test("graph_degree_hist: buckets partition the node set, bounds respect bucket edges") {
    val rows = SparkEntry.queries("graph_degree_hist")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, _, mn, mx) =>
      assert(mn <= mx)
      if (b < 10) {
        assert(mx < (1L << (b + 1)), s"bucket $b: max_deg $mx above edge")
        if (b > 0) assert(mn >= (1L << b), s"bucket $b: min_deg $mn below edge")
      }
    }
  }

  test("pipeline_content_hash: total row is the xor-fold of the per-source rows") {
    val rows = SparkEntry.queries("pipeline_content_hash")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (tot, per) = rows.partition(_._1 == "__total__")
    assert(tot.length == 1 && per.nonEmpty)
    assert(tot.head._2 == per.map(_._2).sum, "total n_docs must sum the sources")
    assert(tot.head._3 == per.map(_._3).reduce(_ ^ _),
      "corpus fingerprint must be the xor of the per-source fingerprints")
    // order-invariance: recompute driver-side from the raw docs
    val driverXor = T.documents(spark, sf)
      .select(graft.ops.TextOps.md5Long(col("text")).as("h"))
      .collect().map(_.getLong(0)).reduce(_ ^ _)
    assert(tot.head._3 == driverXor, "fingerprint must be row-order invariant")
  }

  test("agg_bool_aggs: conditional counts bounded, booleans consistent with counts") {
    val rows = SparkEntry.queries("agg_bool_aggs")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (st, n, nBig, allPos, _, nEven) =>
      assert(nBig <= n && nEven <= n, s"$st: conditional count exceeds n")
      assert(allPos, s"$st: fixture prices are all positive")
    }
  }

  test("fn_hash_codecs: the base64 roundtrip holds for every row") {
    val rows = SparkEntry.queries("fn_hash_codecs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(5)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3), "base64 decode roundtrip failed somewhere")
    assert(rows.forall(_._2.matches("[0-9a-f]{32}")), "md5 must be 32 lowercase hex chars")
  }

  test("agg_moments matches Spark's built-in population skewness/kurtosis") {
    // the key computes moments from exact integer power sums precisely
    // BECAUSE the built-ins aren't oracle-safe — but numerically they
    // must agree with Spark's own population estimators
    val builtin = T.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(skewness(col("l_quantity")).as("sk"), kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val got = SparkEntry.queries("agg_moments")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5))).toMap
    got.foreach { case (flag, (sk, ku)) =>
      val (bsk, bku) = builtin(flag)
      assert(math.abs(sk - bsk) < 1e-3, s"$flag: skew $sk vs builtin $bsk")
      assert(math.abs(ku - bku) < 1e-3, s"$flag: kurtosis $ku vs builtin $bku")
    }
  }

  test("graph_assortativity equals a driver-side Pearson over the edge-degree stream") {
    val edges = T.orders(spark, sf)
      .select(pmod(col("o_custkey"), lit(1000L)).as("src"),
        pmod(col("o_orderkey"), lit(1000L)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")), greatest(col("src"), col("dst")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val pairs = edges.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m = pairs.length.toLong
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val expect = math.rint((m * sxy - sx * sy) /
      math.sqrt((m.toDouble * sxx - sx.toDouble * sx) * (m.toDouble * syy - sy.toDouble * sy)) * 1e4) / 1e4
    val row = SparkEntry.queries("graph_assortativity")(spark, sf).collect()(0)
    assert(row.getLong(0) == m, "directed pair count off")
    assert(math.abs(row.getDouble(1) - expect) < 2e-4,
      s"assortativity ${row.getDouble(1)} vs driver $expect")
  }

  test("text_js_divergence: all C(5,2) pairs present, bounded by ln 2, orientation-canonical") {
    val rows = SparkEntry.queries("text_js_divergence")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 10, s"expected C(5,2)=10 lang pairs, got ${rows.length}")
    rows.foreach { case (la, lb, nc, jsd) =>
      assert(la < lb, "pairs must be canonical la < lb")
      assert(nc > 0, s"$la/$lb share no vocabulary?")
      assert(jsd >= -1e-6 && jsd <= math.log(2) + 1e-6,
        s"$la/$lb: jsd $jsd outside [0, ln 2]")
    }
  }

  test("join_null_safe: the NULL bucket round-trips and every group matches its own count") {
    val rows = SparkEntry.queries("join_null_safe")(spark, sf)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    assert(rows.exists(_._1.isEmpty),
      "the seeded NULL segment must survive the null-safe join")
    rows.foreach { case (seg, nCust, segN) =>
      assert(nCust == segN,
        s"$seg: every customer must match exactly its own segment aggregate")
    }
    val nulls = T.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").count()
    assert(rows.find(_._1.isEmpty).get._2 == nulls,
      "NULL-bucket size must equal the seeded BUILDING count")
  }

  test("graph_clustering_coeff: consistent with wedge bound and the triangle family") {
    val row = SparkEntry.queries("graph_clustering_coeff")(spark, sf).collect()(0)
    val (w, t, cc) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(w > 0 && t >= 0)
    assert(3 * t <= w, "each triangle closes 3 wedges — 3T cannot exceed W")
    assert(cc >= 0 && cc <= 1, s"cc $cc out of range")
    assert(math.abs(cc - 3.0 * t / w) < 1e-5)
  }

  test("text_readability: syllable ratio in the plausible band, flesch finite") {
    val rows = SparkEntry.queries("text_readability")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 5)
    rows.foreach { case (lang, flesch, spw) =>
      assert(spw > 0.3 && spw < 4, s"$lang: syllables/word $spw implausible")
      assert(!flesch.isNaN && !flesch.isInfinite, s"$lang: flesch $flesch")
    }
  }

  test("stream_tws_list: buffers are id-descending, full iff the user saw ≥3 events") {
    val rows = SparkEntry.queries("stream_tws_list")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nSeen = r.getLong(1)
      val ids = Seq(2, 4, 6).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))
      val defined = ids.takeWhile(_.isDefined).flatten
      assert(defined.length == math.min(nSeen, 3L).toInt,
        s"user ${r.getLong(0)}: buffer size vs n_seen mismatch")
      assert(ids.drop(defined.length).forall(_.isEmpty), "non-contiguous buffer")
      assert(defined.zip(defined.tail).forall { case (a, b) => a > b },
        s"user ${r.getLong(0)}: buffer not id-descending")
    }
  }

  test("sample_neyman: allocations exhaust the budget modulo floor truncation") {
    val rows = SparkEntry.queries("sample_neyman")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.length == 5)
    val allocSum = rows.map(_._4).sum
    assert(allocSum <= 1000 && allocSum > 1000 - rows.length,
      s"floor-truncated allocations must sum within ${rows.length} of 1000, got $allocSum")
    val bpsSum = rows.map(_._5).sum
    assert(bpsSum <= 10000 && bpsSum > 10000 - rows.length)
    rows.foreach { case (lang, _, sigma, _, _) =>
      assert(sigma > 0, s"$lang: zero variance?")
    }
    // Neyman is UNCAPPED by declaration: at sf0.001 the 1000-label
    // budget exceeds the corpus, so a stratum may be allocated more
    // than it holds (real deployments cap-and-redistribute; the plan
    // reports the raw optimum)
  }

  test("sim_random_projection: JL distortion concentrates around 1") {
    // E[‖proj‖²/8] = ‖x‖² with ±1 signs; with 8 output dims the ratio's
    // sd is ~1/2 — per-label AVERAGES over hundreds of vectors must sit
    // tight around 1 even though single vectors spread
    val rows = SparkEntry.queries("sim_random_projection")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (label, n, avg) =>
      assert(avg > 0.7 && avg < 1.3,
        s"label $label: avg distortion $avg off the JL expectation (n=$n)")
    }
  }

  test("sim_ann_mips: the asymmetric augmentation is unit and order-preserving") {
    // the reduction's two mathematical claims, replayed driver-side on
    // the real corpus: (1) both transforms emit unit vectors (data side
    // by construction of the √(1−r²) coordinate, probe side by
    // normalization); (2) per probe, ranking candidates by
    // cos(q′, x′) IS ranking by raw dot(q, x) — the rank-monotonicity
    // that lets a cosine LSH bucket serve an inner-product query. The
    // oracle pins the emitted pairs; this pins WHY the device is valid.
    val vecs = T.embeddings(spark, sf)
      .select(col("vec_id"),
        graft.ops.VectorOps.toDouble(col("embedding")).as("v"))
      .limit(120).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val m = vecs.map { case (_, v) => math.sqrt(dot(v, v)) }.max
    def aug(v: Array[Double]) = {
      val n = math.sqrt(dot(v, v))
      v.map(_ / m) :+ math.sqrt(math.max(1.0 - (n / m) * (n / m), 0.0))
    }
    def unit0(v: Array[Double]) = {
      val n = math.sqrt(dot(v, v))
      v.map(_ / n) :+ 0.0
    }
    vecs.take(40).foreach { case (id, v) =>
      val na = math.sqrt(dot(aug(v), aug(v)))
      assert(math.abs(na - 1.0) < 1e-9, s"data aug of $id not unit: $na")
    }
    val (qid, q) = vecs.head
    val others = vecs.filter(_._1 != qid)
    // tolerance-aware (near-ties may flip under the two fp expression
    // trees): walking candidates in augmented-cosine order, the raw
    // inner products must be non-increasing, and each augmented score
    // must equal dot(q,x)/(M·‖q‖) — the identity, both to a tolerance
    // scaled by the reduction's denominator
    val mq = m * math.sqrt(dot(q, q))
    val byAug = others.sortBy { case (_, x) => -dot(unit0(q), aug(x)) }
    byAug.foreach { case (id, x) =>
      val lhs = dot(unit0(q), aug(x))
      val rhs = dot(q, x) / mq
      assert(math.abs(lhs - rhs) < 1e-9,
        s"candidate $id: augmented score $lhs != dot/(M·|q|) $rhs")
    }
    byAug.map { case (_, x) => dot(q, x) }.toList.sliding(2).foreach {
      case List(hi, lo) =>
        assert(hi >= lo - 1e-9 * mq,
          s"inner-product order violated along augmented order: $hi before $lo")
      case _ =>
    }
  }

  test("ts_holt_linear: the dyadic convolution equals the direct recursion") {
    // the inlined unit-impulse weights ARE the 10-step zero-init Holt
    // recursion — prove it on the real daily series: fold the
    // recurrence directly over each 10-day frame and compare to the
    // key's level/trend/fc7 at 4 dp
    val out = SparkEntry.queries("ts_holt_linear")(spark, sf).collect()
      .map(r => (r.get(0).toString, r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    val daily = T.orders(spark, sf)
      .groupBy(col("o_orderdate").as("d"))
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100)
        .cast("long").as("cents"))
      .orderBy("d").collect()
      .map(r => (r.get(0).toString, r.getLong(1)))
    val byDate = out.map(t => t._1 -> t).toMap
    daily.indices.drop(9).foreach { i =>
      var l = 0.0
      var b = 0.0
      ((i - 9) to i).foreach { t =>
        val x = daily(t)._2 / 100.0
        val nl = (x + l + b) / 2.0
        b = (nl - l + b) / 2.0
        l = nl
      }
      val (_, level, trend, fc7) = byDate(daily(i)._1)
      def r4(x: Double) = math.rint(x * 1e4) / 1e4
      assert(math.abs(r4(l) - level) <= 1e-4,
        s"day ${daily(i)._1}: recursion level ${r4(l)} vs key $level")
      assert(math.abs(r4(b) - trend) <= 1e-4,
        s"day ${daily(i)._1}: recursion trend ${r4(b)} vs key $trend")
      assert(math.abs(r4(l + 7 * b) - fc7) <= 2e-4,
        s"day ${daily(i)._1}: recursion fc7 ${r4(l + 7 * b)} vs key $fc7")
    }
  }
}
