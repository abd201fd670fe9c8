package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables => T}
import graft.ops.VectorOps

/** SURVEY.md §2B category I (similarity half) — embedding similarity
  * search: brute-force cosine top-k (baseline), LSH-bucketed ANN (scale
  * path), embedding near-dup pairs, and per-label norm stats.
  *
  * All vector math is zip_with/aggregate higher-order expressions over
  * `array<float>` widened to double — fully codegen'd, no UDFs. The
  * probe caps (`vec_id < …`) are part of the declared query semantics so
  * the O(probes × n) pair space stays bounded; at 100 TB the ANN variant
  * replaces the brute-force pair join with per-bucket blocks.
  */
object SimQueries extends QueryPack {

  private val DIM = 64
  private val PLANES = 8

  /** cosine near-dup floor — the mining threshold AND the sweep's lowest
    * band (the sweep can only read bands ≥ the mined floor). */
  private val CosFloor = 0.35

  /** the ≥ CosFloor cosine pair mining feeds BOTH dedup_embedding and
    * dedup_embedding_sweep, and one session runs both — memoized via
    * [[graft.SessionMemo]] exactly as the Jaccard mining feeds
    * dedup_jaccard_pairs / dedup_cluster_cc / dedup_threshold_sweep.
    * `mineCosPairs` stays exposed so PlanSpec pins the RAW blocked plan
    * (the memoized key plans as an InMemoryTableScan). */
  private def cosPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SessionMemo(s, s"cos-pairs:$d")(mineCosPairs(s, d))

  private[graft] def mineCosPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.ops.MetricBlocking.nearDupPairs(s, T.spread(T.embeddings(s, d)), CosFloor)

  // ---- IVF scaffolding (shared by sim_ann_ivf + sim_ann_recall_sweep)

  /** embeddings widened to double vectors. */
  private def embDouble(s: org.apache.spark.sql.SparkSession, d: String) =
    T.spread(T.embeddings(s, d))
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))

  /** ONE broadcastable row holding every IVF cell centroid
    * (c_label, c, ||c||²), k = max(32, ⌈√n⌉) hash-bucket means —
    * deterministic "k-means" both engines reproduce; k grows ~√n so
    * per-cell lists stay ~√n at any scale. Memoized: the IVF key and
    * the recall sweep both consume it. */
  private def ivfCents(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SessionMemo(s, s"ivf-cents:$d") {
      graft.GraftFunctions.register(s)
      val e = embDouble(s, d)
      val kdf = e.agg(greatest(lit(32L), ceil(sqrt(count(lit(1)))).cast("long")).as("k"))
      e.crossJoin(broadcast(kdf))
        .select(pmod(col("vec_id"), col("k")).as("bucket"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("bucket", "pos").agg(avg("x").as("av"))
        .groupBy("bucket")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("av")))),
          _.getField("av")).as("c"))
        .select(col("bucket").as("c_label"), col("c"),
          expr("graft_dot(c, c)").as("cc"))
        .agg(collect_list(struct(col("c_label"), col("c"), col("cc"))).as("cents"))
    }

  /** every vector's nearest-cell assignment (vec_id, unit vector u,
    * cell): the rounded-L2 argmin over the broadcast centroid row as an
    * inline array fold — the k-way expansion never becomes rows (the
    * round-2 fix). Eagerly localCheckpoint'd so the two join branches of
    * one consumer (and every later consumer — memoized) execute the
    * centroid pipeline exactly once. */
  private def ivfAssigned(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SessionMemo(s, s"ivf-assigned:$d") {
      graft.GraftFunctions.register(s)
      embDouble(s, d).crossJoin(broadcast(ivfCents(s, d)))
        .withColumn("vv", expr("graft_dot(v, v)"))
        .withColumn("best", array_min(transform(col("cents"), ct =>
          struct(
            round(col("vv") - lit(2.0)
                * graft.GraftFunctions.dotCol(s, col("v"), ct.getField("c"))
              + ct.getField("cc"), 6).as("d2"),
            ct.getField("c_label").as("c_label")))))
        .select(col("vec_id"), col("v"), VectorOps.unit(col("v")).as("u"),
          col("best.c_label").as("cell"))
        .localCheckpoint(true)
    }

  /** the trained coarse index — assignment AND codebook — once per
    * (session, sf): sim_ann_ivf_kmeans / sample_cluster_cap only need
    * memberships, but the IVF×PQ composition searches the probe's
    * nearest TRAINED cells, which takes the centroid table itself.
    * Same SessionMemo.pair pattern as the PQ training. */
  private def kmTrained(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SessionMemo.pair(s, s"ivf-km-trained:$d") {
      graft.ops.KMeans.trained(s, embDouble(s, d), KmK, KmIters)
    }

  /** trained-cell assignment for the k-means IVF variant: 2 Lloyd
    * rounds (ops/KMeans — cells already hash-matched by the sim_kmeans
    * oracle) with unit vectors. Rides [[kmTrained]], so a session
    * running any mix of the trained-cell consumers trains ONCE. */
  private def kmAssigned(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SessionMemo(s, s"ivf-km:$d") {
      kmTrained(s, d)._1
        .select(col("vec_id"), VectorOps.unit(col("v")).as("u"), col("cell"))
        .localCheckpoint(true)
    }

  /** the PQ index, trained once per (session, sf): 4 per-subspace
    * 16-centroid Lloyd codebooks. Returns (codes, codebooks): codes =
    * (vec_id, label, c0..c3, e0..e3) — per-vector subspace cells and
    * rounded squared distances; codebooks = (m, cell, c, cc). Shared
    * by sim_quantize_pq (compression audit) and sim_ann_pq_adc (the
    * ADC search) via the SessionMemo pair. */
  private def pqTrained(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SessionMemo.pair(s, s"pq-train:$d") {
      val e = T.spread(T.embeddings(s, d)).select(col("vec_id"), col("label"),
        VectorOps.toDouble(col("embedding")).as("v"))
      val ms = (0 until PqM).map { m =>
        val (asg, cent) = graft.ops.KMeans.trained(s,
          e.select(col("vec_id"), slice(col("v"), m * PqSub + 1, PqSub).as("v")),
          PqK, KmIters)
        (asg.select(col("vec_id"), col("cell").as(s"c$m"), col("d2").as(s"e$m")),
          cent.select(lit(m).as("m"), col("c_label").as("cell"),
            col("c"), col("cc")))
      }
      val codes = ms.map(_._1)
        .foldLeft(e.select("vec_id", "label"))(_.join(_, "vec_id"))
      (codes, ms.map(_._2).reduce(_ unionByName _))
    }

  /** (qid, m, cell, term) — the per-(probe, subspace, cell) ADC lookup
    * table over the trained PQ codebooks (term = ||c||² − 2·q_m·c), for
    * the capped probe set (vec_id < 100). nq × 4 × 16 rows: broadcast
    * size at any corpus scale. Shared by sim_ann_pq_adc (full-corpus
    * ADC scan) and sim_ann_ivf_pq (IVF-restricted scan). */
  private def adcLut(s: org.apache.spark.sql.SparkSession, d: String) = {
    graft.GraftFunctions.register(s)
    embDouble(s, d).filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"),
        posexplode(expr(s"transform(sequence(0, ${PqM - 1}), " +
          s"m -> slice(v, m * $PqSub + 1, $PqSub))")).as(Seq("m", "qm")))
      .join(broadcast(pqTrained(s, d)._2), Seq("m"))
      .select(col("qid"), col("m"), col("cell"),
        (col("cc") - lit(2.0) * graft.GraftFunctions.dotCol(s, col("qm"), col("c")))
          .as("term"))
  }

  /** the exact L2 top-3 per capped probe — the recall baseline BOTH PQ
    * search keys grade against (PQ approximates L2, so the baseline is
    * L2, not cosine). ||q−x||² ranks as −2·q·x + ||x||². */
  private def exactL2Top3(s: org.apache.spark.sql.SparkSession, d: String) = {
    graft.GraftFunctions.register(s)
    val e = embDouble(s, d)
    val all = e.select(col("vec_id").as("b"), col("v").as("vb"))
    val we = Window.partitionBy("a").orderBy(col("dist"), col("b"))
    e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("a"), col("v").as("va"))
      .join(all, col("a") =!= col("b"))
      .select(col("a"), col("b"),
        round(expr("graft_dot(vb, vb)")
          - lit(2.0) * expr("graft_dot(va, vb)"), 6).as("dist"))
      .withColumn("rk", row_number().over(we))
      .filter(col("rk") <= 3).select("a", "b")
  }

  val queries: Map[String, QueryFn] = Map(
    "sim_cosine_knn" -> ((s, d) => {
      // global top-20 most-similar pairs with a probe side capped at
      // vec_id < 200 (brute-force baseline; ordering on the ROUNDED sim
      // + (a,b) tie-break keeps the cutoff engine-deterministic).
      // Vectors are unit-normalized ONCE so each pair costs one dot.
      val e = T.spread(T.embeddings(s, d))
        .select(col("vec_id"), VectorOps.unit(VectorOps.toDouble(col("embedding"))).as("v"))
      val probes = e.filter(col("vec_id") < 200)
        .select(col("vec_id").as("a"), col("v").as("va"))
      val all = e.select(col("vec_id").as("b"), col("v").as("vb"))
      probes.join(all, col("a") < col("b"))
        .select(col("a"), col("b"),
          round(graft.GraftFunctions.dotCol(s, col("va"), col("vb")), 4).as("sim"))
        .orderBy(col("sim").desc, col("a"), col("b"))
        .limit(20)
    }),

    "sim_ann_lsh" -> ((s, d) => {
      // ANN via deterministic random-hyperplane LSH: candidates share an
      // 8-bit sign bucket (shuffle on bucket ≡ blocking), then exact
      // cosine re-rank, top-3 per probe.
      val e = T.spread(T.embeddings(s, d))
        .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("raw"))
        .withColumn("bucket", VectorOps.lshBucket(col("raw"), PLANES, DIM))
        .withColumn("v", VectorOps.unit(col("raw")))
      val probes = e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("a"), col("v").as("va"), col("bucket"))
      val cands = e.select(col("vec_id").as("b"), col("v").as("vb"), col("bucket"))
      val w = Window.partitionBy("a").orderBy(col("sim").desc, col("b"))
      probes.join(cands, Seq("bucket"))
        .filter(col("a") =!= col("b"))
        .select(col("a"), col("b"),
          round(graft.GraftFunctions.dotCol(s, col("va"), col("vb")), 4).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("a", "rank", "b", "sim")
        .orderBy("a", "rank")
    }),

    "sim_ann_mips" -> ((s, d) => {
      // max-inner-product search via the public asymmetric reduction
      // (Neyshabur & Srebro 2015 / Bachrach et al. 2014): raw dot is
      // NOT locality-sensitive (unbounded in ||x||), but scale the
      // corpus by its max norm M and augment each DATA vector with
      // sqrt(1 − ||x||²/M²) — and each PROBE with 0 after unit-
      // normalizing it — and every augmented vector is unit with
      // dot(q′,x′) = dot(q,x)/(M·||q||): rank-monotone per probe in
      // the raw inner product. Sign-bucket LSH on the AUGMENTED space
      // therefore blocks by inner product; candidates share a bucket,
      // exact raw-dot re-rank, top-3 per probe (the sim_ann_lsh
      // search tail). The asymmetry (different probe/data transforms
      // through the same planes) is the whole trick — this is the
      // recommender/rescoring shape where magnitude carries signal
      // and cosine ANN returns the wrong neighbors. 100 TB shape: M
      // is one broadcast scalar, both transforms are map-side
      // projections, the bucket equi-join shuffle-partitions the
      // corpus, and the literal rank ≤ 3 compiles to
      // WindowGroupLimit — no all-pairs anywhere.
      val e = T.spread(T.embeddings(s, d))
        .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("raw"))
        .withColumn("n", VectorOps.norm(col("raw")))
      val m = e.agg(max(col("n")).as("m"))
      val em = e.crossJoin(broadcast(m))
      val r = col("n") / col("m")
      val dataAug = concat(transform(col("raw"), _ / col("m")),
        array(sqrt(greatest(lit(1.0) - r * r, lit(0.0)))))
      val probeAug = concat(transform(col("raw"), _ / col("n")),
        array(lit(0.0)))
      val cands = em.select(col("vec_id").as("b"), col("raw").as("vb"),
        VectorOps.lshBucket(dataAug, PLANES, DIM + 1).as("bucket"))
      // the probe transform only needs the per-vector norm, not M —
      // derive probes from e so the plan carries ONE max-norm
      // aggregate subtree (under the data side), not two
      val probes = e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("a"), col("raw").as("va"),
          VectorOps.lshBucket(probeAug, PLANES, DIM + 1).as("bucket"))
      val w = Window.partitionBy("a").orderBy(col("ip").desc, col("b"))
      probes.join(cands, Seq("bucket"))
        .filter(col("a") =!= col("b"))
        .select(col("a"), col("b"),
          round(graft.GraftFunctions.dotCol(s, col("va"), col("vb")), 4).as("ip"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("a", "rank", "b", "ip")
        .orderBy("a", "rank")
    }),

    "dedup_embedding" -> ((s, d) => {
      // embedding-cosine near-dup pairs (threshold tuned to the corpus).
      // Exact result through the triangle-inequality cell blocking —
      // recall 1.0 by construction, no all-pairs cross join (see
      // ops/MetricBlocking.scala; oracle stays the brute-force SQL).
      // Mining memoized (cosPairs) so the sweep key reads the same
      // persisted pair table instead of re-running the blocked join.
      cosPairs(s, d).orderBy("a", "b")
    }),

    "dedup_embedding_sweep" -> ((s, d) => {
      // the cosine-threshold tuning curve (r8 verdict #3) — the
      // embedding-side twin of dedup_threshold_sweep: for each candidate
      // cutoff ≥ the mined floor, how many pairs and distinct documents
      // a sim ≥ t dedup would touch. Rides the memoized CosFloor pair
      // mining (no second blocking pass in the plan); the 5-row
      // threshold table broadcasts, pair rows expand ≤5× + 2× (bounded —
      // pairs are few by construction), and thresholds compare the 4-dp
      // ROUNDED sim so both engines select identical pair sets.
      val th = s.range(1).select(explode(array(
        lit(0.35), lit(0.5), lit(0.65), lit(0.8), lit(0.9))).as("t"))
      val sel = cosPairs(s, d).crossJoin(broadcast(th))
        .filter(col("sim") >= col("t"))
      val pr = sel.groupBy("t").agg(count(lit(1)).as("n_pairs"))
      val dd = sel.select(col("t"), explode(array(col("a"), col("b"))).as("vec"))
        .groupBy("t").agg(countDistinct("vec").as("n_vecs"))
      th.join(pr, Seq("t"), "left").join(dd, Seq("t"), "left")
        .select(col("t"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
        .orderBy("t")
    }),

    "sim_similarity_join" -> ((s, d) => {
      // two-table similarity join — the contamination-check shape: a
      // probe corpus (vec_id < 300) screened against a reference corpus
      // (the rest) for cosine ≥ 0.35. Exact via the same triangle-
      // inequality blocking as dedup_embedding, generalized to one
      // anchor set with per-side radii (ops/MetricBlocking.scala
      // similarityJoin); oracle stays brute-force SQL.
      val e = T.spread(T.embeddings(s, d))
      graft.ops.MetricBlocking.similarityJoin(s,
        e.filter(col("vec_id") < 300), e.filter(col("vec_id") >= 300), 0.35)
        .orderBy("a", "b")
    }),

    "sim_ann_ivf" -> ((s, d) => {
      // IVF-style ANN: coarse quantization to the nearest hash-bucket
      // centroid — the scaffolding (k = max(32, ⌈√n⌉) cells, ONE
      // broadcast centroid row, inline rounded-L2 argmin assignment)
      // now lives in ivfCents/ivfAssigned, shared with the recall
      // sweep — then inverted-list search within the assigned cell,
      // exact cosine re-rank, top-3 per probe.
      graft.GraftFunctions.register(s)
      val assigned = ivfAssigned(s, d)
      val probes = assigned.filter(col("vec_id") < 100)
        .select(col("vec_id").as("a"), col("u").as("ua"), col("cell"))
      val cands = assigned
        .select(col("vec_id").as("b"), col("u").as("ub"), col("cell"))
      val w = Window.partitionBy("a").orderBy(col("sim").desc, col("b"))
      probes.join(cands, Seq("cell"))
        .filter(col("a") =!= col("b"))
        .select(col("a"), col("b"),
          round(expr("graft_dot(ua, ub)"), 4).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("a", "rank", "b", "sim")
        .orderBy("a", "rank")
    }),

    "sim_ann_recall_sweep" -> ((s, d) => {
      // the ANN tuning curve (the sweep family, similarity side): for
      // nprobe ∈ {1, 2, 4} nearest cells searched per probe, recall@3
      // against the exact top-3 plus the candidate-scan cost — the
      // cost/recall table an ANN deployment reads to pick nprobe.
      // Deterministic end to end: cell ranks break ties on (rounded
      // d2, label), top-3 sets on (rounded sim desc, b); recall is the
      // only double — a 4-dp round of two exact counts. The probe cap
      // (vec_id < 100) is the declared bound on the exact baseline and
      // the pools; candidates ride the memoized ivfAssigned, and the
      // windows run over probe-capped pools, never the corpus.
      graft.GraftFunctions.register(s)
      val assigned = ivfAssigned(s, d)
      // per-probe 4 nearest cells: the same broadcast-row fold as the
      // argmin, array-sorted and sliced — the k-way expansion never
      // becomes rows; only the top-4 slice explodes (arn = cell rank)
      val pcells = embDouble(s, d).filter(col("vec_id") < 100)
        .crossJoin(broadcast(ivfCents(s, d)))
        .withColumn("vv", expr("graft_dot(v, v)"))
        .withColumn("top4", slice(array_sort(transform(col("cents"), ct =>
          struct(
            round(col("vv") - lit(2.0)
                * graft.GraftFunctions.dotCol(s, col("v"), ct.getField("c"))
              + ct.getField("cc"), 6).as("d2"),
            ct.getField("c_label").as("c_label")))), 1, 4))
        .select(col("vec_id").as("a"), VectorOps.unit(col("v")).as("ua"),
          posexplode(col("top4")).as(Seq("r0", "pc")))
        .select(col("a"), col("ua"), (col("r0") + 1).cast("long").as("arn"),
          col("pc.c_label").as("cell"))
      val pool = pcells
        .join(assigned.select(col("vec_id").as("b"), col("u").as("ub"),
          col("cell")), Seq("cell"))
        .filter(col("a") =!= col("b"))
        .select(col("a"), col("b"),
          round(expr("graft_dot(ua, ub)"), 4).as("sim"), col("arn"))
      val np = s.range(1).select(explode(array(
        lit(1L), lit(2L), lit(4L))).as("nprobe"))
      val expanded = pool.crossJoin(broadcast(np))
        .filter(col("arn") <= col("nprobe"))
      val wi = Window.partitionBy("nprobe", "a").orderBy(col("sim").desc, col("b"))
      val ivf3 = expanded.withColumn("rk", row_number().over(wi))
        .filter(col("rk") <= 3).select("nprobe", "a", "b")
      // exact top-3 — the brute-force baseline the recall grades against
      val probes = assigned.filter(col("vec_id") < 100)
        .select(col("vec_id").as("a"), col("u").as("ua"))
      val all = assigned.select(col("vec_id").as("b"), col("u").as("ub"))
      val we = Window.partitionBy("a").orderBy(col("sim").desc, col("b"))
      // broadcast the ≤100-row probe side: a bare ≠-join over two
      // stat-less memoized frames plans a CartesianProductExec
      // (left×right partition tasks); with the bounded side broadcast
      // it streams the corpus once as BroadcastNestedLoopJoin.
      val ex3 = broadcast(probes).join(all, col("a") =!= col("b"))
        .select(col("a"), col("b"),
          round(expr("graft_dot(ua, ub)"), 4).as("sim"))
        .withColumn("rk", row_number().over(we))
        .filter(col("rk") <= 3).select("a", "b")
      val nex = ex3.agg(count(lit(1)).as("n_exact"))
      val hits = ivf3.join(ex3, Seq("a", "b"))
        .groupBy("nprobe").agg(count(lit(1)).as("n_hits"))
      val cands = expanded.groupBy("nprobe").agg(count(lit(1)).as("n_cands"))
      np.join(hits, Seq("nprobe"), "left").join(cands, Seq("nprobe"), "left")
        .crossJoin(broadcast(nex))
        .select(col("nprobe"), col("n_exact"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          coalesce(col("n_cands"), lit(0L)).as("n_cands"),
          round(coalesce(col("n_hits"), lit(0L)) / col("n_exact"), 4).as("recall"))
        .orderBy("nprobe")
    }),

    "sim_ann_ivf_kmeans" -> ((s, d) => {
      // IVF with TRAINED coarse cells: the identical inverted-list
      // search as sim_ann_ivf, but cells come from 2 Lloyd rounds
      // (ops/KMeans, k=16) instead of hash buckets — the index-quality
      // knob sim_ann_recall_sweep shows hash-bucket cells lack (trained
      // cells put neighbors together, so the same single-cell probe
      // recovers far more of the exact top-3 — measured in
      // SemanticsSpec). The Lloyd cell sets already hash-match DuckDB
      // (sim_kmeans), so the search tail rides the proven contract.
      graft.GraftFunctions.register(s)
      val assigned = kmAssigned(s, d)
      val probes = assigned.filter(col("vec_id") < 100)
        .select(col("vec_id").as("a"), col("u").as("ua"), col("cell"))
      val cands = assigned
        .select(col("vec_id").as("b"), col("u").as("ub"), col("cell"))
      val w = Window.partitionBy("a").orderBy(col("sim").desc, col("b"))
      probes.join(cands, Seq("cell"))
        .filter(col("a") =!= col("b"))
        .select(col("a"), col("b"),
          round(expr("graft_dot(ua, ub)"), 4).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("a", "rank", "b", "sim")
        .orderBy("a", "rank")
    }),

    "sample_cluster_cap" -> ((s, d) => {
      // cluster-balanced (semantic-diversity) sampling — the
      // embedding-space twin of sample_domain_cap: cap each LEARNED
      // cluster (the memoized 2-Lloyd-round cells) at 50 vectors chosen
      // by portable md5 order, so no semantic mode dominates the
      // mixture; per-cell kept/total accounting. Same scale shape as
      // the domain cap: the rank ≤ K filter compiles to
      // WindowGroupLimit (K rows per map task, pinned there), the
      // md5-order survivor set is rerun-stable and engine-independent.
      val K = 50
      val cells = kmAssigned(s, d).select(col("vec_id"), col("cell"))
      val w = Window.partitionBy("cell")
        .orderBy(graft.ops.TextOps.md5Long(col("vec_id").cast("string")),
          col("vec_id"))
      val kept = cells.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= K)
        .groupBy("cell").agg(count(lit(1)).as("n_kept"))
      cells.groupBy("cell").agg(count(lit(1)).as("n_docs"))
        .join(kept, Seq("cell"), "left")
        .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
        .orderBy("cell")
    }),

    "sim_kmeans" -> ((s, d) => {
      // embedding k-means (Lloyd): the clustering step behind
      // cluster-balanced sampling and mixture analysis — k=16 cells,
      // hash-bucket init, 2 Lloyd rounds through graft.ops.KMeans (the
      // IVF machinery iterated: broadcast-row centroids, inline rounded
      // argmin). Emits the cluster profile (size + inertia); the oracle
      // unrolls the identical rounds as a generated CTE chain from the
      // same (k, iters) constants.
      // rides the memoized trained index (kmTrained) — one Lloyd
      // training per (session, sf) across every trained-cell consumer
      kmTrained(s, d)._1
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), round(sum("d2"), 2).as("inertia"))
        .orderBy("cell")
    }),

    "sim_quantize_pq" -> ((s, d) => {
      // product quantization — the OTHER vector-store compression
      // axis: where sim_quantize_int8 narrows every coordinate (4×),
      // PQ replaces whole subvectors with trained codebook ids
      // (64 floats → 4 one-byte codes, 64×). The 64-dim space splits
      // into 4 independent 16-dim subspaces; each trains its own
      // 16-centroid codebook through the SAME deterministic Lloyd
      // operator the IVF index uses (hash init, rounded argmin), so
      // the per-vector squared reconstruction error is EXACTLY the sum
      // of the four assigned d2s — no vector reassembly pass. Reported
      // per label: avg reconstruction MSE (the compression-quality
      // number a deployment reads next to int8's) and distinct-code
      // utilization (how much of the 16⁴ code space the corpus
      // occupies). Scale shape: 4 independent Lloyd trainings (each a
      // broadcast-assign + per-(cell,dim) partial aggregate per round)
      // and one 4-way equi-join on vec_id — trained ONCE per (session,
      // sf) via the pair memo; sim_ann_pq_adc searches the same index.
      pqTrained(s, d)._1
        .withColumn("code",
          ((col("c0") * 16 + col("c1")) * 16 + col("c2")) * 16 + col("c3"))
        .withColumn("mse",
          (col("e0") + col("e1") + col("e2") + col("e3")) / lit(DIM.toDouble))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg("mse"), 8).as("avg_mse"),
          countDistinct("code").as("n_codes"))
        .orderBy("label")
    }),

    "sim_ann_pq_adc" -> ((s, d) => {
      // the search side of the PQ index: asymmetric distance
      // computation. A probe's L2 distance to a compressed vector is
      // approximated from its codes alone — per subspace, the term
      // ||c||² − 2·q_m·c is PRECOMPUTED per (probe, subspace, cell)
      // into a lookup table of nq × 4 × 16 rows, so scoring a
      // candidate is FOUR table lookups + a sum, never a 64-dim float
      // dot. That table-lookup structure is the whole point of PQ at
      // 100 TB: the index holds 4 bytes/vector and the scan does no
      // vector math. Graded like sim_ann_recall_sweep: recall@3 of the
      // ADC top-3 against the exact L2 top-3 (PQ approximates L2, so
      // the baseline is L2, not cosine). Deterministic: codes ride the
      // hash-matched Lloyd contract, ADC sums are identical rounded
      // operands in a fixed order, ranks tie-break on (rounded dist,
      // id). The probe cap (vec_id < 100) bounds the exact baseline;
      // the candidate side is lookup-joins, broadcast LUT.
      graft.GraftFunctions.register(s)
      val codes = pqTrained(s, d)._1
      // four lookup joins in FIXED order (never a groupBy-sum of the
      // terms: a 4-double sum's fold order is partition-dependent, and
      // an ulp flip under the 6-dp round would reorder ranks) — the
      // first join fans each candidate out to its matching probes, the
      // rest attach one term each on (qid, c_m). LUT + exact baseline
      // are factored (adcLut/exactL2Top3), shared with sim_ann_ivf_pq.
      val lut = adcLut(s, d)
      val luts = (0 until PqM).map(m => lut.filter(col("m") === m)
        .select(col("qid").as(s"qid$m"), col("cell").as(s"lc$m"),
          col("term").as(s"t$m")))
      val adc = (1 until PqM).foldLeft(
          codes.select(col("vec_id").as("b"), col("c0"), col("c1"), col("c2"), col("c3"))
            .join(broadcast(luts(0)), col("c0") === col("lc0"))) {
          (acc, m) => acc.join(broadcast(luts(m)),
            col("qid0") === col(s"qid$m") && col(s"c$m") === col(s"lc$m"))
        }
        .filter(col("b") =!= col("qid0"))
        .select(col("qid0").as("qid"), col("b"),
          round(col("t0") + col("t1") + col("t2") + col("t3"), 6).as("adist"))
      val wa = Window.partitionBy("qid").orderBy(col("adist"), col("b"))
      val pq3 = adc.withColumn("rk", row_number().over(wa))
        .filter(col("rk") <= 3).select(col("qid").as("a"), col("b"))
      val ex3 = exactL2Top3(s, d)
      val nex = ex3.agg(count(lit(1)).as("n_exact"))
      val hits = pq3.join(ex3, Seq("a", "b")).agg(count(lit(1)).as("n_hits"))
      nex.crossJoin(hits)
        .select(col("n_exact"), col("n_hits"),
          round(col("n_hits") / col("n_exact"), 4).as("recall"))
    }),

    "sim_ann_ivf_pq" -> ((s, d) => {
      // IVF×PQ — the composed FAISS-shaped deployment (r10/r11 verdict
      // ask): the trained coarse index bounds WHAT gets scanned
      // (nprobe nearest TRAINED cells per probe — consuming the
      // kmTrained codebook, `._2`, built for exactly this) and the PQ
      // codes bound WHAT a scan costs (4 broadcast table lookups +
      // a sum per candidate, never a 64-dim dot). At 100 TB this is
      // the shape that works: the candidate list shrinks by
      // nprobe/k ≈ 4/16 and each candidate costs 4 bytes of reads;
      // both factor tables (centroid row, ADC LUT) broadcast.
      // Graded like its parents: recall@3 of the IVF-restricted ADC
      // top-3 vs the exact L2 top-3, plus the candidate count the IVF
      // pruning actually admitted — together the cost/quality pair a
      // deployment tunes nprobe against. Deterministic end to end:
      // cell top-nprobe ranks on (6-dp-rounded d2, c_label), ADC sums
      // fixed-order, final ranks on (rounded adist, b).
      graft.GraftFunctions.register(s)
      val NProbe = 4
      val centRow = kmTrained(s, d)._2
        .agg(collect_list(struct(col("c_label"), col("c"), col("cc"))).as("cents"))
      // per-probe nprobe nearest trained cells: broadcast-row fold,
      // array-sorted, sliced — the k-way expansion never becomes rows
      val pcells = embDouble(s, d).filter(col("vec_id") < 100)
        .crossJoin(broadcast(centRow))
        .withColumn("vv", expr("graft_dot(v, v)"))
        .withColumn("top", slice(array_sort(transform(col("cents"), ct =>
          struct(
            round(col("vv") - lit(2.0)
                * graft.GraftFunctions.dotCol(s, col("v"), ct.getField("c"))
              + ct.getField("cc"), 6).as("d2"),
            ct.getField("c_label").as("c_label")))), 1, NProbe))
        .select(col("vec_id").as("qid"),
          explode(transform(col("top"), _.getField("c_label"))).as("cell"))
      // candidates = members of the probed cells (each vector lives in
      // exactly one cell, so (qid, b) pairs are already distinct)
      val cand = pcells
        .join(kmAssigned(s, d).select(col("vec_id").as("b"), col("cell")),
          Seq("cell"))
        .filter(col("b") =!= col("qid"))
        .select("qid", "b")
      val codes = pqTrained(s, d)._1
        .select(col("vec_id").as("b"), col("c0"), col("c1"), col("c2"), col("c3"))
      val lut = adcLut(s, d)
      val luts = (0 until PqM).map(m => lut.filter(col("m") === m)
        .select(col("qid").as(s"qid$m"), col("cell").as(s"lc$m"),
          col("term").as(s"t$m")))
      val adc = (0 until PqM).foldLeft(cand.join(codes, Seq("b"))) {
          (acc, m) => acc.join(broadcast(luts(m)),
            col("qid") === col(s"qid$m") && col(s"c$m") === col(s"lc$m"))
        }
        .select(col("qid"), col("b"),
          round(col("t0") + col("t1") + col("t2") + col("t3"), 6).as("adist"))
      val wa = Window.partitionBy("qid").orderBy(col("adist"), col("b"))
      val pq3 = adc.withColumn("rk", row_number().over(wa))
        .filter(col("rk") <= 3).select(col("qid").as("a"), col("b"))
      val ex3 = exactL2Top3(s, d)
      val nex = ex3.agg(count(lit(1)).as("n_exact"))
      val hits = pq3.join(ex3, Seq("a", "b")).agg(count(lit(1)).as("n_hits"))
      val nc = cand.agg(count(lit(1)).as("n_cands"))
      nc.crossJoin(nex).crossJoin(hits)
        .select(lit(NProbe.toLong).as("nprobe"), col("n_cands"),
          col("n_exact"), col("n_hits"),
          round(col("n_hits") / col("n_exact"), 4).as("recall"))
    }),

    "sim_quantize_int8" -> ((s, d) => {
      // scalar int8 quantization audit — the vector-store compression
      // step (4× smaller index) and its reconstruction-error report.
      // Per-dim min/max are EXACT aggregates (no summation → identical
      // doubles on both engines), collected into ONE broadcast bounds
      // row; encode/decode/error are then per-row zip_with folds — a
      // map-side pass at any corpus size, no shuffle beyond the bounds
      // aggregate and the per-label report. q = round((x−mn)·255/rng)
      // is integer-exact parity; only the across-row MSE average sees
      // fold-order noise, absorbed by the 8-dp round.
      val e = T.spread(T.embeddings(s, d))
        .select(col("vec_id"), col("label"), VectorOps.toDouble(col("embedding")).as("v"))
      val bounds = e
        .select(posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
            _.getField("mn")).as("mn"),
          transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
            _.getField("mx")).as("mx"))
      val withB = e.crossJoin(broadcast(bounds))
        .withColumn("rng", zip_with(col("mx"), col("mn"), (a, b) => a - b))
        .withColumn("q", zip_with(
          zip_with(col("v"), col("mn"), (x, m) => x - m), col("rng"),
          (ctr, r) => when(r === 0.0, 0.0).otherwise(round(ctr * 255.0 / r))))
        .withColumn("xr", zip_with(
          zip_with(col("q"), col("rng"), (qi, r) => qi / 255.0 * r), col("mn"),
          (sc, m) => sc + m))
        .withColumn("diffs", zip_with(col("v"), col("xr"), (a, b) => a - b))
        .withColumn("mse", aggregate(col("diffs"), lit(0.0),
          (acc, dd) => acc + dd * dd) / size(col("v")))
        .withColumn("maxerr", array_max(transform(col("diffs"), dd => abs(dd))))
      withB.groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg("mse"), 8).as("avg_mse"),
          round(max("maxerr"), 6).as("max_abs_err"))
        .orderBy("label")
    }),

    "sim_embedding_norms" -> ((s, d) => {
      T.spread(T.embeddings(s, d))
        .select(col("label"), VectorOps.norm(VectorOps.toDouble(col("embedding"))).as("nrm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), round(avg("nrm"), 4).as("avg_norm"))
        .orderBy("label")
    }),

    "sim_ann_persisted" -> ((s, d) => {
      // persist-and-serve (r13 verdict #4): the missing DEPLOYMENT
      // shape. sim_ann_ivf_pq trains per session (memoized); a 100 TB
      // deployment trains ONCE, writes the index as tables — coarse
      // centroids, cell memberships, PQ codes, PQ codebooks — and every
      // serving session LOADS those tables and answers probes against
      // them, never retraining. This key IS that split: a build stage
      // that writes the four index tables to a stable parquet root
      // (skipped when the provenance stamp already matches — across
      // SESSIONS, not just within one), then a serve stage whose plan
      // reads ONLY the loaded tables plus the query-time probe vectors.
      // Serving output is the per-probe top-3 (a, rank, b, adist) —
      // the ANN answer surface, not a recall audit. Deterministic end
      // to end (hash-matched Lloyd + fixed-order ADC sums), so the
      // DuckDB oracle replays the same training arithmetic from the
      // embeddings table and must land on identical rows — proving the
      // roundtrip through parquet changed nothing. Bench billing: the
      // first run on a fresh machine pays the build; later runs (and
      // later SESSIONS — the point) serve warm off the stamp check.
      graft.GraftFunctions.register(s)
      val root = annIndexRoot(d)
      buildAnnIndexIfAbsent(s, d, root)
      val centRow = s.read.parquet(s"$root/centroids.parquet")
        .agg(collect_list(struct(col("c_label"), col("c"), col("cc"))).as("cents"))
      val members = s.read.parquet(s"$root/members.parquet")
      val codes = s.read.parquet(s"$root/codes.parquet")
      val cbs = s.read.parquet(s"$root/codebooks.parquet")
      val NProbe = 4
      val probes = embDouble(s, d).filter(col("vec_id") < 100)
      val pcells = probes.crossJoin(broadcast(centRow))
        .withColumn("vv", expr("graft_dot(v, v)"))
        .withColumn("top", slice(array_sort(transform(col("cents"), ct =>
          struct(
            round(col("vv") - lit(2.0)
                * graft.GraftFunctions.dotCol(s, col("v"), ct.getField("c"))
              + ct.getField("cc"), 6).as("d2"),
            ct.getField("c_label").as("c_label")))), 1, NProbe))
        .select(col("vec_id").as("qid"),
          explode(transform(col("top"), _.getField("c_label"))).as("cell"))
      val cand = pcells
        .join(members.select(col("vec_id").as("b"), col("cell")), Seq("cell"))
        .filter(col("b") =!= col("qid"))
        .select("qid", "b")
      val lut = probes
        .select(col("vec_id").as("qid"),
          posexplode(expr(s"transform(sequence(0, ${PqM - 1}), " +
            s"m -> slice(v, m * $PqSub + 1, $PqSub))")).as(Seq("m", "qm")))
        .join(broadcast(cbs), Seq("m"))
        .select(col("qid"), col("m"), col("cell"),
          (col("cc") - lit(2.0) * graft.GraftFunctions.dotCol(s, col("qm"), col("c")))
            .as("term"))
      val luts = (0 until PqM).map(m => lut.filter(col("m") === m)
        .select(col("qid").as(s"qid$m"), col("cell").as(s"lc$m"),
          col("term").as(s"t$m")))
      val adc = (0 until PqM).foldLeft(cand.join(
          codes.select(col("vec_id").as("b"), col("c0"), col("c1"),
            col("c2"), col("c3")), Seq("b"))) {
          (acc, m) => acc.join(broadcast(luts(m)),
            col("qid") === col(s"qid$m") && col(s"c$m") === col(s"lc$m"))
        }
        .select(col("qid"), col("b"),
          round(col("t0") + col("t1") + col("t2") + col("t3"), 6).as("adist"))
      val wa = Window.partitionBy("qid").orderBy(col("adist"), col("b"))
      adc.withColumn("rank", row_number().over(wa))
        .filter(col("rank") <= 3)
        .select(col("qid").as("a"), col("rank"), col("b"), col("adist"))
        .orderBy("a", "rank")
    })
  )

  /** stable per-SF index root — survives the JVM (deliberately NOT
    * graft.Tmp scratch: cross-session reuse is the semantics under
    * test). Overridable for test isolation. */
  private def annIndexRoot(d: String): String = {
    val base = sys.env.getOrElse("GRAFT_ANN_INDEX_ROOT", "/tmp/graft_ann_index")
    s"$base/${java.nio.file.Paths.get(d).getFileName}"
  }

  /** provenance stamp: base dir, corpus size, a content fingerprint
    * (micro-unit sum of first components — catches a regenerated
    * corpus with the same count), and the training constants. A marker
    * mismatch rebuilds; a match means the persisted index IS this
    * corpus's trained index and serving may skip training entirely. */
  private def buildAnnIndexIfAbsent(s: org.apache.spark.sql.SparkSession,
      d: String, root: String): Unit = {
    val fp = T.spread(T.embeddings(s, d))
      .agg(count(lit(1)).as("n"),
        sum(round(element_at(col("embedding"), 1).cast("double") * 1e6))
          .cast("long").as("chk"))
      .head()
    val stamp = s"$d n=${fp.getLong(0)} chk=${fp.getLong(1)} " +
      s"km=$KmK/$KmIters pq=$PqM/$PqK"
    // IndexStore: build-into-temp + atomic rename, so a concurrent
    // session racing the same stale stamp can never interleave writes
    // under a root that later sessions trust (r14 ADVICE)
    graft.ops.IndexStore.publishIfAbsent(root, stamp) { tmp =>
      kmTrained(s, d)._2.write.mode("overwrite").parquet(s"$tmp/centroids.parquet")
      kmAssigned(s, d).select("vec_id", "cell")
        .write.mode("overwrite").parquet(s"$tmp/members.parquet")
      val (pqCodes, pqCbs) = pqTrained(s, d)
      pqCodes.select("vec_id", "c0", "c1", "c2", "c3")
        .write.mode("overwrite").parquet(s"$tmp/codes.parquet")
      pqCbs.write.mode("overwrite").parquet(s"$tmp/codebooks.parquet")
    }
  }

  /** DuckDB: embedding widened to DOUBLE[] (shared fragment). */
  private val vd = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

  /** k-means constants shared by the query and the generated oracle. */
  private val KmK = 16
  private val KmIters = 2

  /** product-quantization constants: M subspaces × Sub dims, K codes. */
  private val PqM = 4
  private val PqSub = DIM / PqM
  private val PqK = 16

  /** ops/KMeans unrolled as a CTE chain generated from the shared
    * constants (the agg_spatial_octree / graph_pagerank pattern);
    * yields CTEs up to `a$iters(vec_id, v, cell, d2)` — shared by the
    * sim_kmeans oracle and the trained-IVF search oracle. */
  /** Lloyd rounds as CTE text over an arbitrary (vec_id, v) source CTE,
    * all names `$p`-prefixed so several independent trainings (the PQ
    * subspaces) coexist in one WITH clause. */
  // `MATERIALIZED` on every reused CTE: DuckDB inlines CTEs by default,
  // so each downstream reference re-executes the whole Lloyd chain —
  // at sf1 (20k vectors) the composed IVF×PQ oracle's 4 `lut` joins ×
  // 4 subspace chains ballooned past 100 GB before OOM. Materialized,
  // each chain runs once and every table is ≤20k rows (≈10 MB).
  private def kmeansRounds(p: String, src: String, k: Int, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""${p}ex$i AS (SELECT cell, unnest(v) AS x, generate_subscripts(v, 1) AS pos
         |          FROM ${p}a${i - 1}),
         |${p}cent$i AS MATERIALIZED (
         |  SELECT cell AS c_label, list(av ORDER BY pos) AS c
         |  FROM (SELECT cell, pos, AVG(x) AS av FROM ${p}ex$i GROUP BY cell, pos)
         |  GROUP BY cell),
         |${p}d$i AS (
         |  SELECT e.vec_id, e.v, c.c_label,
         |         ROUND(list_dot_product(e.v, e.v) - 2.0 * list_dot_product(e.v, c.c)
         |               + list_dot_product(c.c, c.c), 6) AS d2
         |  FROM $src e CROSS JOIN ${p}cent$i c),
         |${p}a$i AS MATERIALIZED (
         |  SELECT vec_id, v, c_label AS cell, d2 FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
         |    FROM ${p}d$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""${p}a0 AS MATERIALIZED (SELECT vec_id, v, vec_id % $k AS cell FROM $src),
       |$rounds""".stripMargin
  }

  private def kmeansCte(k: Int, iters: Int): String =
    s"""e AS MATERIALIZED (SELECT vec_id, $vd AS v FROM embeddings),
       |${kmeansRounds("", "e", k, iters)}""".stripMargin

  private def kmeansSql(k: Int, iters: Int): String =
    s"""WITH ${kmeansCte(k, iters)}
       |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(d2), 2) AS inertia
       |FROM a$iters GROUP BY cell ORDER BY cell""".stripMargin

  private def annSql: String = {
    val buckets = (0 until PLANES).map { j =>
      val coefs = VectorOps.lshCoefs(j, DIM).map(c => s"$c.0").mkString("[", ", ", "]")
      s"CASE WHEN list_dot_product(v, $coefs) > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, $vd AS v FROM embeddings),
       |eb AS (SELECT vec_id, v, CAST($buckets AS INT) AS bucket FROM e),
       |pairs AS (
       |  SELECT p.vec_id AS a, c.vec_id AS b,
       |         ROUND(list_cosine_similarity(p.v, c.v), 4) AS sim
       |  FROM eb p JOIN eb c ON p.bucket = c.bucket AND p.vec_id <> c.vec_id
       |  WHERE p.vec_id < 100),
       |ranked AS (
       |  SELECT a, b, sim,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b) AS INT) AS rank
       |  FROM pairs)
       |SELECT a, rank, b, sim FROM ranked WHERE rank <= 3 ORDER BY a, rank""".stripMargin
  }

  /** sim_ann_mips oracle: the asymmetric MIPS transforms spelled with
    * the exact IEEE trees the Spark side builds (divide components,
    * then append the augmented coordinate; GREATEST clamps the
    * max-norm vector's 1 − r·r at 0), then the annSql search tail with
    * the probe bucket computed from the probe transform and the data
    * bucket from the data transform — the asymmetry, in SQL.
    */
  private def mipsSql: String = {
    def bucketExpr(v: String): String = (0 until PLANES).map { j =>
      val coefs = VectorOps.lshCoefs(j, DIM + 1).map(c => s"$c.0")
        .mkString("[", ", ", "]")
      s"CASE WHEN list_dot_product($v, $coefs) > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, $vd AS v FROM embeddings),
       |en AS (SELECT vec_id, v, SQRT(list_dot_product(v, v)) AS n FROM e),
       |mx AS (SELECT MAX(n) AS m FROM en),
       |aug AS (
       |  SELECT vec_id, v,
       |         list_append(list_transform(v, x -> x / m),
       |                     SQRT(GREATEST(1e0 - (n / m) * (n / m), 0e0))) AS va,
       |         list_append(list_transform(v, x -> x / n), 0e0) AS qa
       |  FROM en CROSS JOIN mx),
       |bk AS (
       |  SELECT vec_id, v,
       |         CAST(${bucketExpr("va")} AS INT) AS bucket,
       |         CAST(${bucketExpr("qa")} AS INT) AS qbucket
       |  FROM aug),
       |pairs AS (
       |  SELECT p.vec_id AS a, c.vec_id AS b,
       |         ROUND(list_dot_product(p.v, c.v), 4) AS ip
       |  FROM bk p JOIN bk c ON p.qbucket = c.bucket AND p.vec_id <> c.vec_id
       |  WHERE p.vec_id < 100),
       |ranked AS (
       |  SELECT a, b, ip,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY a ORDER BY ip DESC, b) AS INT) AS rank
       |  FROM pairs)
       |SELECT a, rank, b, ip FROM ranked WHERE rank <= 3 ORDER BY a, rank""".stripMargin
  }

  /** the PQ index + ADC lookup CTEs — four prefixed per-subspace Lloyd
    * chains, per-vector codes, the unioned codebook, probe subvectors
    * (vec_id < 100), and the (qid, m, cell, term) lookup table.
    * Requires an `e(vec_id, v)` CTE in scope; shared by the
    * sim_ann_pq_adc and sim_ann_ivf_pq oracles. */
  private def adcCteSql: String = {
    val subs = (0 until PqM).map { m =>
      s"""s$m AS MATERIALIZED (SELECT vec_id, v[${m * PqSub + 1}:${(m + 1) * PqSub}] AS v FROM e),
         |${kmeansRounds(s"p${m}_", s"s$m", PqK, KmIters)}""".stripMargin
    }.mkString(",\n")
    val cb = (0 until PqM).map(m =>
      s"SELECT $m AS m, c_label AS cell, c, list_dot_product(c, c) AS cc FROM p${m}_cent$KmIters")
      .mkString("\n  UNION ALL ")
    val codeJoins = (0 until PqM).map(m =>
      s"JOIN p${m}_a$KmIters q$m ON e.vec_id = q$m.vec_id").mkString(" ")
    s"""$subs,
       |codes AS MATERIALIZED (
       |  SELECT e.vec_id AS b, ${(0 until PqM).map(m => s"q$m.cell AS c$m").mkString(", ")}
       |  FROM e $codeJoins),
       |cb AS MATERIALIZED (
       |  $cb),
       |qs AS (
       |  SELECT vec_id AS qid, m,
       |         list_slice(v, m * $PqSub + 1, (m + 1) * $PqSub) AS qm
       |  FROM e, (SELECT unnest([${(0 until PqM).mkString(", ")}]) AS m)
       |  WHERE vec_id < 100),
       |lut AS MATERIALIZED (
       |  SELECT qid, qs.m, cell, cc - 2.0 * list_dot_product(qm, c) AS term
       |  FROM qs JOIN cb ON qs.m = cb.m)""".stripMargin
  }

  /** the exact L2 top-3 baseline CTEs (`ex`, `ex3`) both PQ search
    * oracles grade recall against; requires `e` in scope. */
  private def exactL2CteSql: String =
    s"""ex AS (
       |  SELECT p.vec_id AS a, x.vec_id AS b,
       |         ROUND(list_dot_product(x.v, x.v)
       |               - 2.0 * list_dot_product(p.v, x.v), 6) AS dist
       |  FROM e p JOIN e x ON p.vec_id != x.vec_id
       |  WHERE p.vec_id < 100),
       |ex3 AS MATERIALIZED (
       |  SELECT a, b FROM (
       |    SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY dist, b) AS rk
       |    FROM ex) WHERE rk <= 3)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "sim_cosine_knn" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, $vd AS v FROM embeddings)
         |SELECT a.vec_id AS a, b.vec_id AS b,
         |       ROUND(list_cosine_similarity(a.v, b.v), 4) AS sim
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE a.vec_id < 200
         |ORDER BY sim DESC, a, b LIMIT 20""".stripMargin,

    "sim_ann_lsh" -> annSql,

    "sim_ann_mips" -> mipsSql,

    "sim_kmeans" -> kmeansSql(KmK, KmIters),

    "sample_cluster_cap" -> {
      val h = graft.ops.TextOps.md5LongSql("CAST(vec_id AS VARCHAR)")
      s"""WITH ${kmeansCte(KmK, KmIters)},
         |r AS (SELECT vec_id, cell,
         |             ROW_NUMBER() OVER (PARTITION BY cell ORDER BY $h, vec_id) AS rk
         |      FROM a$KmIters)
         |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN rk <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM r GROUP BY cell ORDER BY cell""".stripMargin
    },

    // the trained-cell IVF search: the sim_kmeans CTE chain (cells
    // a$KmIters) + the sim_ann_ivf search tail
    "sim_ann_ivf_kmeans" ->
      s"""WITH ${kmeansCte(KmK, KmIters)},
         |pairs AS (
         |  SELECT p.vec_id AS a, c.vec_id AS b,
         |         ROUND(list_cosine_similarity(p.v, c.v), 4) AS sim
         |  FROM a$KmIters p JOIN a$KmIters c
         |    ON p.cell = c.cell AND p.vec_id <> c.vec_id
         |  WHERE p.vec_id < 100),
         |ranked AS (
         |  SELECT a, b, sim,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b) AS INT) AS rank
         |  FROM pairs)
         |SELECT a, rank, b, sim FROM ranked WHERE rank <= 3 ORDER BY a, rank""".stripMargin,

    // the ADC search over the same four Lloyd chains: per-(probe,
    // subspace, cell) term lookup table, four fixed-order lookup
    // joins, recall@3 vs the exact L2 top-3 (shared CTEs: adcCteSql /
    // exactL2CteSql, reused by the composed sim_ann_ivf_pq oracle)
    "sim_ann_pq_adc" -> {
      val lutJoins = (1 until PqM).map(m =>
        s"JOIN lut l$m ON l$m.m = $m AND l$m.qid = l0.qid AND codes.c$m = l$m.cell")
        .mkString("\n  ")
      s"""WITH e AS MATERIALIZED (SELECT vec_id, $vd AS v FROM embeddings),
         |$adcCteSql,
         |adc AS (
         |  SELECT l0.qid, codes.b,
         |         ROUND(l0.term + l1.term + l2.term + l3.term, 6) AS adist
         |  FROM codes
         |  JOIN lut l0 ON l0.m = 0 AND codes.c0 = l0.cell
         |  $lutJoins
         |  WHERE codes.b != l0.qid),
         |pq3 AS (
         |  SELECT qid AS a, b FROM (
         |    SELECT qid, b, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, b) AS rk
         |    FROM adc) WHERE rk <= 3),
         |$exactL2CteSql
         |SELECT CAST(ne AS BIGINT) AS n_exact, CAST(nh AS BIGINT) AS n_hits,
         |       ROUND(CAST(nh AS DOUBLE) / ne, 4) AS recall
         |FROM (SELECT (SELECT COUNT(*) FROM ex3) AS ne,
         |             (SELECT COUNT(*) FROM pq3 JOIN ex3 USING (a, b)) AS nh)""".stripMargin
    },

    // the composed IVF×PQ oracle: the UNPREFIXED trained-cell chain
    // (sim_kmeans's kmeansCte — cent$KmIters is the codebook the final
    // argmin ran against, exactly kmTrained._2) bounds candidates to
    // the probe's 4 nearest cells; the PQ/ADC chains score them
    "sim_ann_ivf_pq" ->
      s"""WITH ${kmeansCte(KmK, KmIters)},
         |$adcCteSql,
         |pc AS MATERIALIZED (
         |  SELECT p.vec_id AS qid, c.c_label AS cell,
         |         ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |           ROUND(list_dot_product(p.v, p.v)
         |                 - 2.0 * list_dot_product(p.v, c.c)
         |                 + list_dot_product(c.c, c.c), 6), c.c_label) AS crk
         |  FROM e p CROSS JOIN cent$KmIters c
         |  WHERE p.vec_id < 100),
         |cand AS MATERIALIZED (
         |  SELECT pc.qid, a.vec_id AS b
         |  FROM pc JOIN a$KmIters a ON a.cell = pc.cell
         |  WHERE pc.crk <= 4 AND a.vec_id != pc.qid),
         |adc AS (
         |  SELECT cand.qid, cand.b,
         |         ROUND(l0.term + l1.term + l2.term + l3.term, 6) AS adist
         |  FROM cand
         |  JOIN codes ON codes.b = cand.b
         |  ${(0 until PqM).map(m =>
             s"JOIN lut l$m ON l$m.m = $m AND l$m.qid = cand.qid AND codes.c$m = l$m.cell")
             .mkString("\n  ")}),
         |pq3 AS (
         |  SELECT qid AS a, b FROM (
         |    SELECT qid, b, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, b) AS rk
         |    FROM adc) WHERE rk <= 3),
         |$exactL2CteSql
         |SELECT CAST(4 AS BIGINT) AS nprobe,
         |       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_cands,
         |       CAST(ne AS BIGINT) AS n_exact, CAST(nh AS BIGINT) AS n_hits,
         |       ROUND(CAST(nh AS DOUBLE) / ne, 4) AS recall
         |FROM (SELECT (SELECT COUNT(*) FROM ex3) AS ne,
         |             (SELECT COUNT(*) FROM pq3 JOIN ex3 USING (a, b)) AS nh)""".stripMargin,

    // four independent per-subspace Lloyd chains (prefixed CTE names),
    // then the code/error join — reconstruction error IS Σ subspace d2
    "sim_quantize_pq" -> {
      val subs = (0 until PqM).map { m =>
        s"""s$m AS MATERIALIZED (SELECT vec_id, v[${m * PqSub + 1}:${(m + 1) * PqSub}] AS v FROM e),
           |${kmeansRounds(s"p${m}_", s"s$m", PqK, KmIters)}""".stripMargin
      }.mkString(",\n")
      val joins = (0 until PqM).map(m =>
        s"JOIN p${m}_a$KmIters q$m ON e.vec_id = q$m.vec_id").mkString(" ")
      s"""WITH e AS MATERIALIZED (SELECT vec_id, label, $vd AS v FROM embeddings),
         |$subs,
         |j AS (
         |  SELECT e.label,
         |         ((q0.cell * 16 + q1.cell) * 16 + q2.cell) * 16 + q3.cell AS code,
         |         (q0.d2 + q1.d2 + q2.d2 + q3.d2) / $DIM.0 AS mse
         |  FROM e $joins)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         |       ROUND(AVG(mse), 8) AS avg_mse,
         |       CAST(COUNT(DISTINCT code) AS BIGINT) AS n_codes
         |FROM j GROUP BY label ORDER BY label""".stripMargin
    },

    "sim_quantize_int8" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, label, $vd AS v FROM embeddings),
         |ex AS (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
         |bd AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY pos),
         |b AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM bd),
         |enc AS (
         |  SELECT label,
         |         list_transform(range(1, ${DIM + 1}), i -> CASE WHEN mx[i] = mn[i] THEN 0.0
         |           ELSE ROUND((v[i] - mn[i]) * 255.0 / (mx[i] - mn[i])) END) AS q,
         |         v, mn, mx
         |  FROM e, b),
         |err AS (
         |  SELECT label,
         |         list_sum(list_transform(range(1, ${DIM + 1}),
         |           i -> (v[i] - (q[i] / 255.0 * (mx[i] - mn[i]) + mn[i]))
         |              * (v[i] - (q[i] / 255.0 * (mx[i] - mn[i]) + mn[i])))) / $DIM.0 AS mse,
         |         list_max(list_transform(range(1, ${DIM + 1}),
         |           i -> ABS(v[i] - (q[i] / 255.0 * (mx[i] - mn[i]) + mn[i])))) AS maxerr
         |  FROM enc)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         |       ROUND(AVG(mse), 8) AS avg_mse,
         |       ROUND(MAX(maxerr), 6) AS max_abs_err
         |FROM err GROUP BY label ORDER BY label""".stripMargin,

    "sim_ann_ivf" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, $vd AS v FROM embeddings),
         |k AS (SELECT GREATEST(32, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) AS k FROM e),
         |ex AS (SELECT vec_id % (SELECT k FROM k) AS bucket,
         |              unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
         |cent AS (
         |  SELECT bucket AS c_label, list(av ORDER BY pos) AS c
         |  FROM (SELECT bucket, pos, AVG(x) AS av FROM ex GROUP BY bucket, pos)
         |  GROUP BY bucket),
         |assigned AS (
         |  SELECT vec_id, v, c_label AS cell,
         |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS arn
         |  FROM (SELECT e.vec_id, e.v, cent.c_label,
         |               ROUND(list_dot_product(e.v, e.v)
         |                     - 2.0 * list_dot_product(e.v, cent.c)
         |                     + list_dot_product(cent.c, cent.c), 6) AS d2
         |        FROM e CROSS JOIN cent)),
         |cells AS (SELECT vec_id, v, cell FROM assigned WHERE arn = 1),
         |pairs AS (
         |  SELECT p.vec_id AS a, c.vec_id AS b,
         |         ROUND(list_cosine_similarity(p.v, c.v), 4) AS sim
         |  FROM cells p JOIN cells c ON p.cell = c.cell AND p.vec_id <> c.vec_id
         |  WHERE p.vec_id < 100),
         |ranked AS (
         |  SELECT a, b, sim,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b) AS INT) AS rank
         |  FROM pairs)
         |SELECT a, rank, b, sim FROM ranked WHERE rank <= 3 ORDER BY a, rank""".stripMargin,

    // same IVF scaffolding CTEs as sim_ann_ivf (kept textually parallel
    // to ivfCents/ivfAssigned), extended with the per-probe cell
    // ranking (arn ≤ 4), the nprobe ∈ {1,2,4} candidate pools, and the
    // brute-force exact top-3 the recall grades against.
    "sim_ann_recall_sweep" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, $vd AS v FROM embeddings),
         |k AS (SELECT GREATEST(32, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) AS k FROM e),
         |ex AS (SELECT vec_id % (SELECT k FROM k) AS bucket,
         |              unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
         |cent AS (
         |  SELECT bucket AS c_label, list(av ORDER BY pos) AS c
         |  FROM (SELECT bucket, pos, AVG(x) AS av FROM ex GROUP BY bucket, pos)
         |  GROUP BY bucket),
         |assigned AS (
         |  SELECT vec_id, v, c_label AS cell,
         |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS arn
         |  FROM (SELECT e.vec_id, e.v, cent.c_label,
         |               ROUND(list_dot_product(e.v, e.v)
         |                     - 2.0 * list_dot_product(e.v, cent.c)
         |                     + list_dot_product(cent.c, cent.c), 6) AS d2
         |        FROM e CROSS JOIN cent)),
         |cells AS (SELECT vec_id, v, cell FROM assigned WHERE arn = 1),
         |pcells AS (SELECT vec_id, v, cell, arn FROM assigned
         |           WHERE arn <= 4 AND vec_id < 100),
         |np AS (SELECT unnest([1, 2, 4]) AS nprobe),
         |pool AS (
         |  SELECT p.vec_id AS a, c.vec_id AS b,
         |         ROUND(list_cosine_similarity(p.v, c.v), 4) AS sim, p.arn
         |  FROM pcells p JOIN cells c ON p.cell = c.cell AND p.vec_id <> c.vec_id),
         |expanded AS (SELECT np.nprobe, pool.* FROM pool JOIN np ON pool.arn <= np.nprobe),
         |ivf3 AS (
         |  SELECT nprobe, a, b FROM (
         |    SELECT nprobe, a, b,
         |           ROW_NUMBER() OVER (PARTITION BY nprobe, a ORDER BY sim DESC, b) AS rk
         |    FROM expanded) WHERE rk <= 3),
         |ex3 AS MATERIALIZED (
         |  SELECT a, b FROM (
         |    SELECT p.vec_id AS a, c.vec_id AS b,
         |           ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |             ORDER BY ROUND(list_cosine_similarity(p.v, c.v), 4) DESC, c.vec_id) AS rk
         |    FROM e p JOIN e c ON p.vec_id <> c.vec_id
         |    WHERE p.vec_id < 100) WHERE rk <= 3),
         |nex AS (SELECT COUNT(*) AS n_exact FROM ex3),
         |hits AS (SELECT nprobe, COUNT(*) AS n_hits
         |         FROM ivf3 JOIN ex3 USING (a, b) GROUP BY 1),
         |cands AS (SELECT nprobe, COUNT(*) AS n_cands FROM expanded GROUP BY 1)
         |SELECT CAST(np.nprobe AS BIGINT) AS nprobe,
         |       CAST(nex.n_exact AS BIGINT) AS n_exact,
         |       CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
         |       CAST(COALESCE(cands.n_cands, 0) AS BIGINT) AS n_cands,
         |       ROUND(CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / nex.n_exact, 4) AS recall
         |FROM np CROSS JOIN nex
         |LEFT JOIN hits ON np.nprobe = hits.nprobe
         |LEFT JOIN cands ON np.nprobe = cands.nprobe
         |ORDER BY nprobe""".stripMargin,

    "sim_similarity_join" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, $vd AS v FROM embeddings)
         |SELECT a.vec_id AS a, b.vec_id AS b,
         |       ROUND(list_cosine_similarity(a.v, b.v), 4) AS sim
         |FROM e a JOIN e b ON b.vec_id >= 300
         |WHERE a.vec_id < 300
         |  AND ROUND(list_cosine_similarity(a.v, b.v), 4) >= 0.35
         |ORDER BY a, b""".stripMargin,

    "dedup_embedding" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, $vd AS v FROM embeddings)
         |SELECT a.vec_id AS a, b.vec_id AS b,
         |       ROUND(list_cosine_similarity(a.v, b.v), 4) AS sim
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= $CosFloor
         |ORDER BY a, b""".stripMargin,

    // brute-force ≥ CosFloor pairs (the dedup_embedding oracle's j), then
    // the same 5-band curve as the Jaccard sweep's oracle — thresholds
    // compare the 4-dp ROUNDED sim on both engines
    "dedup_embedding_sweep" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, $vd AS v FROM embeddings),
         |j AS (SELECT a.vec_id AS a, b.vec_id AS b,
         |             ROUND(list_cosine_similarity(a.v, b.v), 4) AS sim
         |      FROM e a JOIN e b ON a.vec_id < b.vec_id
         |      WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= $CosFloor),
         |th AS (SELECT unnest([0.35, 0.5, 0.65, 0.8, 0.9]) AS t),
         |sel AS (SELECT t, a, b FROM j, th WHERE j.sim >= th.t),
         |pr AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM sel GROUP BY t),
         |dd AS (SELECT t, CAST(COUNT(DISTINCT vec) AS BIGINT) AS n_vecs
         |       FROM (SELECT t, unnest([a, b]) AS vec FROM sel) GROUP BY t)
         |SELECT th.t, COALESCE(n_pairs, 0) AS n_pairs, COALESCE(n_vecs, 0) AS n_vecs
         |FROM th LEFT JOIN pr USING (t) LEFT JOIN dd USING (t)
         |ORDER BY th.t""".stripMargin,

    "sim_embedding_norms" ->
      s"""SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         |       ROUND(AVG(sqrt(list_dot_product(v, v))), 4) AS avg_norm
         |FROM (SELECT label, $vd AS v FROM embeddings)
         |GROUP BY label ORDER BY label""".stripMargin,

    // persist-and-serve replay: retrain the same deterministic chains
    // (trained-cell coarse index + PQ/ADC) directly from embeddings and
    // emit the served top-3 — identical rows proves the Spark side's
    // parquet-persisted index roundtripped losslessly
    "sim_ann_persisted" ->
      s"""WITH ${kmeansCte(KmK, KmIters)},
         |$adcCteSql,
         |pc AS MATERIALIZED (
         |  SELECT p.vec_id AS qid, c.c_label AS cell,
         |         ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |           ROUND(list_dot_product(p.v, p.v)
         |                 - 2.0 * list_dot_product(p.v, c.c)
         |                 + list_dot_product(c.c, c.c), 6), c.c_label) AS crk
         |  FROM e p CROSS JOIN cent$KmIters c
         |  WHERE p.vec_id < 100),
         |cand AS MATERIALIZED (
         |  SELECT pc.qid, a.vec_id AS b
         |  FROM pc JOIN a$KmIters a ON a.cell = pc.cell
         |  WHERE pc.crk <= 4 AND a.vec_id != pc.qid),
         |adc AS (
         |  SELECT cand.qid, cand.b,
         |         ROUND(l0.term + l1.term + l2.term + l3.term, 6) AS adist
         |  FROM cand
         |  JOIN codes ON codes.b = cand.b
         |  ${(0 until PqM).map(m =>
             s"JOIN lut l$m ON l$m.m = $m AND l$m.qid = cand.qid AND codes.c$m = l$m.cell")
             .mkString("\n  ")})
         |SELECT qid AS a, CAST(rk AS INT) AS rank, b, adist FROM (
         |  SELECT qid, b, adist,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, b) AS rk
         |  FROM adc) WHERE rk <= 3 ORDER BY a, rank""".stripMargin
  )
}
