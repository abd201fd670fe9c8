package graft

import org.apache.spark.sql.functions._

/** Pins the per-key byte-floor protocol (r14 verdict #2): the
  * BenchBytes listener must measure real shuffle-write bytes, those
  * bytes must be deterministic for a fixed plan (the property that
  * makes them a load-immune regression signal), and the byteRegression
  * bar must separate a genuine plan regression (strings re-shuffled
  * where hashes used to move — the exact class the hash-early rewrites
  * bought) from codec/stat jitter.
  */
class BenchBytesSpec extends SparkSpec {

  private lazy val tally = new BenchBytes(spark.sparkContext)

  /** shuffle-write bytes moved by `job`, listener-bracketed */
  private def bytesOf(job: => Unit): Long = {
    val (b0, _) = tally.snapshot()
    job
    val (b1, _) = tally.snapshot()
    b1 - b0
  }

  // a corpus of distinct high-entropy strings (hex digests — the shape
  // of real shingle keys), big enough that shuffling the strings vs
  // shuffling 8-byte hashes differs by >1 MiB (the flag's absolute
  // bar). Entropy matters: an earlier cut used repetitive text and
  // lz4 compressed the 35-char strings BELOW the incompressible
  // 8-byte hashes — the byte win of hash-early is real only when the
  // keys don't compress, which digest-like keys don't.
  private def grams = spark.range(200000L)
    .select(concat(lit("g-"), md5(col("id").cast("string"))).as("g"))

  test("shuffle bytes are deterministic for a fixed plan") {
    def run(): Long = bytesOf {
      grams.repartition(4, col("g")).agg(count(lit(1))).collect()
    }
    val a = run()
    val b = run()
    assert(a > 0L, "listener saw no shuffle bytes — bracket broken")
    assert(a == b, s"same plan, same data, different bytes: $a vs $b")
  }

  test("hash-early vs string shuffle is a flagged byte regression; jitter is not") {
    // the optimized shape: reduce strings to 8-byte hashes at birth
    val hashed = bytesOf {
      grams.select(xxhash64(col("g")).as("h"))
        .repartition(4, col("h")).agg(count(lit(1))).collect()
    }
    // the regressed shape: the raw strings cross the shuffle
    val strings = bytesOf {
      grams.repartition(4, col("g")).agg(count(lit(1))).collect()
    }
    assert(strings > hashed,
      s"string shuffle ($strings B) should exceed hashed shuffle ($hashed B)")
    // with the hashed bytes as the committed floor, the string-plan
    // regression must trip the bar...
    assert(Bench.byteRegression(strings - hashed, hashed.toDouble),
      s"plan regression of ${strings - hashed} B over floor $hashed not flagged")
    // ...while sub-bar jitter (half the absolute bar, or 5% relative)
    // must not
    assert(!Bench.byteRegression((1L << 19), hashed.toDouble))
    assert(!Bench.byteRegression((0.05 * hashed).toLong, hashed.toDouble))
  }

  test("byteRegression bar semantics") {
    // needs BOTH: >1 MiB absolute AND >10% relative
    assert(Bench.byteRegression(2L << 20, (10L << 20).toDouble))   // 2 MiB over 10 MiB
    assert(!Bench.byteRegression(2L << 20, (1L << 30).toDouble))   // 2 MiB over 1 GiB: relative fail
    assert(!Bench.byteRegression(512L << 10, (1L << 20).toDouble)) // 0.5 MiB: absolute fail
    // a key with no floor bytes (floor 0/new key) flags on any MiB+ growth
    assert(Bench.byteRegression(2L << 20, 0.0))
  }
}
