package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IndexStore

/** Pins the atomic index-publication protocol (r14 ADVICE / verdict
  * #4): two builders racing the same stale stamp must each publish a
  * COMPLETE build — the final root is one builder's output whole,
  * never an interleaved mix — and a crashed build must leave nothing a
  * later session could trust.
  */
class IndexStoreSpec extends AnyFunSuite {

  private def tmpRoot(): String =
    Files.createTempDirectory("idxstore").resolve("index").toString

  private def read(root: String, f: String): String =
    new String(Files.readAllBytes(Paths.get(root, f)), "UTF-8")

  test("publish then fresh: second call does not rebuild") {
    val root = tmpRoot()
    var builds = 0
    def build(tmp: String): Unit = {
      builds += 1
      Files.write(Paths.get(tmp, "a.txt"), "v1".getBytes)
    }
    assert(IndexStore.publishIfAbsent(root, "stamp-1")(build))
    assert(!IndexStore.publishIfAbsent(root, "stamp-1")(build))
    assert(builds == 1)
    assert(read(root, "a.txt") == "v1")
    assert(read(root, "_INDEX").trim == "stamp-1")
  }

  test("stale stamp is replaced atomically") {
    val root = tmpRoot()
    IndexStore.publishIfAbsent(root, "stamp-1") { tmp =>
      Files.write(Paths.get(tmp, "a.txt"), "old".getBytes)
    }
    IndexStore.publishIfAbsent(root, "stamp-2") { tmp =>
      Files.write(Paths.get(tmp, "a.txt"), "new".getBytes)
    }
    assert(read(root, "_INDEX").trim == "stamp-2")
    assert(read(root, "a.txt") == "new")
  }

  test("crashed build leaves no trusted root") {
    val root = tmpRoot()
    intercept[RuntimeException] {
      IndexStore.publishIfAbsent(root, "stamp-1") { tmp =>
        Files.write(Paths.get(tmp, "a.txt"), "partial".getBytes)
        throw new RuntimeException("injected crash mid-build")
      }
    }
    assert(!Files.exists(Paths.get(root, "_INDEX")))
    assert(!IndexStore.fresh(root, "stamp-1"))
    // and a later successful build publishes normally over the wreckage
    IndexStore.publishIfAbsent(root, "stamp-1") { tmp =>
      Files.write(Paths.get(tmp, "a.txt"), "good".getBytes)
    }
    assert(read(root, "a.txt") == "good")
  }

  test("two builders racing the same stale stamp: complete build wins, never torn") {
    // Each builder writes TWO files carrying its id with a barrier
    // between the writes — exactly the interleave window the old
    // in-place mode-overwrite protocol had (builder A writes bands,
    // builder B overwrites bands, A writes shingles, B's marker lands:
    // torn). Under IndexStore the final root must hold ONE builder's
    // pair.
    val root = tmpRoot()
    val bothStarted = new CountDownLatch(2)
    def build(id: String)(tmp: String): Unit = {
      Files.write(Paths.get(tmp, "a.txt"), id.getBytes)
      bothStarted.countDown()
      // hold until both builders have written their first file, so the
      // builds genuinely overlap
      bothStarted.await(10, TimeUnit.SECONDS)
      Files.write(Paths.get(tmp, "b.txt"), id.getBytes)
    }
    val pool = Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new Runnable {
        def run(): Unit = IndexStore.publishIfAbsent(root, "stamp-1")(build("A")) })
      val fb = pool.submit(new Runnable {
        def run(): Unit = IndexStore.publishIfAbsent(root, "stamp-1")(build("B")) })
      fa.get(30, TimeUnit.SECONDS); fb.get(30, TimeUnit.SECONDS)
    } finally pool.shutdownNow()
    assert(read(root, "_INDEX").trim == "stamp-1")
    val (a, b) = (read(root, "a.txt"), read(root, "b.txt"))
    assert(a == b, s"torn index: a.txt from builder $a, b.txt from builder $b")
    // no build/old leftovers visible as the root
    assert(Files.isDirectory(Paths.get(root)))
  }

  test("cross-JVM race: two separate processes publishing one root (r15 verdict #6)") {
    // The in-JVM race above goes through swapInto's `synchronized`,
    // which serializes nothing across PROCESSES — there the protocol
    // rests on rename(2) atomicity and marker-inside-the-build alone.
    // Launch two plain-JVM builders (graft.ops.IndexRace — IndexStore
    // is pure java.nio, no Spark needed) against one root, each
    // writing 40 files with 5 ms gaps so the builds overlap for
    // ~200 ms, while THIS JVM plays a hot reader: every time the root
    // looks fresh, the files visible under it must all carry ONE
    // builder's id with the full file count — a reader can see old,
    // new, or absent (the documented rename-aside window), never torn.
    val root = tmpRoot()
    val stamp = "xjvm-stamp-1"
    val nFiles = 40
    val cp = System.getProperty("java.class.path")
    def launch(id: String): Process =
      new ProcessBuilder("java", "-cp", cp, "graft.ops.IndexRace",
        root, stamp, id, nFiles.toString, "5")
        .redirectErrorStream(true).start()
    val pa = launch("A")
    val pb = launch("B")
    var tornObservation: Option[String] = None
    var freshObservations = 0
    while (pa.isAlive || pb.isAlive) {
      if (IndexStore.fresh(root, stamp)) {
        try {
          val files = Files.list(Paths.get(root)).iterator()
          var ids = Set.empty[String]
          var n = 0
          while (files.hasNext) {
            val p = files.next()
            if (p.getFileName.toString.startsWith("part-")) {
              n += 1
              ids += new String(Files.readAllBytes(p), "UTF-8").trim
            }
          }
          freshObservations += 1
          if (ids.size != 1 || n != nFiles)
            tornObservation = tornObservation.orElse(
              Some(s"fresh root had builders=$ids nFiles=$n"))
        } catch {
          // the root was swapped mid-listing: old inode vanished under
          // us — the reader's next fresh() retry is the contract, not
          // torn data
          case _: java.nio.file.NoSuchFileException => ()
        }
      }
      Thread.sleep(2)
    }
    assert(pa.waitFor(30, TimeUnit.SECONDS) && pb.waitFor(30, TimeUnit.SECONDS))
    assert(tornObservation.isEmpty, tornObservation.getOrElse(""))
    // final root: one complete single-builder build with a valid marker
    assert(IndexStore.fresh(root, stamp))
    val finalIds = (0 until nFiles)
      .map(i => read(root, f"part-$i%05d.txt").trim).toSet
    assert(finalIds.size == 1, s"final root torn across builders: $finalIds")
    // no orphan .build-* / .old-* siblings left visible as plausible roots
    val parent = Paths.get(root).getParent
    val leftovers = Files.list(parent).iterator()
    while (leftovers.hasNext) {
      val p = leftovers.next()
      val n = p.getFileName.toString
      assert(!n.contains(".old-"), s"old root left behind: $n")
    }
  }
}
