package graft.ops

import java.nio.file.{Files, Paths}

/** Cross-JVM harness for [[IndexStore]]'s publication race (r15 verdict
  * #6): swapInto is `synchronized`, which serializes builders inside
  * ONE JVM only — the cross-PROCESS story rests on rename(2) atomicity
  * and the marker-inside-the-build protocol, and until this round it
  * was documented but untested. This main is one racing builder;
  * IndexRaceCrossJvmSpec launches two of them as separate plain-JVM
  * processes (no Spark — IndexStore is pure java.nio) against one
  * root while the spec's own JVM plays a hot reader, asserting that
  * every observation of a fresh root is a COMPLETE single-builder
  * build and the final root is too.
  *
  * Usage: graft.ops.IndexRace <root> <stamp> <builderId> <nFiles> <stepMs>
  *
  * The builder writes nFiles data files each containing its builderId,
  * sleeping stepMs between files so the two builds genuinely overlap
  * in time (a build that finishes inside one scheduler quantum would
  * test nothing). Prints `published:<bool>` for the spec to collect.
  */
object IndexRace {
  def main(args: Array[String]): Unit = {
    val Array(root, stamp, builderId, nFilesS, stepMsS) = args.take(5)
    val nFiles = nFilesS.toInt
    val stepMs = stepMsS.toLong
    val published = IndexStore.publishIfAbsent(root, stamp) { tmp =>
      var i = 0
      while (i < nFiles) {
        Files.write(Paths.get(tmp, f"part-$i%05d.txt"),
          s"$builderId\n".getBytes("UTF-8"))
        Thread.sleep(stepMs)
        i += 1
      }
    }
    println(s"published:$published")
  }
}
