package graft

/** Driver-side brute-force reference for the span-dedup family's
  * declared semantics (shared by the SemanticsSpec real-corpus test and
  * the OpsSpec randomized-corpus property test): mine K-gram
  * occurrences, keep only the lexicographic-min (doc, pos) occurrence
  * of each cross-doc duplicated gram, expand the rest to covered token
  * positions, and account per lang.
  */
object SpanRef {
  val K = 10

  /** per-lang (n_docs, n_touched, n_surviving, toks_removed,
    * chars_removed) over (doc_id, lang, tokens). */
  def perLang(docs: Seq[(Long, String, Array[String])])
      : Map[String, (Long, Long, Long, Long, Long)] = {
    val occ = docs.flatMap { case (id, _, t) =>
      (0 to t.length - K).map(i => (t.slice(i, i + K).mkString(" "), id, i))
    }
    val owners = occ.groupBy(_._1).collect {
      case (g, os) if os.map(_._2).distinct.length >= 2 =>
        g -> os.map(o => (o._2, o._3)).min
    }
    val covered = occ
      .filter { case (g, id, i) => owners.get(g).exists(_ != ((id, i))) }
      .flatMap { case (_, id, i) => (i until i + K).map((id, _)) }
      .toSet
    docs.groupBy(_._2).map { case (lang, ds) =>
      val per = ds.map { case (id, _, t) =>
        val keptIdx = t.indices.filterNot(p => covered((id, p)))
        val orig = t.map(_.length).sum + t.length - 1
        val clean =
          if (keptIdx.isEmpty) 0
          else keptIdx.map(t(_).length).sum + keptIdx.length - 1
        (t.length.toLong, keptIdx.length.toLong, orig.toLong, clean.toLong)
      }
      lang -> (per.length.toLong,
        per.count(p => p._2 < p._1).toLong,
        per.count(_._2 > 0).toLong,
        per.map(p => p._1 - p._2).sum,
        per.map(p => p._3 - p._4).sum)
    }
  }
}
