package graft
import java.nio.file.{Files, Paths}

/** Machine-generates the SURVEY.md §2B-as-built header counts from the
  * SparkEntry inventory (r11/r12 verdict ask: the line was hand-edited
  * through ten key batches and drifted twice before QueriesSmokeSpec
  * started asserting it; now the asserted line is WRITTEN by the same
  * source of truth the assertion reads).
  *
  *   sbt "runMain graft.SurveySync"            # rewrite counts in place
  *   sbt "runMain graft.SurveySync --check"    # exit 1 if out of date
  *
  * Only the bold `**N keys: M oracled, K TEST**` fragment is touched;
  * the prose around it (round label, date, batch history) stays
  * human-authored.
  */
object SurveySync {
  private val HeaderRe =
    """(### 2B-as-built[^\n—]*—\s*)\*\*(\d+) keys: (\d+) oracled, (\d+) TEST\*\*""".r

  def main(args: Array[String]): Unit = {
    val checkOnly = args.contains("--check")
    val path = Paths.get(args.filterNot(_.startsWith("--"))
      .headOption.getOrElse("SURVEY.md"))
    val txt = new String(Files.readAllBytes(path), "UTF-8")
    val nKeys = SparkEntry.queries.size
    val nOracled = SparkEntry.oracleSql.size
    val nTest = nKeys - nOracled
    val m = HeaderRe.findFirstMatchIn(txt).getOrElse {
      System.err.println(s"SurveySync: §2B-as-built header not found in $path")
      sys.exit(2)
    }
    val current = (m.group(2).toInt, m.group(3).toInt, m.group(4).toInt)
    if (current == ((nKeys, nOracled, nTest))) {
      println(s"SurveySync: up to date ($nKeys keys: $nOracled oracled, $nTest TEST)")
    } else if (checkOnly) {
      System.err.println(s"SurveySync: STALE — header says $current, " +
        s"inventory is ($nKeys, $nOracled, $nTest)")
      sys.exit(1)
    } else {
      val updated = txt.substring(0, m.start) + m.group(1) +
        s"**$nKeys keys: $nOracled oracled, $nTest TEST**" +
        txt.substring(m.end)
      Files.write(path, updated.getBytes("UTF-8"))
      println(s"SurveySync: rewrote header $current -> ($nKeys, $nOracled, $nTest)")
    }
  }
}
