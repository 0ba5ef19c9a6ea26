package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: exactly (sfDir, outDir). An optional third arg
    // (comma-separated query names) restricts the dump for local dev.
    val sfDir = args(0)
    val outDir = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // AQE off by default, like Bench (rationale in GraftSession): the
    // local-mode lost-wakeup in AQE's final-plan event loop showed up
    // as r3's transient Verify failure. Results are identical either
    // way — AQE never changes values.
    def buildSession(): SparkSession = GraftSession.build(appName = "graft-verify")
    var spark = buildSession()
    // a dead context must not cascade failures across the remaining sweep
    def session(): SparkSession = {
      if (spark.sparkContext.isStopped) {
        System.err.println("[verify] SparkContext is dead — rebuilding session")
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        spark = buildSession()
      }
      spark
    }
    new java.io.File(outDir).mkdirs()
    // A failed write must leave NO output dir: in r3 a transient failure
    // left an empty/stale dir that the driver diffed as a confident 0-row
    // wrong answer (q_window_lag_lead phantom FAIL). Delete the dir and
    // record the error in _verify_errors.json so breakage surfaces as
    // breakage. One retry first — the r3 failure was a one-off flake, and
    // a clean second pass beats an error row for a healthy query.
    def deleteRecursively(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
      f.delete(); ()
    }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      def attempt(): Unit = fn(session(), sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
      try {
        try attempt()
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed (${e.getMessage}); retrying once")
          attempt()
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        deleteRecursively(new java.io.File(s"$outDir/$name"))
        errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
      // drop any blocks the query-builder persisted (bpe_merge_step word
      // corpus, cc_labels supersteps): a leaked cache pins heap for the
      // remaining ~160 dumps of the sweep (see Bench for the r4 evidence)
      try session().catalog.clearCache()
      catch { case e: Throwable =>
        System.err.println(s"[verify] clearCache after $name failed: ${e.getMessage}") }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // error manifest: the driver (and the judge) see WHY a dump is absent
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_verify_errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries failed: " +
        errors.keys.mkString(", "))
    spark.stop()
  }
}
