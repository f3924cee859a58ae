package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The dump loop, parameterized on the registry so the error path is
    * testable with a scratch registry (VerifySpec injects a throwing
    * query and asserts errors.json carries it — pinning the r11
    * silent-miss fix). Returns the failure map it persisted. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          queries: Map[String, (SparkSession, String) => DataFrame],
          oracleSql: Map[String, String]): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    // A failing query must be first-class RED, not a silently-missing
    // row (VERDICT r11 item 3: the NTZ break surfaced only as absent
    // CORRECTNESS rows): collect every failure and persist it as
    // errors.json in the same outDir the driver reads.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: $msg")
        failures(name) = msg.linesIterator.take(3).mkString(" | ").take(500)
      }
      finally spark.catalog.clearCache() // drop per-query persisted intermediates
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
    // Emit SQL only for the queries whose parquet was (re)written in THIS
    // run: with SPARK_GRAFT_VERIFY_ONLY set, unselected entries would pair
    // fresh SQL with stale/missing parquet and a manifest-driven comparator
    // would report misleading results for queries this run never touched.
    val json = oracleSql
      .filter { case (k, _) => queries.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // {} on a clean run; any entry means the named query THREW and has
    // no parquet — comparators must treat it as failed, not skip it.
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    failures.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local()
    // optional name filter for fast single-query iteration (same
    // contract as Bench's SPARK_GRAFT_BENCH_ONLY)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None        => SparkEntry.queries
    }
    run(spark, sfDir, outDir, selected, SparkEntry.oracleSql)
    spark.stop()
  }
}
