package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump ALL of SparkEntry.oracleSql as JSON without running any
  * Spark query. Used by the integer-aggregate oracle audit (VERDICT r9
  * task 2): each SQL is replayed in DuckDB and any compared column whose
  * type is HUGEINT (DuckDB widens sum(BIGINT) to int128, which the
  * driver's hash canonicalizes differently from Spark's BIGINT) is a red
  * row waiting to happen — q108 was exactly this class.
  */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql_all.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} SQL entries to $out")
  }
}
