package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Fault-injection pin for the Verify error path (VERDICT r12 next-round
  * #7): a query that THROWS must land in errors.json — never a
  * silently-missing CORRECTNESS row (the r11 failure class) — and must
  * not stop the rest of the registry from dumping. */
class VerifySpec extends AnyFunSuite {

  test("a throwing query lands in errors.json; healthy queries still dump") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val out = Files.createTempDirectory("verify_spec").toString
    val boom = "deliberate failure:\twith\ncontrol chars \"quoted\""
    val failures = Verify.run(spark, "/root/testdata/sf0.001", out,
      queries = scala.collection.immutable.ListMap(
        "q_ok" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
          graft.ops.Tables.region(s, d)),
        "q_boom" -> ((_: org.apache.spark.sql.SparkSession, _: String) =>
          throw new IllegalStateException(boom)),
        // an ANALYSIS-time failure (missing column), the r11 class
        "q_analysis" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
          graft.ops.Tables.region(s, d).select("no_such_column"))),
      oracleSql = Map("q_ok" -> "SELECT * FROM region"))
    // the two failures are reported, the healthy dump exists
    assert(failures.keySet === Set("q_boom", "q_analysis"))
    assert(Files.exists(Paths.get(s"$out/q_ok")))
    assert(!Files.exists(Paths.get(s"$out/q_boom")))
    // errors.json is VALID JSON carrying both entries (control chars in
    // the message must be escaped, or the driver's json.load dies and
    // zeroes the round)
    val errTxt = Files.readString(Paths.get(s"$out/errors.json"))
    assert(errTxt.contains("q_boom") && errTxt.contains("q_analysis"))
    // tabs are escaped; newlines were already collapsed to " | " by the
    // 3-line message truncation — either way no raw control char leaks
    assert(errTxt.contains("\\t"))
    assert(!errTxt.exists(c => c < ' '))
    // minimal JSON sanity: Spark's own parser must read it back
    val parsed = spark.read.json(Seq(errTxt).toDS()).columns.toSet
    assert(parsed === Set("q_boom", "q_analysis"))
    // oracle_sql.json only lists queries from THIS run's registry
    val sqlTxt = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    assert(sqlTxt.contains("q_ok") && !sqlTxt.contains("q_boom"))
  }
}
