package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q173 metadata-only aggregates: the answer must come from parquet
  * footers — no file-source row scan anywhere in the plan — and must
  * equal the full-scan aggregate, including the null semantics
  * (count(*) counts nulls; min/max skip all-null row groups). */
class MetadataSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"

  test("q173 plan contains NO row scan of the table") {
    val spark = SparkSpec.spark
    val plan = Metadata.metadataAgg(spark, sfDir).queryExecution.executedPlan
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.isEmpty, s"row scan in a metadata-only plan: $scans")
  }

  test("q173 footer aggregate equals the full-scan aggregate") {
    val spark = SparkSpec.spark
    val got = Metadata.metadataAgg(spark, sfDir).head()
    val exp = spark.read.parquet(s"$sfDir/lineitem.parquet").agg(
      count(lit(1)), min("l_orderkey"), max("l_orderkey"),
      min("l_extendedprice"), max("l_extendedprice")).head()
    assert(got.getLong(0) === exp.getLong(0))
    assert(got.getLong(1) === exp.getLong(1))
    assert(got.getLong(2) === exp.getLong(2))
    assert(got.getDouble(3) === exp.getDouble(3))
    assert(got.getDouble(4) === exp.getDouble(4))
  }

  test("footer roll-up skips all-null files for min/max, counts their rows") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("meta-nulls").toString
    // file A: values; file B: all-null price column (footer has rows
    // but no min/max for the double col)
    Seq((1L, Option(2.5)), (2L, Option(7.5))).toDF("l_orderkey", "l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((3L, Option.empty[Double])).toDF("l_orderkey", "l_extendedprice")
      .coalesce(1).write.mode("append").parquet(s"$dir/lineitem.parquet")
    val out = Metadata.metadataAgg(spark, dir).head()
    assert(out.getLong(0) === 3L)          // count(*) includes the null row
    assert(out.getLong(1) === 1L && out.getLong(2) === 3L)
    assert(out.getDouble(3) === 2.5 && out.getDouble(4) === 7.5)
  }
}
