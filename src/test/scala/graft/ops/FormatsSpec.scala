package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q221 ORC round-trip: the ORC-side checksum must equal the same
  * cells computed from the parquet original inside Spark (the oracle
  * repeats this cross-engine), the persisted conversion must be
  * idempotent, and the checksum must actually DETECT a mutation. */
class FormatsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private def cells(df: org.apache.spark.sql.DataFrame) = {
    val h = graft.functions.GraftFunctions.md5Lower64(
      concat_ws("|", lit("orc:"), col("doc_id"), col("lang"),
        col("n_chars"), col("text"))).bitwiseAND(Long.MaxValue)
    df.select(col("source"), h.as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("h")).as("xor_sum"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("ORC-side cells equal the parquet original's, and twice (idempotent)") {
    val spark = SparkSpec.spark
    val fromParquet = cells(Tables.documents(spark, dir))
    val first = Formats.orcRoundTrip(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val second = Formats.orcRoundTrip(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(first === fromParquet, "ORC round-trip must be lossless")
    assert(second === first, "persisted conversion must be idempotent")
    assert(first.nonEmpty && first.values.map(_._1).sum ===
      Tables.documents(spark, dir).count())
  }

  test("q266 JSONL-side cells equal the parquet original's (escaping/unicode survive)") {
    val spark = SparkSpec.spark
    val got = Formats.jsonRoundTrip(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val h = graft.functions.GraftFunctions.md5Lower64(
      concat_ws("|", lit("jsonl:"), col("doc_id"), col("lang"),
        col("n_chars"), col("text"))).bitwiseAND(Long.MaxValue)
    val fromParquet = Tables.documents(spark, dir)
      .select(col("source"), h.as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("h")).as("xor_sum"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === fromParquet, "JSONL round-trip must be lossless")
    assert(got.values.map(_._1).sum === Tables.documents(spark, dir).count())
  }

  test("the checksum detects a single mutated row") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, dir)
    val minId = docs.agg(min("doc_id")).collect().head.getLong(0)
    val mutated = docs.withColumn("text",
      when(col("doc_id") === minId, concat(col("text"), lit("x")))
        .otherwise(col("text")))
    val a = cells(docs)
    val b = cells(mutated)
    assert(a !== b, "one flipped row must change its bucket's xor cell")
    // counts are unchanged — only the xor cell moves
    assert(a.view.mapValues(_._1).toMap === b.view.mapValues(_._1).toMap)
  }
}
