package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q125 mergeable bottom-k sample quantiles: the bounded aggregator
  * must equal the window-rank definition, merge across arbitrary
  * partitionings, and land near the true quantile. */
class SampleQuantilesSpec extends AnyFunSuite {

  test("bounded aggregator equals the row_number definition and survives repartition (sf0.01)") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val base = Quantiles.sampleQuantilesFrom(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // window-rank reference: the oracle's own shape, in Spark
    val k = Quantiles.SampleQK
    val byLang = Window.partitionBy("lang").orderBy("skey", "doc_id")
    val ref = docs
      .select(col("lang"), col("doc_id"), col("n_chars"),
        graft.functions.GraftFunctions
          .md5Lower53(concat(lit("bq:"), col("doc_id").cast("string")))
          .cast("double").as("skey"))
      .withColumn("rn", row_number().over(byLang))
      .filter(col("rn") <= k)
      .groupBy("lang")
      .agg(sort_array(collect_list("n_chars")).as("v"))
      .select(col("lang"), size(col("v")).cast("long").as("m"),
        element_at(col("v"), expr("CAST((size(v) * 50 + 99) div 100 AS INT)")).as("p50"),
        element_at(col("v"), expr("CAST((size(v) * 90 + 99) div 100 AS INT)")).as("p90"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(base === ref)

    // merge correctness: any partitioning of the input must produce the
    // identical sketch (bottom-k union property)
    val shuffled = Quantiles.sampleQuantilesFrom(docs.repartition(13)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(shuffled === base)
  }

  test("estimates bracket the true median: est_p50 within the exact p25..p75 band per lang") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val est = Quantiles.sampleQuantilesFrom(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val bands = docs.groupBy("lang")
      .agg(expr("percentile(n_chars, 0.25)").as("lo"),
        expr("percentile(n_chars, 0.75)").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    est.foreach { case (lang, p50) =>
      val (lo, hi) = bands(lang)
      assert(p50 >= lo && p50 <= hi,
        s"$lang est_p50 $p50 outside exact [p25, p75] = [$lo, $hi]")
    }
  }
}
