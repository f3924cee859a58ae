package graft.fraud

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** sklearn-exactness of the feature math (SURVEY §2.6 M1-M3): category
  * order, unknown handling, ddof, zero-variance guard, origin pinning. */
class FeaturePipelineSpec extends AnyFunSuite {

  private def claims(rows: Seq[(String, Long, Double, String, String)]) = {
    val spark = SparkSpec.spark
    import spark.implicits._
    rows.toDF("Name", "Aadhaar", "ClaimAmount", "SubsidyType", "DateStr")
      .withColumn("Date", to_date(col("DateStr"), "yyyy-MM-dd")).drop("DateStr")
  }

  test("categories sort lexicographically; unknown category encodes all-zeros") {
    val spark = SparkSpec.spark
    val train = claims(Seq(
      ("a", 1L, 100.0, "LPG", "2025-07-01"),
      ("b", 2L, 200.0, "Education", "2025-07-02"),
      ("c", 3L, 300.0, "Farming", "2025-07-03")))
    val p = FeaturePipeline.fit(train)
    assert(p.categories == Seq("Education", "Farming", "LPG"))
    val scoreDf = claims(Seq(("x", 9L, 100.0, "Yachts", "2025-07-01")))
    val feats = FeaturePipeline.transform(scoreDf, p, Some(p.trainDateOrigin))
      .select("features").head().getSeq[Double](0)
    assert(feats.length === 5) // 2 scaled + 3 one-hot
    assert(feats.drop(2) == Seq(0.0, 0.0, 0.0)) // unknown → all zeros
  }

  test("z-scaling uses population std (ddof=0), matching numpy/sklearn") {
    val df = claims(Seq(
      ("a", 1L, 10.0, "LPG", "2025-07-01"),
      ("b", 2L, 20.0, "LPG", "2025-07-01"),
      ("c", 3L, 30.0, "LPG", "2025-07-01")))
    val p = FeaturePipeline.fit(df)
    // mean 20, std_pop = sqrt(200/3) ≈ 8.164966 (ddof=1 would be 10)
    assert(math.abs(p.amountStd - math.sqrt(200.0 / 3)) < 1e-12)
    val z = FeaturePipeline.transform(df, p, Some(p.trainDateOrigin))
      .select(col("features")(0)).collect().map(_.getDouble(0))
    assert(math.abs(z(2) - (30.0 - 20.0) / math.sqrt(200.0 / 3)) < 1e-12)
  }

  test("zero-variance feature scales by 1.0 (sklearn guard), not NaN") {
    val df = claims(Seq(
      ("a", 1L, 50.0, "LPG", "2025-07-01"),
      ("b", 2L, 50.0, "LPG", "2025-07-01")))
    val p = FeaturePipeline.fit(df)
    assert(p.amountStd === 1.0 && p.daysStd === 1.0)
    val feats = FeaturePipeline.transform(df, p, Some(p.trainDateOrigin))
      .select("features").head().getSeq[Double](0)
    assert(feats.forall(v => !v.isNaN))
  }

  test("date origin: dataset-relative by default, pinnable for train parity") {
    val train = claims(Seq(("a", 1L, 1.0, "LPG", "2025-07-01")))
    val p = FeaturePipeline.fit(train)
    val later = claims(Seq(("b", 2L, 1.0, "LPG", "2025-08-01")))
    val relative = FeaturePipeline.transform(later, p)
      .select(col("features")(1)).head().getDouble(0)
    val pinned = FeaturePipeline.transform(later, p, Some(p.trainDateOrigin))
      .select(col("features")(1)).head().getDouble(0)
    // relative: days since 2025-08-01 = 0; pinned: 31 days since 2025-07-01
    assert(relative === (0.0 - p.daysMean) / p.daysStd)
    assert(pinned === (31.0 - p.daysMean) / p.daysStd)
  }

  test("params parquet round-trip") {
    val spark = SparkSpec.spark
    val p = FeaturePipeline.fit(claims(Seq(
      ("a", 1L, 10.0, "LPG", "2025-07-01"),
      ("b", 2L, 99.0, "Farming", "2025-07-09"))))
    val dir = java.nio.file.Files.createTempDirectory("fp").toString + "/params"
    FeaturePipeline.save(spark, p, dir)
    assert(FeaturePipeline.load(spark, dir) === p)
  }
}
