package graft.fraud

import java.nio.file.{Files, Paths}
import scala.collection.JavaConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ml.PtWeights

/** Golden-parity suite against the reference's committed output
  * (reference data/results/fraud_results.csv — the run of
  * scripts/run_pipeline.py on data/raw/uploaded_subsidy_claims.csv).
  *
  * FraudType must match row-for-row IN ORIGINAL ORDER. The reference's
  * published ReconstructionError column is positionally misaligned
  * (SURVEY §2.7-2), so errors are compared as a sorted multiset, and
  * only for the imported-weights run (self-trained nets converge to
  * different minima).
  */
class FraudGoldenSpec extends AnyFunSuite {
  private val refDir = "/root/reference"
  private val goldenCsv = s"$refDir/data/results/fraud_results.csv"
  private val uploadCsv = s"$refDir/data/raw/uploaded_subsidy_claims.csv"

  private lazy val golden: Seq[Array[String]] =
    Files.readAllLines(Paths.get(goldenCsv)).asScala.toSeq.drop(1)
      .map(_.split(","))

  private def goldenFraudTypes: Seq[String] = golden.map(_.last.trim)

  test("self-trained pipeline reproduces golden FraudType in original order") {
    val spark = SparkSpec.spark
    val claims = Claims.readCsv(spark, uploadCsv)
    val result = FraudPipeline.run(spark, claims)
      .select("FraudType").collect().map(_.getString(0)).toSeq
    assert(result.length === goldenFraudTypes.length)
    assert(result === goldenFraudTypes)
  }

  test("imported reference weights (sigmoid inference net) reproduce golden FraudType") {
    val spark = SparkSpec.spark
    val claims = Claims.readCsv(spark, uploadCsv)
    val model = FraudModel(
      FeaturePipeline.fit(Claims.readCsv(spark, s"$refDir/data/raw/train.csv")),
      PtWeights.loadAutoencoder(s"$refDir/models/fraud_autoencoder.pt"))
    val rows = FraudPipeline.score(spark, claims, model)
      .select("FraudType", "ReconstructionError").collect()
    assert(rows.map(_.getString(0)).toSeq === goldenFraudTypes)
    // errors: reference column is row-misaligned → compare sorted sets,
    // fp32 torch vs fp64 here → tolerance
    val ourErrs = rows.map(_.getDouble(1)).sorted
    val goldErrs = golden.map(r => r(r.length - 2).toDouble).sorted.toArray
    ourErrs.zip(goldErrs).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-4 * math.max(1.0, math.abs(b)),
        s"sorted reconstruction errors diverge: $a vs $b")
    }
  }

  test("feature params fitted on train.csv match the reference scaler semantics") {
    val spark = SparkSpec.spark
    val p = FeaturePipeline.fit(Claims.readCsv(spark, s"$refDir/data/raw/train.csv"))
    // categories are the lexicographically-sorted train.csv SubsidyTypes
    // (reference models/encoder.pkl: Education, Farming, Housing, LPG)
    assert(p.categories == Seq("Education", "Farming", "Housing", "LPG"))
    assert(p.featureDim === 6)
    assert(p.trainDateOrigin.toString === "2025-07-01") // SURVEY §2.7-3
  }

  test("S5 status protocol writes success/failed") {
    val dir = Files.createTempDirectory("status")
    val ok = s"$dir/ok.txt"
    assert(StatusProtocol.withStatus(ok)(42) === 42)
    assert(Files.readString(Paths.get(ok)) === "success")
    val bad = s"$dir/bad.txt"
    intercept[RuntimeException] {
      StatusProtocol.withStatus(bad)(throw new RuntimeException("boom"))
    }
    assert(Files.readString(Paths.get(bad)) === "failed")
  }
}
