package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.fraud.{Claims, FeaturePipeline, FraudModel, FraudPipeline, StatusProtocol}
import graft.ml.PtWeights

/** Precision/recall evaluation on the reference's labeled corpus
  * (`simulated_subsidy_claims_10k.csv`, 11,700 rows, FraudLabel column
  * that the reference itself never reads — SURVEY §5). Replicates the
  * reference's DEPLOYED inference path: feature params fitted on
  * train.csv, the published trained weights from fraud_autoencoder.pt
  * (with the inference net's Sigmoid output, model_def.py:27), scored
  * over the labeled file, FraudType != 'Normal' vs FraudLabel.
  *
  * Usage: runMain graft.tools.FraudEval [refDir] [outJson]
  */
object FraudEval {
  def main(args: Array[String]): Unit = {
    val refDir = if (args.length > 0) args(0) else "/root/reference"
    val outJson = if (args.length > 1) args(1) else "EVAL.json"
    val spark = graft.Sessions.local(
      defaultCpus = Runtime.getRuntime.availableProcessors().toString)

    StatusProtocol.withStatus("pipeline_status.txt") {
      val train = Claims.readCsv(spark, s"$refDir/data/raw/train.csv")
      val model = FraudModel(
        FeaturePipeline.fit(train),
        PtWeights.loadAutoencoder(s"$refDir/models/fraud_autoencoder.pt"))
      val labeled = Claims.readCsv(
        spark, s"$refDir/data/raw/simulated_subsidy_claims_10k.csv", withLabel = true)
      val withLabels = FraudPipeline.scoreWithColumns(
          spark, labeled, model, Seq("FraudLabel"), preserveInputOrder = false)
        .withColumn("pred", (col("FraudType") =!= "Normal").cast("int"))
      val m = withLabels.agg(
        sum(when(col("pred") === 1 && col("FraudLabel") === 1, 1).otherwise(0)).as("tp"),
        sum(when(col("pred") === 1 && col("FraudLabel") === 0, 1).otherwise(0)).as("fp"),
        sum(when(col("pred") === 0 && col("FraudLabel") === 1, 1).otherwise(0)).as("fn"),
        count(lit(1)).as("n")).head()
      val (tp, fp, fn, n) = (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3))
      val precision = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
      val recall = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
      val f1 = if (precision + recall == 0) 0.0
        else 2 * precision * recall / (precision + recall)
      val json =
        s"""{"n":$n,"tp":$tp,"fp":$fp,"fn":$fn,"precision":$precision,"recall":$recall,"f1":$f1}"""
      Files.writeString(Paths.get(outJson), json)
      println(json)
    }
    spark.stop()
  }
}
