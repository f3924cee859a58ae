package graft.fraud

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{MLP, Trainer}

/** The hybrid rule+ML pipeline end-to-end (reference: scripts/
  * run_pipeline.py:11-101) as ONE lazy Spark plan with three tiny scalar
  * actions (p99, feature stats / date origin, error mean+2σ) and a final
  * write.
  *
  * Deliberate divergence from the reference (documented, SURVEY §2.7):
  *  - ReconstructionError stays in the row lineage, so it is attached to
  *    the right rows (the reference's positional assignment at
  *    run_pipeline.py:86 misaligns it after the sort at :38).
  *  - One architecture (no output Sigmoid) for both train and score
  *    (§2.7-1 mismatch resolved toward the *trained* net).
  */
final case class FraudModel(params: FeatureParams, net: MLP)

object FraudPipeline {

  /** P10: rule label wins, else ML label, else Normal (run_pipeline.py:
    * 70-78) — shared by the batch and streaming score paths. */
  def combineFraudType: org.apache.spark.sql.Column =
    when(col("RuleFraud") =!= "Normal", col("RuleFraud"))
      .when(col("MLFraud") =!= "Normal", col("MLFraud"))
      .otherwise("Normal")

  /** E3 (train.py): fit features, train the autoencoder on the driver
    * over collected features (30-row reference corpus; sample first at
    * scale — or use Trainer.fitDistributed). */
  def train(spark: SparkSession, claims: DataFrame,
            cfg: Trainer.Config = Trainer.Config()): FraudModel = {
    val params = FeaturePipeline.fit(claims)
    val feats = FeaturePipeline
      .transform(claims, params, fixedOrigin = Some(params.trainDateOrigin))
      .select("features").collect()
      .map(_.getAs[Seq[Double]](0).toArray)
    val net = Trainer.fit(feats, MLP.autoencoderDims(params.featureDim), cfg)
    FraudModel(params, net)
  }

  /** E3 at corpus scale: identical feature fit/transform, but the
    * autoencoder trains with [[Trainer.fitDistributed]] over the
    * feature column AS AN RDD — the corpus never materializes on the
    * driver (the `collect()` in [[train]] is the documented
    * reference-parity path; this is its 100 TB shape). Epoch-loss
    * parity with the driver trainer is pinned by
    * DistributedTrainerParitySpec. */
  def trainDistributed(spark: SparkSession, claims: DataFrame,
                       cfg: Trainer.Config = Trainer.Config(epochs = 200)): FraudModel = {
    val params = FeaturePipeline.fit(claims)
    val feats = FeaturePipeline
      .transform(claims, params, fixedOrigin = Some(params.trainDateOrigin))
      .select("features").rdd
      .map(_.getAs[scala.collection.Seq[Double]](0).toArray)
    val net = Trainer.fitDistributed(feats, MLP.autoencoderDims(params.featureDim), cfg)
    FraudModel(params, net)
  }

  /** Appends `ReconstructionError` by scoring `features` against the
    * broadcast net (one UDF call per row over a ~9K-param model — the
    * only non-codegen expression in the plan, M4/M5). */
  def withReconstructionError(spark: SparkSession, df: DataFrame, net: MLP): DataFrame = {
    val bc = spark.sparkContext.broadcast(net)
    val errUdf = udf { (v: Seq[Double]) => bc.value.reconstructionError(v.toArray) }
    df.withColumn("ReconstructionError", errUdf(col("features")))
  }

  /** E2 (run_pipeline.py): rules + ML score + combine + output schema.
    * Output columns match the golden sink (run_pipeline.py:82-88):
    * Name, Aadhaar, ClaimAmount, SubsidyType, Date(yyyy-MM-dd),
    * ReconstructionError, FraudType. */
  def score(spark: SparkSession, claims: DataFrame, model: FraudModel,
            exactQuantile: Boolean = true,
            preserveInputOrder: Boolean = true): DataFrame =
    scoreWithColumns(spark, claims, model, Seq.empty, exactQuantile, preserveInputOrder)

  /** [[score]] with extra input columns carried through to the output —
    * e.g. the eval corpus's FraudLabel (never a reference feature, so it
    * must bypass the feature/rule path untouched). */
  def scoreWithColumns(spark: SparkSession, claims: DataFrame, model: FraudModel,
            passthrough: Seq[String],
            exactQuantile: Boolean = true,
            preserveInputOrder: Boolean = true): DataFrame = {
    val ruled = RuleEngine.withRuleTags(claims, exactQuantile)
    val feat = FeaturePipeline.transform(ruled, model.params)
    // The threshold pass (M7) recomputes the linear scoring plan rather
    // than caching it: the score path is shuffle-free per row, so one
    // extra pass costs a scan, while caching a 100 TB scored table
    // spills and leaks executor storage across invocations (r1 advice).
    val scored = withReconstructionError(spark, feat, model.net)
    val r: Row = scored.agg(
      avg("ReconstructionError"), stddev_pop("ReconstructionError")).head()
    val thr = r.getDouble(0) + 2.0 * r.getDouble(1) // M7: mean + 2σ (ddof=0)
    val combined = scored
      .withColumn("MLFraud",
        when(col("ReconstructionError") > lit(thr), "Suspicious").otherwise("Normal"))
      .withColumn("FraudType", combineFraudType)
    // pandas-index order parity is a global sort — golden/parity mode
    // only; at scale pass preserveInputOrder = false
    val ordered = if (preserveInputOrder) combined.orderBy("_row_id") else combined
    val outCols = Seq(
      col("Name"), col("Aadhaar"), col("ClaimAmount"), col("SubsidyType"),
      date_format(col("Date"), "yyyy-MM-dd").as("Date"),
      col("ReconstructionError"), col("FraudType")) ++ passthrough.map(col)
    ordered.select(outCols: _*)
  }

  /** train-then-score on the same table — the reference's self-scoring
    * mode (train.py:88-101). */
  def run(spark: SparkSession, claims: DataFrame): DataFrame =
    score(spark, claims, train(spark, claims))
}
