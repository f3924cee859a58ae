package graft.ml

import org.apache.spark.sql.SparkSession

/** Model-artifact persistence for the net (SURVEY §2.1 S4 — the
  * reference persists its net with torch.save at train.py:84 and reloads
  * it every inference run at run_pipeline.py:59). Stored as one parquet
  * row (dims, flattened row-major weights, outputSigmoid) — transparent
  * and readable from any engine, mirroring FeaturePipeline's params
  * pattern rather than an opaque binary. */
object MLPStore {

  def save(spark: SparkSession, mlp: MLP, path: String): Unit = {
    import spark.implicits._
    Seq((mlp.dims.toSeq, MLP.toFlat(mlp).toSeq, mlp.outputSigmoid))
      .toDF("dims", "weights", "outputSigmoid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): MLP = {
    val r = spark.read.parquet(path).head()
    MLP.fromFlat(
      r.getAs[scala.collection.Seq[Int]]("dims").toArray,
      r.getAs[scala.collection.Seq[Double]]("weights").toArray,
      r.getAs[Boolean]("outputSigmoid"))
  }
}
