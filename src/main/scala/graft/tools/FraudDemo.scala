package graft.tools


import graft.fraud.{Claims, FraudPipeline, StatusProtocol}

/** End-to-end demo of the fraud library on a claims CSV: train on the
  * file, score it, write the golden-shaped result CSV, print a summary.
  *
  * Usage: runMain graft.tools.FraudDemo <claims.csv> <outDir>
  */
object FraudDemo {
  def main(args: Array[String]): Unit = {
    val Array(csv, outDir) = args.take(2)
    val spark = graft.Sessions.local(
      defaultCpus = Runtime.getRuntime.availableProcessors().toString)

    // S5: the reference's status-file contract — fixed name in the
    // working directory, as app.py polls it (run_pipeline.py:91-101)
    StatusProtocol.withStatus("pipeline_status.txt") {
      val claims = Claims.readCsv(spark, csv)
      val result = FraudPipeline.run(spark, claims)
      Claims.writeCsv(result, outDir)
      result.groupBy("FraudType").count().orderBy("FraudType").show(50, false)
      result.show(40, false)
    }
    spark.stop()
  }
}
