package graft.fraud

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Claims-table schema + IO (reference input contract: app.py:52
  * "Upload a CSV with columns: Name, Aadhaar, ClaimAmount, SubsidyType,
  * Date"; types per SURVEY §1.2).
  *
  * The schema is DECLARED, never inferred (inference = an extra full read
  * pass at 100 TB and nondeterministic typing). Extra columns in the file
  * (e.g. the eval corpus's FraudLabel) are tolerated via a permissive
  * read of the declared superset.
  */
object Claims {
  val schema: StructType = StructType(Seq(
    StructField("Name", StringType),
    StructField("Aadhaar", LongType),
    StructField("ClaimAmount", DoubleType),
    StructField("SubsidyType", StringType),
    StructField("Date", DateType)))

  val schemaWithLabel: StructType =
    StructType(schema.fields :+ StructField("FraudLabel", IntegerType))

  /** CSV scan with declared schema (S1). `withLabel` reads the 6-column
    * eval shape. */
  def readCsv(spark: SparkSession, path: String, withLabel: Boolean = false): DataFrame =
    spark.read
      .option("header", "true")
      .option("dateFormat", "yyyy-MM-dd")
      .option("mode", "PERMISSIVE")
      .schema(if (withLabel) schemaWithLabel else schema)
      .csv(path)

  /** Result sink (S2): single header CSV, matching the reference's
    * to_csv(index=False) (run_pipeline.py:88). `coalesce(1)` is only for
    * the small-file parity mode; at scale, drop it and write partitioned. */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.option("header", "true").mode("overwrite").csv(path)
  }
}
