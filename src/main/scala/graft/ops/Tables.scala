package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish corpus (see TESTDATA.md).
  *
  * All correctness queries read these parquet tables so that filters and
  * projections push into the vectorized parquet scan (check `.explain`:
  * `PushedFilters`, `ReadSchema`). At 100 TB these would be partitioned
  * tables; the access pattern (scan → prune → push) is identical.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** The driver has regenerated events.parquet with two different `ts`
    * physical types across rounds; normalize BOTH to TimestampType so
    * every consumer (unix_millis/unix_micros in q27/q32/q92 included)
    * is robust to either writer:
    *  - TIMESTAMP(NANOS) → read as long (nanosAsLong=true in every
    *    session builder), integer-divided to micros — matching DuckDB's
    *    nanos→micros truncation;
    *  - Timestamp(isAdjustedToUTC=false, µs) → TIMESTAMP_NTZ when NTZ
    *    inference is on (it is off in Sessions.local, but a caller-built
    *    session may differ) → cast, identical instants under UTC TZ. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
