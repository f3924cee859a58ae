package graft

import org.apache.spark.sql.SparkSession

/** The one local-session builder every main shares: local[$SPARK_GRAFT_CPUS],
  * shuffle partitions = cores, UTC, UI off, nanos-as-long for the events
  * table. `extra` adds per-tool configs (warehouse dir, join thresholds). */
object Sessions {
  def local(defaultCpus: String = "4",
            extra: Map[String, String] = Map.empty): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The driver's events.parquet writer has shipped ts as nanos-as-long
      // AND as Timestamp(isAdjustedToUTC=false): without this, the latter
      // reads as TIMESTAMP_NTZ and unix_millis/unix_micros fail analysis
      // (r11 broke q27/q32/q92 this way). Session TZ is UTC, so reading
      // NTZ micros as TimestampType yields identical instants.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // registers graft's custom planner strategies (native as-of join)
      .config("spark.sql.extensions", "graft.GraftExtensions")
    val s = extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
