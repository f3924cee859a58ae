package graft

import org.apache.spark.sql.SparkSession

/** The one local-session builder every main shares: local[$SPARK_GRAFT_CPUS],
  * shuffle partitions = cores, UTC, UI off, nanos-as-long for the events
  * table. `extra` adds per-tool configs (warehouse dir, join thresholds).
  *
  * The default width is the MACHINE's core count (the deployment
  * target is local[32] with shuffle partitions 32), overridable via
  * SPARK_GRAFT_CPUS. It was a hardcoded "4" through r17 — which is the
  * r14→r17 "pair-family creep" the round verdicts chased: benches run
  * from a shell that exported SPARK_GRAFT_CPUS=32 (r14) measured
  * CPU-bound queries ~3.4× faster than benches that didn't (r15–r17),
  * with code, data and output bit-identical (q166 at sf1: 25.0 s at
  * width 32 vs 85.7 s at width 4, measured back-to-back on an idle
  * machine, r18). Deriving the default from the machine removes the
  * env-dependent measurement mode entirely. */
object Sessions {
  def local(defaultCpus: String =
              String.valueOf(Runtime.getRuntime.availableProcessors),
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
