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
      // registers graft's custom planner strategies (native as-of join)
      .config("spark.sql.extensions", "graft.GraftExtensions")
    val s = extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
