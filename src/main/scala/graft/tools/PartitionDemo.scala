package graft.tools

import org.apache.spark.sql.functions._

/** Demonstrates partition pruning — the other half of the 100 TB scan
  * story next to pushed filters: data laid out as
  * `lang=<value>/part-*.parquet` lets a `lang = 'de'` predicate skip
  * whole directories at PLANNING time (PartitionFilters in the scan
  * node), so the query reads 1/5 of the corpus without opening a
  * single skipped file.
  *
  * Usage: runMain graft.tools.PartitionDemo [sfDir] [outDir]
  */
object PartitionDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-part").toString + "/docs"
    val spark = graft.Sessions.local()

    graft.ops.Tables.documents(spark, sfDir)
      .write.mode("overwrite").partitionBy("lang").parquet(out)

    val q = spark.read.parquet(out).filter(col("lang") === "de")
      .select("doc_id", "n_chars")
    q.explain()
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    val pruned = scan.contains("PartitionFilters") && scan.contains("lang")
    val n = q.count()
    val total = spark.read.parquet(out).count()
    println(s"partition filter present: $pruned; read $n of $total rows")
    require(pruned, "expected a PartitionFilters entry on the scan")
    require(n > 0 && n < total)
    spark.stop()
  }
}
