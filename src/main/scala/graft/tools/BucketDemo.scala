package graft.tools

import org.apache.spark.sql.functions._

/** Demonstrates the co-located join design for repeated big-big joins
  * (SURVEY §4 / the 100 TB checklist: "co-locate joins via bucketing"):
  * write both sides bucketed + sorted on the join key, and the
  * sort-merge join needs NO Exchange and NO per-query Sort — the
  * shuffle is paid once at write time and amortized over every
  * subsequent join, which is the right trade for fact tables joined
  * daily at 100 TB.
  *
  * Usage: runMain graft.tools.BucketDemo [sfDir] [warehouseDir]
  * Prints both plans and asserts the bucketed plan is exchange-free
  * with identical results.
  */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val wh = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = graft.Sessions.local(extra = Map(
      "spark.sql.warehouse.dir" -> wh,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) // force SMJ to expose the exchange
    import graft.ops.Tables

    val nBuckets = 8
    Tables.orders(spark, sfDir).write.mode("overwrite")
      .bucketBy(nBuckets, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    Tables.customer(spark, sfDir).write.mode("overwrite")
      .bucketBy(nBuckets, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")

    val plain = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val bucketed = spark.table("orders_b")
      .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))

    println("=== plain join plan (exchanges expected) ===")
    plain.explain()
    println("=== bucketed join plan (no exchange before the join) ===")
    bucketed.explain()

    val planStr = bucketed.queryExecution.executedPlan.toString
    val joinSection = planStr.split("HashAggregate")(planStr.split("HashAggregate").length - 1)
    val exchangesInJoin = joinSection.linesIterator.count(_.contains("Exchange"))
    val same = plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    println(s"results identical: $same; exchanges below the final aggregate: $exchangesInJoin")
    require(same, "bucketed join changed results")
    require(exchangesInJoin == 0,
      s"expected an exchange-free join from bucketing, saw $exchangesInJoin")
    spark.stop()
  }
}
