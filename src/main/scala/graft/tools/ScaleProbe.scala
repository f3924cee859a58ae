package graft.tools

import org.apache.spark.sql.functions._

/** One-off cardinality/timing probes for scale-ratio triage: prints the
  * row counts of the intermediate frames a suspicious query's cost
  * model depends on, so a super-linear bench ratio can be attributed
  * to data growth vs plan pathology.
  *
  * Usage: runMain graft.tools.ScaleProbe <probe> <sfDir>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val Array(probe, sfDir) = args.take(2)
    val spark = graft.Sessions.local()
    probe match {
      case "pr" =>
        val t0 = System.nanoTime()
        val pairs = graft.dedup.DedupQueries.minHashJaccardPairs(spark, sfDir)
          .select("doc_a", "doc_b").localCheckpoint(true)
        val nPairs = pairs.count()
        val t1 = System.nanoTime()
        println(f"[probe] q19 pairs: $nPairs%d rows in ${(t1 - t0) / 1e9}%.1f s ($sfDir)")
        // one pageRank round over the checkpointed edges, timed alone
        val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        val edgesDeg = edges.join(deg, "src").localCheckpoint(true)
        println(s"[probe] edges (doubled): ${edgesDeg.count()}")
        val docs = graft.ops.Tables.documents(spark, sfDir).select("doc_id")
          .localCheckpoint(true)
        var pr = docs.select(col("doc_id"), lit(1000000L).as("pr"))
          .localCheckpoint(true)
        val t2 = System.nanoTime()
        for (i <- 1 to 3) {
          val contrib = edgesDeg
            .join(pr.withColumnRenamed("doc_id", "src"), "src")
            .select(col("dst"), expr("pr * 85 div (100 * deg)").as("c"))
            .groupBy("dst").agg(sum("c").as("in_mass"))
          pr = docs.join(contrib.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
            .select(col("doc_id"), coalesce(col("in_mass"), lit(0L)).as("pr"))
            .localCheckpoint(true)
          println(f"[probe] round $i done at ${(System.nanoTime() - t2) / 1e9}%.1f s")
        }
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
