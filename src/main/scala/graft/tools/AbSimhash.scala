package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions

/** Measurement harness behind the r14 q62 rewrite: times the retired
  * r13 pair shape (blk-array keys + pair-grain distinct) against the
  * generalized packed-key emit-once shape at B=4 and B=5 in one JVM —
  * the A/B whose numbers set [[graft.dedup.DedupQueries
  * .pigeonholeBlocks]]'s thresholds (PERF_NOTES r14). Kept runnable so
  * the thresholds stay re-measurable when the corpus shape changes:
  * `SPARK_GRAFT_SF_DIR=scaledata/sf1 sbt "runMain graft.tools.AbSimhash"`. */
object AbSimhash {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scaledata/sf1")
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=$n")
    }
    // warm the file cache / codegen
    graft.ops.Tables.documents(s, d).count()

    time("old r13 shape") {
      val fp = graft.ops.Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.simHashBlocks(col("text")).as("blk"))
        .select(col("doc_id"),
          expr("shiftleft(CAST(blk[3] AS BIGINT), 48) | shiftleft(CAST(blk[2] AS BIGINT), 32) | " +
            "shiftleft(CAST(blk[1] AS BIGINT), 16) | CAST(blk[0] AS BIGINT)").as("simhash"),
          col("blk"))
        .localCheckpoint(true)
      val blocks = fp.select(col("doc_id"), col("simhash"),
        posexplode(col("blk")).as(Seq("bi", "bv")))
      blocks.as("a")
        .join(blocks.as("b"),
          col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .count()
    }
    time("new B=4") {
      graft.dedup.DedupQueries.simHashPairsBlocked(s, d, 3, 4).count()
    }
    time("new B=5") {
      graft.dedup.DedupQueries.simHashPairsBlocked(s, d, 3, 5).count()
    }
    s.stop()
  }
}
