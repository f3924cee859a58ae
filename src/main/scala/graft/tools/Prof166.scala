package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profile + A/B of q166's prefix-filter join at a given
  * SF dir: current shape (t-prefix both sides, distinct, re-scan
  * verify) vs the PPJoin upgrade (one checkpointed ranked projection,
  * asymmetric 2t/(1+t) index prefix, positional filter, verify over
  * the checkpointed arrays).
  *
  * Usage: runMain graft.tools.Prof166 [sfDir] [current|ppjoin|both]
  */
object Prof166 {
  val Num = graft.dedup.DedupQueries.PrefixJacNum
  val Den = graft.dedup.DedupQueries.PrefixJacDen

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/repo/scaledata/sf1"
    val mode = if (args.length > 1) args(1) else "both"
    val s = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("prof166").getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    if (mode == "current" || mode == "both") {
      val t = System.nanoTime
      val n = graft.dedup.DedupQueries.prefixFilterPairs(s, d).count()
      println(f"CURRENT q166: $n rows in ${(System.nanoTime - t) / 1e9}%.2f s")
    }

    if (mode == "ppjoin" || mode == "both") {
      val t0 = System.nanoTime
      val shs = graft.ops.Tables.documents(s, d).select(col("doc_id"),
        graft.functions.GraftFunctions.shingleHashes(col("text"),
          graft.dedup.DedupQueries.ShingleN).as("hs"))
      val ex = shs.select(col("doc_id"), explode(col("hs")).as("x"))
      val freq = ex.groupBy("x").agg(count(lit(1)).as("df"))
      val ranked = ex.join(freq, "x")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("x")))).as("ord"))
        .select(col("doc_id"),
          expr("transform(ord, o -> o.x)").as("hs_ord"),
          size(col("ord")).as("sz"))
        .withColumn("p", expr(
          s"sz - CAST((sz * $Num + $Den - 1) div $Den AS INT) + 1"))
        // index prefix: sz - ceil(2t/(1+t) * sz) + 1 with t = Num/Den
        // 2t/(1+t) = 2*Num / (Num + Den)
        .withColumn("pi", expr(
          s"sz - CAST((sz * ${2 * Num} + ${Num + Den} - 1) div ${Num + Den} AS INT) + 1"))
        .localCheckpoint(true)
      println(f"ranked+ckpt: ${(System.nanoTime - t0) / 1e9}%.2f s")

      val t1 = System.nanoTime
      val idx = ranked.select(col("doc_id"), col("sz"), col("pi"),
        posexplode(expr("slice(hs_ord, 1, p)")).as(Seq("pos", "x")))
      val cand = idx.as("a").join(idx.as("b"),
          col("a.x") === col("b.x") &&
            // role: a = probe (bigger), b = indexed (smaller), b within index prefix
            (col("a.sz") > col("b.sz") ||
              (col("a.sz") === col("b.sz") && col("a.doc_id") > col("b.doc_id"))) &&
            col("b.pos") < col("b.pi") &&
            // length filter: sz_b >= t * sz_a
            col("b.sz") * Den >= col("a.sz") * Num &&
            // positional filter (first-match row always passes)
            (least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos"))) *
              (Num + Den) >= (col("a.sz") + col("b.sz")) * Num)
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct()
      val nc = cand.count()
      println(f"ppjoin cand: $nc in ${(System.nanoTime - t1) / 1e9}%.2f s")

      val t2 = System.nanoTime
      val out = cand
        .join(ranked.select(col("doc_id").as("doc_a"), col("hs_ord").as("ha")), "doc_a")
        .join(ranked.select(col("doc_id").as("doc_b"), col("hs_ord").as("hb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ha"), col("hb"))).cast("long").as("i"),
          (size(col("ha")) + size(col("hb"))).cast("long").as("ab"))
        .select(col("doc_a"), col("doc_b"), col("i"), (col("ab") - col("i")).as("u"))
        .where(col("i") * Den >= col("u") * Num)
        .select(col("doc_a"), col("doc_b"),
          expr("CAST((i * 10000 + u div 2) div u AS BIGINT)").as("jx"))
      val n = out.count()
      println(f"PPJOIN q166: $n rows, verify ${(System.nanoTime - t2) / 1e9}%.2f s, " +
        f"total ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
