package graft.tools

import org.apache.spark.sql.functions._

import graft.dedup.DedupQueries.{PrefixJacNum, PrefixJacDen, ShingleN}
import graft.ops.Tables

/** Scratch stage-level profiler for the q166 creep investigation:
  * times each phase of prefixFilterPairs separately at the given SF
  * so the r14→r17 drift can be attributed to a phase, not guessed. */
object Q166Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("scaledata/sf1")
    val s = graft.Sessions.local()
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val shs = Tables.documents(s, d).select(col("doc_id"),
      graft.functions.GraftFunctions.shingleHashes(col("text"), ShingleN).as("hs"))
    val ex = shs.select(col("doc_id"), explode(col("hs")).as("x"))
    val freq = t("freq (shingle+explode+groupBy)") {
      val f = ex.groupBy("x").agg(count(lit(1)).as("df")).localCheckpoint(true)
      println("  freq rows: " + f.count()); f
    }
    val ranked = t("ranked (join+collect_list+sort+checkpoint)") {
      ex.join(freq, "x")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("x")))).as("ord"))
        .select(col("doc_id"),
          expr("transform(ord, o -> o.x)").as("hs_ord"),
          size(col("ord")).as("sz"))
        .withColumn("p", expr(
          s"sz - CAST((sz * $PrefixJacNum + $PrefixJacDen - 1) div $PrefixJacDen AS INT) + 1"))
        .withColumn("pi", expr(
          s"sz - CAST((sz * ${2 * PrefixJacNum} + ${PrefixJacNum + PrefixJacDen} - 1) " +
            s"div ${PrefixJacNum + PrefixJacDen} AS INT) + 1"))
        .localCheckpoint(true)
    }
    val idx = ranked.select(col("doc_id"), col("sz"), col("pi"),
      posexplode(expr("slice(hs_ord, 1, p)")).as(Seq("pos", "x")))
    val cand = t("cand (index self-join + distinct)") {
      val c = idx.as("a").join(idx.as("b"),
          col("a.x") === col("b.x") &&
            (col("a.sz") > col("b.sz") ||
              (col("a.sz") === col("b.sz") && col("a.doc_id") > col("b.doc_id"))) &&
            col("b.pos") < col("b.pi") &&
            col("b.sz") * PrefixJacDen >= col("a.sz") * PrefixJacNum &&
            least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos")) *
              (PrefixJacNum + PrefixJacDen) >=
              (col("a.sz") + col("b.sz")) * PrefixJacNum)
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct().localCheckpoint(true)
      println("  cand rows: " + c.count()); c
    }
    t("verify (two joins + intersect)") {
      val n = cand
        .join(ranked.select(col("doc_id").as("doc_a"), col("hs_ord").as("ha")), "doc_a")
        .join(ranked.select(col("doc_id").as("doc_b"), col("hs_ord").as("hb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ha"), col("hb"))).cast("long").as("i"),
          (size(col("ha")) + size(col("hb"))).cast("long").as("ab"))
        .select(col("doc_a"), col("doc_b"), col("i"), (col("ab") - col("i")).as("u"))
        .where(col("i") * PrefixJacDen >= col("u") * PrefixJacNum)
        .count()
      println("  verified rows: " + n)
    }
    s.stop()
  }
}
