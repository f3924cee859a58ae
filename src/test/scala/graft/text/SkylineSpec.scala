package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q178 Pareto frontier: brute-force equality, dominance coverage of
  * the rejected set, and the zero-shuffle plan shape. */
class SkylineSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def criteria(): Map[Long, (Long, Long, Long)] = {
    val spark = SparkSpec.spark
    graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "text", "n_chars").collect()
      .map { r =>
        val toks = r.getString(1).trim.split("\\s+").toSeq
        r.getLong(0) -> ((r.getLong(2), toks.distinct.size.toLong,
          (toks.size - toks.distinct.size).toLong))
      }.toMap
  }

  private def dom(b: (Long, Long, Long), a: (Long, Long, Long)): Boolean =
    b._1 >= a._1 && b._2 >= a._2 && b._3 <= a._3 &&
      (b._1 > a._1 || b._2 > a._2 || b._3 < a._3)

  test("paretoFrontier equals the brute-force O(n^2) skyline (sf0.01)") {
    val spark = SparkSpec.spark
    val crit = criteria()
    val truth = crit.filter { case (_, a) =>
      !crit.values.exists(b => dom(b, a))
    }.keySet
    val got = CorpusOps.paretoFrontier(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === truth)
    // the frontier must be a real selection: non-empty and non-total
    assert(got.nonEmpty && got.size < crit.size)
  }

  test("every rejected doc is dominated by some frontier doc") {
    val spark = SparkSpec.spark
    val crit = criteria()
    val sky = CorpusOps.paretoFrontier(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val skyVecs = sky.toSeq.map(crit)
    crit.foreach { case (id, v) =>
      if (!sky(id))
        assert(skyVecs.exists(b => dom(b, v)), s"doc $id rejected but undominated")
    }
  }

  test("plan: no shuffle exchange anywhere — scan+prune once, broadcast merge") {
    val spark = SparkSpec.spark
    val plan = CorpusOps.paretoFrontier(spark, dir).queryExecution.executedPlan
    val s = plan.toString
    assert(!s.contains("ShuffleExchange"), s"unexpected shuffle:\n$s")
    assert(s.contains("BroadcastNestedLoopJoin") && s.contains("LeftAnti"), s)
  }
}
