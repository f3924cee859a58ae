package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q180 k-core peeling: driver-side peel-to-fixpoint equality — which
  * also proves the fixed round budget is sufficient on real data. */
class KCoreSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("kcoreBipartite equals the peel-until-stable fixpoint (sf0.01)") {
    val spark = SparkSpec.spark
    var edges = graft.ops.Tables.lineitem(spark, dir)
      .filter(org.apache.spark.sql.functions.col("l_quantity") <= DedupQueries.BfsMaxQty)
      .join(graft.ops.Tables.orders(spark, dir),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // peel to fixpoint, counting rounds
    var rounds = 0
    var stable = false
    while (!stable) {
      val dc = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
      val ds = edges.groupBy(_._2).map { case (k, v) => k -> v.size }
      val next = edges.filter { case (c, s) =>
        dc(c) >= DedupQueries.KCoreK && ds(s) >= DedupQueries.KCoreK
      }
      stable = next == edges
      if (!stable) { edges = next; rounds += 1 }
    }
    assert(rounds <= DedupQueries.KCoreRounds,
      s"fixpoint needs $rounds rounds > budget ${DedupQueries.KCoreRounds}")

    val truth =
      edges.groupBy(_._1).map { case (c, v) => ("C", c) -> v.size.toLong } ++
        edges.groupBy(_._2).map { case (s, v) => ("S", s) -> v.size.toLong }
    val got = DedupQueries.kcoreBipartite(spark, dir).collect()
      .map(r => (r.getAs[String]("typ"), r.getAs[Long]("node_id")) ->
        r.getAs[Long]("core_deg")).toMap
    assert(got === truth)
    // invariant: every core member keeps >= K within-core neighbors
    assert(got.values.forall(_ >= DedupQueries.KCoreK))
    assert(got.nonEmpty && got.exists(_._1._1 == "C") && got.exists(_._1._1 == "S"))
  }
}
