package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q183 personalized PageRank: driver-side integer replay equality and
  * seed-mass structure. */
class PprSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("pprSeeds equals the driver-side integer-arithmetic replay (sf0.01)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val edges = graft.ops.Tables.lineitem(spark, dir)
      .filter(col("l_quantity") <= DedupQueries.BfsMaxQty)
      .join(graft.ops.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val custs = graft.ops.Tables.customer(spark, dir)
      .select("c_custkey").collect().map(_.getLong(0))
    val supps = graft.ops.Tables.supplier(spark, dir)
      .select("s_suppkey").collect().map(_.getLong(0))
    val degC = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val degS = edges.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    // directed edges with src out-degree
    val dEdges =
      edges.map { case (c, s) => (("C", c), ("S", s), degC(c)) } ++
        edges.map { case (c, s) => (("S", s), ("C", c), degS(s)) }
    val nodes: Seq[(String, Long)] =
      custs.map(("C", _)).toSeq ++ supps.map(("S", _)).toSeq
    val seeds = custs.filter(_ % DedupQueries.BfsSeedStride == 0).toSet
    def isSeed(n: (String, Long)) = n._1 == "C" && seeds(n._2)
    val ns = seeds.size.toLong
    val scale = DedupQueries.PrScale
    val (num, den) = (DedupQueries.PrDampNum, DedupQueries.PrDampDen)
    val base = (scale * (den - num) / den) / ns
    var pr: Map[(String, Long), Long] =
      nodes.map(n => n -> (if (isSeed(n)) scale / ns else 0L)).toMap
    for (_ <- 1 to DedupQueries.PprIters) {
      val in = scala.collection.mutable.Map[(String, Long), Long]().withDefaultValue(0L)
      dEdges.foreach { case (src, dst, deg) =>
        in(dst) += pr(src) * num / (den * deg)
      }
      pr = nodes.map(n => n -> ((if (isSeed(n)) base else 0L) + in(n))).toMap
    }
    val truth = pr.filter(_._2 > 0)
    val got = DedupQueries.pprSeeds(spark, dir).collect()
      .map(r => (r.getAs[String]("typ"), r.getAs[Long]("node_id")) ->
        r.getAs[Long]("ppr_x1e12")).toMap
    assert(got === truth)
    // every seed holds at least its own teleport mass; the walk must
    // also have spread positive mass beyond the seed set
    assert(seeds.forall(c => got.getOrElse(("C", c), 0L) >= base))
    assert(got.keys.exists(n => !isSeed(n)))
  }
}
