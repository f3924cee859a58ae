package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q179 multi-source BFS: brute-force min-hop equality and structural
  * sanity of the hop distances. */
class BfsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("bfsDepth equals driver-side BFS over the collected graph (sf0.01)") {
    val spark = SparkSpec.spark
    val edges = graft.ops.Tables.lineitem(spark, dir)
      .filter(org.apache.spark.sql.functions.col("l_quantity") <= DedupQueries.BfsMaxQty)
      .join(graft.ops.Tables.orders(spark, dir),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val custAdj = edges.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    val suppAdj = edges.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._1).toSet }
    val seeds = graft.ops.Tables.customer(spark, dir)
      .filter(org.apache.spark.sql.functions.col("c_custkey") % DedupQueries.BfsSeedStride === 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet

    // driver BFS over (typ, id) nodes
    val truth = scala.collection.mutable.Map[(String, Long), Long]()
    seeds.foreach(c => truth(("C", c)) = 0L)
    var frontier: Set[(String, Long)] = seeds.map("C" -> _)
    for (depth <- 1 to DedupQueries.BfsMaxDepth) {
      val next = frontier.flatMap {
        case ("C", c) => custAdj.getOrElse(c, Set.empty).map("S" -> _)
        case ("S", s) => suppAdj.getOrElse(s, Set.empty).map("C" -> _)
      }.filterNot(truth.contains)
      next.foreach(n => truth(n) = depth.toLong)
      frontier = next
    }

    val got = DedupQueries.bfsDepth(spark, dir).collect()
      .map(r => (r.getAs[String]("typ"), r.getAs[Long]("node_id")) -> r.getAs[Long]("dist"))
      .toMap
    assert(got === truth.toMap)
    // the hop histogram must exercise every depth (graph is sparse
    // enough that depth > 2 actually occurs on the driver corpus)
    assert(got.values.toSet === (0L to DedupQueries.BfsMaxDepth.toLong).toSet)
  }

  test("bipartite parity: customers at even dist, suppliers at odd dist") {
    val spark = SparkSpec.spark
    DedupQueries.bfsDepth(spark, dir).collect().foreach { r =>
      val even = r.getAs[Long]("dist") % 2 == 0
      assert(even == (r.getAs[String]("typ") == "C"), r.toString)
    }
  }
}
