package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q184 deterministic random walks: driver-side md5-argmin replay
  * equality and trajectory structure. */
class RandomWalkSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("randomWalks equals the driver-side md5-argmin replay (sf0.01)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val edges = graft.ops.Tables.lineitem(spark, dir)
      .filter(col("l_quantity") <= DedupQueries.BfsMaxQty)
      .join(graft.ops.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val custAdj = edges.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val suppAdj = edges.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._1) }
    val seeds = graft.ops.Tables.customer(spark, dir)
      .filter(col("c_custkey") % DedupQueries.BfsSeedStride === 0)
      .select("c_custkey").collect().map(_.getLong(0))

    val truth = scala.collection.mutable.Set[(Long, Long, String, Long)]()
    seeds.foreach { w =>
      var cur: (String, Long) = ("C", w)
      truth += ((w, 0L, "C", w))
      var halted = false
      for (t <- 1 to DedupQueries.WalkLen if !halted) {
        val nbrs: Seq[(String, Long)] = cur match {
          case ("C", c) => custAdj.getOrElse(c, Array.empty[Long]).toSeq.map("S" -> _)
          case (_, s)   => suppAdj.getOrElse(s, Array.empty[Long]).toSeq.map("C" -> _)
        }
        if (nbrs.isEmpty) halted = true
        else {
          cur = nbrs.minBy { case (ty, n) => (md5hex(s"$w:$t:$ty:$n"), ty, n) }
          truth += ((w, t.toLong, cur._1, cur._2))
        }
      }
    }

    val got = DedupQueries.randomWalks(spark, dir).collect()
      .map(r => (r.getAs[Long]("walk_id"), r.getAs[Long]("step"),
        r.getAs[String]("typ"), r.getAs[Long]("node_id"))).toSet
    assert(got === truth.toSet)
    // every step-t hop must be a real edge from the step-(t-1) node,
    // and the bipartite parity must alternate C/S/C/S…
    val byWalk = got.groupBy(_._1)
    val edgeSet = edges.toSet
    byWalk.values.foreach { hops =>
      val path = hops.toSeq.sortBy(_._2)
      path.sliding(2).filter(_.size == 2).foreach {
        case Seq((_, _, "C", c), (_, _, "S", s)) => assert(edgeSet((c, s)))
        case Seq((_, _, "S", s), (_, _, "C", c)) => assert(edgeSet((c, s)))
        case other => fail(s"non-alternating hop: $other")
      }
    }
    // the corpus must contain full-length walks (graph is connected
    // enough on the driver testdata that most seeds are not isolated)
    assert(byWalk.values.exists(_.size == DedupQueries.WalkLen + 1))
  }
}
