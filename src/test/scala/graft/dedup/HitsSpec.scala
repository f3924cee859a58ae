package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q187 HITS: driver-side integer-arithmetic replay equality and
  * mutual-reinforcement structure. */
class HitsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("hitsScores equals the driver-side quotient-renorm replay (sf0.01)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val edges = graft.ops.Tables.lineitem(spark, dir)
      .filter(col("l_quantity") <= DedupQueries.BfsMaxQty)
      .join(graft.ops.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val scale = DedupQueries.PrScale
    val custs = edges.map(_._1).distinct
    var h: Map[Long, Long] = custs.map(_ -> scale / custs.length).toMap
    var a: Map[Long, Long] = Map.empty
    def renorm(m: Map[Long, Long]): Map[Long, Long] = {
      val q = math.max(m.values.sum / scale, 1L)
      m.map { case (k, v) => k -> v / q }
    }
    for (_ <- 1 to DedupQueries.HitsIters) {
      a = renorm(edges.groupBy(_._2).map { case (sp, es) =>
        sp -> es.map(e => h(e._1)).sum })
      h = renorm(edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => a(e._2)).sum })
    }
    val truth =
      h.filter(_._2 > 0).map { case (k, v) => ("C", k) -> v } ++
        a.filter(_._2 > 0).map { case (k, v) => ("S", k) -> v }
    val got = DedupQueries.hitsScores(spark, dir).collect()
      .map(r => (r.getAs[String]("typ"), r.getAs[Long]("node_id")) ->
        r.getAs[Long]("score_x1e12")).toMap
    assert(got === truth)
    // the quotient renorm (x // max(tot // scale, 1)) bounds each
    // side's total mass to [~scale/2, 2·scale): dividing by floor of
    // the ratio can leave up to one un-divided factor of <2
    val hubMass = got.collect { case (("C", _), v) => v }.sum
    val authMass = got.collect { case (("S", _), v) => v }.sum
    assert(hubMass > scale / 2 && hubMass < 2 * scale)
    assert(authMass > scale / 2 && authMass < 2 * scale)
  }
}
