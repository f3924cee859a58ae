package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q209 Gini stump: brute-force split-search equality per dimension,
  * and the split-never-hurts property of the purity score. */
class StumpSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("giniStump equals the brute-force exact split search (sf0.01)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val data = graft.ops.Tables.embeddings(spark, dir)
      .select(col("embedding").cast("array<double>"), col("label")).collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getInt(1)))
    val n = data.length.toLong
    val labels = data.map(_._2).distinct
    val totals = labels.map(l => l -> data.count(_._2 == l).toLong).toMap
    val parentPpm =
      totals.values.map(t => t * t).sum * Stump.StumpScale / n

    val truth = (0 until Stump.StumpDims).map { dim =>
      val vs = data.map { case (e, l) => (e(dim), l) }
      val splits = vs.map(_._1).distinct.sorted.dropRight(1).map { v =>
        val left = vs.filter(_._1 <= v)
        val nl = left.length.toLong
        val ssqL = labels.map(l => left.count(_._2 == l).toLong)
          .map(c => c * c).sum
        val ssqR = labels.map(l => totals(l) - left.count(_._2 == l).toLong)
          .map(c => c * c).sum
        (v, nl, ssqL * Stump.StumpScale / nl +
          ssqR * Stump.StumpScale / (n - nl))
      }
      val best = splits.minBy { case (v, _, s) => (-s, v) }
      dim -> ((best._1, best._2, best._3, best._3 - parentPpm))
    }.toMap

    val got = Stump.giniStump(spark, dir).collect()
      .map(r => r.getAs[Int]("dim") ->
        ((r.getAs[Double]("split_v"), r.getAs[Long]("n_left"),
          r.getAs[Long]("score_ppm"), r.getAs[Long]("gain_ppm")))).toMap
    assert(got.keySet === truth.keySet)
    assert(got === truth)
    // splitting never hurts Gini purity (up to the two ppm floors)
    assert(got.values.forall(_._4 >= -2L))
    // and every split is a real partition
    assert(got.values.forall { case (_, nl, _, _) => nl > 0 && nl < n })
  }
}
