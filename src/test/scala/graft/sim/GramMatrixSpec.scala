package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q169 integer Gram matrix: the flat-buffer Aggregator must equal the
  * explode + self-join formulation it replaces, the integers must
  * recover the covariance exactly, and the plan must aggregate the
  * embedding rows directly (no row explosion anywhere). */
class GramMatrixSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private def naive(spark: org.apache.spark.sql.SparkSession) = {
    val q = graft.ops.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "e")))
      .select(col("vec_id"), col("i"),
        floor(col("e").cast("double") * GramMatrix.GramScale).cast("long").as("qe"))
    q.as("a").join(q.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("di"), col("b.i").as("dj"))
      .agg(count(lit(1)).as("n"), sum("a.qe").as("sum_i"),
        sum("b.qe").as("sum_j"), sum(expr("a.qe * b.qe")).as("dot"))
  }

  test("q169 aggregator equals the explode+join formulation (sf0.001)") {
    val spark = SparkSpec.spark
    val expect = naive(spark).collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val got = GramMatrix.gramMatrix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    assert(got.size === GramMatrix.GramDim * (GramMatrix.GramDim + 1) / 2)
  }

  test("q169 diagonal recovers exact per-dim variance; covariance is symmetric-consistent") {
    val spark = SparkSpec.spark
    val rows = GramMatrix.gramMatrix(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val n = rows.head._2._1
    assert(rows.values.forall(_._1 === n))
    // diagonal: n·Σq² − (Σq)² ≥ 0 (it is n² times a variance)
    rows.filter { case ((i, j), _) => i == j }.foreach { case (_, (nn, si, _, dot)) =>
      assert(nn * dot - si * si >= 0L)
    }
    // off-diagonal sum_i/sum_j must equal the matching diagonal sums
    val diagSum = rows.collect { case ((i, j), (_, si, _, _)) if i == j => i -> si }
    diagSum.foreach { case (i, si) =>
      rows.foreach { case ((a, b), (_, sa, sb, _)) =>
        if (a == i) assert(sa === si)
        if (b == i) assert(sb === si)
      }
    }
  }

  test("q169 plan: map-side partial buffers, buffer-only exchange, explode only above") {
    val spark = SparkSpec.spark
    val plan = GramMatrix.gramMatrix(spark, sfDir)
      .queryExecution.executedPlan.toString
    // partial aggregation runs BEFORE the exchange (map-side combine)
    assert(plan.contains("partial_gram"), s"no partial Gram stage:\n$plan")
    // the exchange moves only the per-task buffers into one final merge
    assert(plan.contains("Exchange SinglePartition"), s"no buffer funnel:\n$plan")
    // the one Generate is the 2080-row result explode ABOVE the
    // aggregate (earlier line = higher in the tree), never below it
    val genIdx = plan.indexOf("Generate explode")
    val aggIdx = plan.indexOf("partial_gram")
    assert(genIdx >= 0 && aggIdx >= 0 && genIdx < aggIdx,
      s"explode below the Gram aggregate:\n$plan")
    // column pruning reaches the scan: embedding only
    assert(plan.contains("ReadSchema: struct<embedding:array<float>>"),
      s"scan reads more than the embedding column:\n$plan")
  }
}
