package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q175 — the fixed-point power iteration's numeric contract (alignment
  * with the dominant axis, bounded intermediates at any input
  * magnitude) and the apply plan's shape (one projection scan, no
  * join, driver work d²-bounded). */
class PowerIterationSpec extends AnyFunSuite {
  private val D = PowerIteration.Dim

  private def diag(values: PartialFunction[Int, Long]): Array[Array[Long]] = {
    val m = Array.ofDim[Long](D, D)
    for (i <- 0 until D) m(i)(i) = if (values.isDefinedAt(i)) values(i) else 1L
    m
  }

  test("iteration locks onto the dominant diagonal axis") {
    val v = PowerIteration.iterate(diag { case 0 => 1000L })
    assert(v(0) === PowerIteration.VScale) // normalized to full scale
    assert(v.drop(1).forall(x => math.abs(x) < PowerIteration.VScale / 100),
      s"non-dominant components too large: ${v.drop(1).max}")
  }

  test("dominant off-diagonal block yields the symmetric eigenvector") {
    // M = big on {0,1}×{0,1} with positive coupling → v0 ≈ v1 ≫ rest
    val m = diag(PartialFunction.empty)
    m(0)(0) = 500L; m(1)(1) = 500L; m(0)(1) = 500L; m(1)(0) = 500L
    val v = PowerIteration.iterate(m)
    assert(v(0) === v(1), "symmetric coordinates must stay exactly equal")
    assert(v(0) === PowerIteration.VScale)
    assert(v.drop(2).forall(x => math.abs(x) < PowerIteration.VScale / 100))
  }

  test("prescale keeps huge-magnitude inputs inside Long arithmetic") {
    // entries near 2^55 — far beyond the unscaled overflow point; the
    // prescale must cap them and the result must stay a unit direction
    val m = diag { case 0 => 1L << 55; case 1 => 1L << 54 }
    val v = PowerIteration.iterate(m)
    assert(v(0) === PowerIteration.VScale)
    assert(v.forall(x => math.abs(x) <= PowerIteration.VScale))
  }

  test("q175 apply plan: single corpus scan, no join, no window") {
    val spark = SparkSpec.spark
    val df = PowerIteration.topPcProjection(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    assert(plan.collect { case f: FileSourceScanExec => f }.size === 1)
    assert(plan.collect { case j: BaseJoinExec => j }.isEmpty)
    assert(plan.collect { case w: WindowExec => w }.isEmpty)
  }

  test("Gram fold is invariant to input partitioning (exact integers)") {
    // the only stage where partitioning could bite is the distributed
    // Gram fold; integer adds commute, so a different partition layout
    // must produce the bit-identical matrix (and hence direction)
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.{col, explode}
    def gramRows(parts: Int) = {
      val emb = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.01")
        .repartition(parts)
      emb.agg(GramMatrix.gramAgg(col("embedding")).as("g"))
        .select(explode(col("g")).as("e")).collect()
        .map(_.getStruct(0)).map(r =>
          (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5))).toSet
    }
    assert(gramRows(1) === gramRows(7))
  }
}
