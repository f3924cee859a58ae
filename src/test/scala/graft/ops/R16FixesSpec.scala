package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Round-16 contract fixes:
  *  - q253 kAnonymityRepair SUPPRESSES sources below k (no sub-k class
  *    can ever be emitted — the ≥ k contract is unconditional);
  *  - q252 conformalCoverage keeps a tiny calibration class with the
  *    infinite (= 10000) threshold instead of dropping it;
  *  - q258 plannerSampleMod scales Θ(√N) with the fixture floor;
  *  - q271 clusterSizeHistogram reads the persisted assignment table —
  *    warm plan is scan→aggregate, no join, labels identical to the
  *    live clustering.
  */
class R16FixesSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def scratch(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("q253: sources with fewer than k docs are suppressed, never released undersized") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val d = scratch("kanon")
    val tiny = (1L to 3L).map(i => (i, "tiny", 100L + i))          // 3 < k = 5
    val big = (10L to 21L).map(i => (i, "big", 50L * i))           // 12 >= k
    (tiny ++ big).toDF("doc_id", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = Maintenance.kAnonymityRepair(spark, d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_class")))
    assert(!rows.exists(_._1 == "tiny"), "sub-k source must be suppressed")
    assert(rows.forall(_._2 >= Maintenance.KAnonK),
      "every released class has >= k members")
    assert(rows.filter(_._1 == "big").map(_._2).sum === 12L,
      "suppression drops whole sources, not rows within a released one")
  }

  test("q252: a tiny calibration class keeps the infinite threshold and full coverage") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val d = scratch("conformal")
    // label-1 text: >= 2 distinct stopword types, >= 20 [a-z0-9]+ tokens
    val good = "the cat is " + (1 to 20).map(i => s"w$i").mkString(" ")
    val bad = "zzz qqq" // label 0: no stop types, 2 tokens
    // class 1: 3 odd (calibration) + 2 even (eval) -> k = (90*4+90)/100
    //        = 4 > 3, so thr1 must be the infinite 10000
    val cls1 = Seq(1L, 3L, 5L, 2L, 4L).map(i => (i, good))
    // class 0: 20 odd + 4 even -> normal finite-threshold path
    val cls0 = ((101L to 139L by 2) ++ Seq(100L, 102L, 104L, 106L))
      .map(i => (i, bad + " x" * (i % 7).toInt))
    (cls1 ++ cls0).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val rows = Quality.conformalCoverage(spark, d).collect()
      .map(r => r.getAs[Long]("cls") ->
        ((r.getAs[Long]("n_cal"), r.getAs[Long]("thr"),
          r.getAs[Long]("n_eval"), r.getAs[Long]("n_covered")))).toMap
    assert(rows.keySet === Set(0L, 1L), "tiny class must not vanish")
    val (nCal1, thr1, nEval1, nCov1) = rows(1L)
    assert(nCal1 === 3L)
    assert(thr1 === 10000L, "ceil-rank > n_cal means the infinite threshold")
    assert(nCov1 === nEval1, "an infinite threshold always covers")
    val (nCal0, thr0, _, _) = rows(0L)
    assert(nCal0 === 20L && thr0 < 10000L,
      "a large class keeps the finite order-statistic threshold")
  }

  test("q258: plannerSampleMod is the fixture floor at small N and Θ(√N) above") {
    import graft.dedup.DedupQueries.plannerSampleMod
    assert(plannerSampleMod(0L) === 4L)
    assert(plannerSampleMod(500L) === 4L)     // sf0.01 fixture: unchanged
    assert(plannerSampleMod(5000L) === 4L)    // sf0.1 fixture: unchanged
    assert(plannerSampleMod(50000L) === 13L)  // sf1: isqrt(50000)=223 -> 13
    assert(plannerSampleMod(150000L) === 24L) // sf3: isqrt(150000)=387 -> 24
    // monotone non-decreasing, and rate 1/mod shrinks like 1/sqrt(N)
    val mods = Seq(1e4, 1e6, 1e8, 1e10).map(n => plannerSampleMod(n.toLong))
    assert(mods === mods.sorted)
    assert(mods.last === math.sqrt(1e10).toLong / 16)
  }

  test("q271: warm telemetry reads the persisted labels - no join in the plan, labels exact") {
    val spark = SparkSpec.spark
    val hist = graft.dedup.DedupQueries.clusterSizeHistogram(spark, dir)
    hist.collect() // ensures the durable table exists (build or reuse)
    val warm = graft.dedup.DedupQueries.clusterSizeHistogram(spark, dir)
    val plan = warm.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"telemetry plan must not join:\n$plan")
    assert(!plan.toLowerCase.contains("generate"),
      "telemetry plan must not re-run the shingle/banding pipeline")
    // the persisted labels ARE the live clustering's labels
    val tbl = graft.dedup.DedupQueries.clusterAssignmentTable(spark, dir)
    val persisted = spark.table(tbl).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    val live = graft.dedup.DedupQueries.dedupClustersLargeStar(spark, dir)
      .select(col("doc_id").cast("long"), col("cluster").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(persisted === live)
  }
}
