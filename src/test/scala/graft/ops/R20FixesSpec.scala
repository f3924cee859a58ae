package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-20 contract pins:
  *  - the durable candidate table's fourth tagged list ("jl") is
  *    row-for-row q284's default stride-JL searcher output, and
  *    q285's approximate leg probes it (exact full-dim leg inline);
  *  - q213's fuse is pinned to the original three searchers — the
  *    extra "jl" rows change nothing (RrfSpec's driver-side-fuse
  *    equality already re-checks the values; here the plan).
  */
class R20FixesSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  test("jl candidates are row-for-row q284's default searcher output") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    graft.sim.RankFusion.rrfCandidatesTable(spark, dir) // build or reuse
    val want = graft.sim.SimilarityQueries.jlTopKIvf(spark, dir)
      .select(col("qid").cast("long"), col("neighbor_id").cast("long"),
        col("rank").cast("int")).collect().map(_.toString).sorted
    val got = graft.sim.RankFusion.searcherCandidates(spark, dir, "jl")
      .collect().map(_.toString).sorted
    assert(got === want, "jl candidates diverge from the inline q284 searcher")
  }

  test("q285: approximate leg probes the candidate table; exact leg stays inline") {
    val spark = SparkSpec.spark
    val df = graft.sim.SimilarityQueries.jlIvfRecall(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rrfcand"),
      s"q285 approximate leg must probe the candidate table:\n$plan")
    val corpusScans = plan.linesIterator
      .count(l => l.contains("embeddings.parquet") && l.contains("Scan"))
    assert(corpusScans <= 2, // exact leg: corpus side + query side
      s"q285 must keep only the exact leg's corpus scans, saw $corpusScans:\n$plan")
    // no JL projection anywhere: the probe replaced the projected-space
    // searcher and the exact leg is full-dim by definition
    assert(!plan.contains("zip_with"),
      s"q285 must not recompute the JL projection inline:\n$plan")
  }

  test("q213: fuse reads only the three quantization lists (jl rows excluded)") {
    val spark = SparkSpec.spark
    val fused = graft.sim.RankFusion.rrfFusion(spark, dir)
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains("searcher"), "fuse must filter on the searcher tag")
    // value pin: every fused candidate counts at most the 3 lists
    assert(fused.collect().forall(_.getAs[Long]("n_lists") <= 3L),
      "a fused row counted a fourth list")
  }
}
