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

  test("q259: two-phase quintiles are row-identical to the naive global ntile windows") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val now = graft.ops.RelationalQueries.rfmSegments(spark, dir)
    // the pre-r20 form: three unpartitioned ntile(5) windows
    val perUser = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id")
      .agg(max(col("ts").cast("date")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("monetary_cents"))
    val maxDay = perUser.agg(max("last_day").as("max_day"))
    val g = perUser.crossJoin(broadcast(maxDay))
      .select(col("user_id"),
        datediff(col("max_day"), col("last_day")).cast("long").as("recency_days"),
        col("frequency"), col("monetary_cents"))
    val old = g.select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        ntile(5).over(Window.orderBy(col("recency_days").desc, col("user_id")))
          .cast("long").as("r_q"),
        ntile(5).over(Window.orderBy(col("frequency"), col("user_id")))
          .cast("long").as("f_q"),
        ntile(5).over(Window.orderBy(col("monetary_cents"), col("user_id")))
          .cast("long").as("m_q"))
      .withColumn("segment", expr("r_q * 100 + f_q * 10 + m_q"))
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(now) === canon(old))
    // and the plan carries no single-partition window
    val plan = now.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"q259 must not plan a single-partition exchange:\n$plan")
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
