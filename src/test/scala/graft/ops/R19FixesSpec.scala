package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-19 contract fixes:
  *  - q286 WordPiece: the word-position cap ([[graft.text.WordPiece
  *    .MaxWordPositions]]) is one shared constant in BOTH engine
  *    texts — a 64+-char lowercase run must produce identical piece
  *    statistics on both sides (the capped counts, not the unbounded
  *    ones).
  *  - ivfAssignSlim's BIGINT argmax encoding ENFORCES its documented
  *    bounds: a codebook id ≥ 2³² or a NaN cosine (zero-norm vector)
  *    raises instead of silently corrupting assignments.
  *  - q213/q214 RRF is persist-and-probe: the warm fuse reads the
  *    durable per-searcher candidate table only — no searcher or
  *    corpus scan in its plan.
  */
class R19FixesSpec extends AnyFunSuite {

  test("q286: pieces beyond position MaxWordPositions are capped identically to the oracle") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("wp70").toString
    // one 70-char word: without the shared cap the Spark side would
    // count '##a' at positions 2..70 (freq 69); the capped contract
    // (positions 1..63, the oracle's range(1, 64)) gives 62
    Seq((1L, "a" * 70)).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val got = graft.text.WordPiece.seedStats(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map(
      "a" -> 1L, "aa" -> 1L, "aaa" -> 1L, "aaaa" -> 1L,
      "##a" -> 62L, "##aa" -> 62L, "##aaa" -> 62L, "##aaaa" -> 62L)
    assert(got === want,
      s"70-char token must yield position-capped counts (cap = " +
        s"${graft.text.WordPiece.MaxWordPositions})")
  }

  test("ivfAssignSlim raises on a codebook id >= 2^32 instead of mis-assigning") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val emb = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "e")
    val cents = Seq((4294967296L, Seq(1.0, 0.0))).toDF("cent_id", "ce")
    val ex = intercept[Exception] {
      graft.sim.SimilarityQueries.ivfAssignSlim(emb, cents).collect()
    }
    assert(ex.getMessage != null)
  }

  test("ivfAssignSlim raises on a NaN cosine (zero-norm vector) instead of dropping it") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val emb = Seq((1L, Seq(0.0, 0.0))).toDF("vec_id", "e") // zero norm -> NaN cos
    val cents = Seq((7L, Seq(1.0, 0.0))).toDF("cent_id", "ce")
    val ex = intercept[Exception] {
      graft.sim.SimilarityQueries.ivfAssignSlim(emb, cents).collect()
    }
    assert(ex.getMessage != null)
  }

  test("ivfAssignSlim still assigns correctly inside the enforced bounds") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0, 0.1)),
      (2L, Seq(0.1, 1.0))).toDF("vec_id", "e")
    val cents = Seq(
      (10L, Seq(1.0, 0.0)),
      (20L, Seq(0.0, 1.0))).toDF("cent_id", "ce")
    val got = graft.sim.SimilarityQueries.ivfAssignSlim(emb, cents).collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("cent_id").longValue()).toMap
    assert(got === Map(1L -> 10L, 2L -> 20L))
  }

  test("q213: warm RRF fuse probes the durable candidate table only") {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.01"
    graft.sim.RankFusion.rrfFusion(spark, dir).collect() // build or reuse
    val warm = graft.sim.RankFusion.rrfFusion(spark, dir)
    val plan = warm.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      s"warm fuse must not re-run a searcher over the corpus:\n$plan")
    assert(plan.contains("rrfcand"),
      s"warm fuse must scan the durable candidate table:\n$plan")
  }

  test("eval family: approximate legs probe the candidate table; probe rows == inline searcher rows") {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions.col
    graft.sim.RankFusion.rrfCandidatesTable(spark, dir) // build or reuse
    // 1. row-identity: the durable lists ARE the searchers' default
    //    outputs (the equivalence the probe routing rests on)
    val inline = Map(
      "ivf" -> graft.sim.SimilarityQueries.ivfTopK(spark, dir),
      "sq8" -> graft.sim.ScalarQuantization.sqTopK(spark, dir),
      "bq"  -> graft.sim.BinaryQuantization.bqTopK(spark, dir))
    for ((name, df) <- inline) {
      val want = df.select(col("qid").cast("long"), col("neighbor_id").cast("long"),
        col("rank").cast("int")).collect().map(_.toString).sorted
      val got = graft.sim.RankFusion.searcherCandidates(spark, dir, name)
        .collect().map(_.toString).sorted
      assert(got === want, s"$name candidates diverge from the inline searcher")
    }
    // 2. plan shape: each eval's approximate leg reads the durable
    //    table; exactly ONE corpus scan remains (the exact leg)
    val evals = Map(
      "q112" -> graft.sim.SimilarityQueries.annRecall(spark, dir),
      "q150" -> graft.sim.ScalarQuantization.sqRecall(spark, dir),
      "q204" -> graft.sim.BinaryQuantization.bqRecall(spark, dir),
      "q220" -> graft.sim.SimilarityQueries.ndcgEval(spark, dir),
      "q245" -> graft.sim.RankFusion.rboEval(spark, dir))
    for ((name, df) <- evals) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("rrfcand"),
        s"$name approximate leg must probe the candidate table:\n$plan")
      val corpusScans = plan.linesIterator
        .count(l => l.contains("embeddings.parquet") && l.contains("Scan"))
      assert(corpusScans <= 2, // exact leg: corpus side + query side
        s"$name must keep only the exact leg's corpus scans, saw $corpusScans:\n$plan")
    }
    // 3. non-default parameters must NOT probe (only the default
    //    output is materialized)
    val nonDefault = graft.sim.SimilarityQueries.annRecall(spark, dir, k = 3)
    assert(!nonDefault.queryExecution.executedPlan.toString.contains("rrfcand"),
      "k=3 recall must compute its searcher inline")
  }
}
