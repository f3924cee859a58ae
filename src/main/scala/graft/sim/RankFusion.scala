package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RECIPROCAL-RANK FUSION across the engine's three approximate
  * vector searchers — IVF (q44), SQ8 (q149) and BQ (q203) — the
  * standard ensemble move in production retrieval (RRF, Cormack et
  * al.: score = Σ_lists 1/(k + rank)): indexes with UNCORRELATED
  * error modes (coarse-cell pruning vs per-dim quantization vs 1-bit
  * sign codes) vote by rank, and a neighbor surfaced by several
  * cheap indexes outranks one a single index over-scored. Rank-only
  * fusion needs no score calibration between heterogeneous indexes —
  * exactly why RAG stacks fuse BM25 with dense retrieval the same
  * way.
  *
  * EXACT integer scoring: rrf_ppm = Σ 10⁶ div (RrfK + rank) — each
  * term an integer both engines compute identically, ties broken by
  * neighbor id. Scale shape: the three searcher outputs are
  * |Q|·k-grain; the fuse is one (qid, neighbor) aggregate plus a
  * per-qid bounded window over ≤ 3k candidates — everything after
  * the searchers is candidate-grain. */
object RankFusion {
  /** The standard RRF damping constant. */
  val RrfK = 60L
  val FuseK = 5

  /** q213 — fused top-[[FuseK]] per query with the integer RRF score
    * and how many of the three lists surfaced each neighbor. */
  def rrfFusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lists = Seq(
      SimilarityQueries.ivfTopK(s, d),
      ScalarQuantization.sqTopK(s, d),
      BinaryQuantization.bqTopK(s, d))
      .map(_.select(col("qid"), col("neighbor_id"), col("rank")))
    lists.reduce(_ unionAll _)
      .groupBy("qid", "neighbor_id")
      .agg(
        sum(expr(s"1000000 div ($RrfK + rank)")).as("rrf_ppm"),
        count(lit(1)).as("n_lists"))
      .withColumn("rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("rrf_ppm").desc, col("neighbor_id"))))
      .filter(col("rn") <= FuseK)
      .select(col("qid"), col("neighbor_id"), col("rn").as("rank"),
        col("rrf_ppm"), col("n_lists"))
  }

  val rrfFusionSql: String =
    s"""WITH ap1 AS (${SimilarityQueries.ivfTopKSql}),
       |ap2 AS (${ScalarQuantization.sqTopKSql}),
       |ap3 AS (${BinaryQuantization.bqTopKSql}),
       |u AS (SELECT qid, neighbor_id, rank FROM ap1
       |  UNION ALL SELECT qid, neighbor_id, rank FROM ap2
       |  UNION ALL SELECT qid, neighbor_id, rank FROM ap3),
       |sc AS (SELECT qid, neighbor_id,
       |  CAST(sum(1000000 // ($RrfK + rank)) AS BIGINT) AS rrf_ppm,
       |  CAST(count(*) AS BIGINT) AS n_lists FROM u GROUP BY 1, 2)
       |SELECT qid, neighbor_id, CAST(rn AS INT) AS rank, rrf_ppm, n_lists
       |FROM (SELECT *, row_number() OVER
       |  (PARTITION BY qid ORDER BY rrf_ppm DESC, neighbor_id) AS rn FROM sc)
       |WHERE rn <= $FuseK""".stripMargin.replace("\n", " ")

  /** q214 — fusion recall against the exact q20 search (the shared
    * q112/q150/q204 integer contract). Measured, both directions of
    * the ensemble story: at sf0.1 the fuse scores 0.71 vs members
    * IVF 0.31 / BQ 0.48 / SQ8 0.98 — it LIFTS the two cheap indexes
    * far above what either achieves alone (uncorrelated errors,
    * quantified) but DILUTES the one dominant member, the textbook
    * RRF caveat (rank votes are uncalibrated by design, so two weak
    * voters can outvote a strong one). That asymmetry is exactly what
    * this table exists to surface before a deployment picks its
    * ensemble — with members of comparable strength RRF is the right
    * default; with one near-exact member, route to it instead. */
  def rrfRecall(s: SparkSession, d: String): DataFrame =
    SimilarityQueries.recallEvalFrom(
      rrfFusion(s, d).select(col("qid"), col("neighbor_id"), col("rank")),
      SimilarityQueries.cosineTopK(s, d).select(col("qid"), col("neighbor_id")))

  val rrfRecallSql: String =
    SimilarityQueries.recallSqlOver(rrfFusionSql, SimilarityQueries.cosineTopKSql)
}
