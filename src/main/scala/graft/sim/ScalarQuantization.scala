package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** SQ8 scalar quantization — the third leg of the vector-compression
  * family (q79/q80 PQ: subspace codebooks at 4 bits/subvector; this:
  * per-dimension 8-bit affine codes): each dimension is mapped to
  * `round((v − min_d) / (max_d − min_d) · 255)`, so a 64-dim float
  * vector stores as 64 bytes — 4× smaller than float32, 8× smaller
  * than the float64 search representation — with far better fidelity
  * than PQ at the same simplicity (SQ is what FAISS's
  * `ScalarQuantizer(QT_8bit)` and every vector DB's "int8" option do).
  * Search is ASYMMETRIC: the full-precision query scores against
  * DEQUANTIZED candidates, so the only error is the candidates'
  * per-dim rounding (≤ range/510 per dimension).
  *
  * Scale shape: training is one pass (per-dimension min/max — the
  * posexplode partial-aggregates map-side to 64 rows per task; at
  * 100 TB swap to a single `aggregate` fold per row feeding the same
  * 64-row reduce); the 2×64-double bounds row broadcasts everywhere
  * (like the PQ codebook); encode is a pure map; search is q20's
  * bounded-aggregate top-k over a scan of CODES (the 4× I/O win is
  * the point — at 100 TB the corpus scan reads int8 codes, not
  * floats, and dequantization is in-register arithmetic inside
  * whole-stage codegen).
  *
  * Determinism: codes use the explicit half-up `floor(x·255 + 0.5)`
  * (both engines share IEEE double arithmetic and glibc rounding);
  * a degenerate constant dimension (max = min) codes to 0 by CASE
  * rather than NULL-by-division. Final cosines round to 4dp like the
  * rest of the neighbor family.
  */
object ScalarQuantization {
  val Dim = SimilarityQueries.Dim
  val Levels = 255

  private def embD(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  /** Train: one row, (mins, maxs) — each an ascending-dimension
    * array of the corpus per-dimension extrema. */
  def sqBounds(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy("pos").agg(min("v").as("mn"), max("v").as("mx"))
      .agg(
        expr("transform(sort_array(collect_list(struct(pos, mn))), x -> x.mn)").as("mins"),
        expr("transform(sort_array(collect_list(struct(pos, mx))), x -> x.mx)").as("maxs"))

  /** Encode (vec_id, e) → (vec_id, codes array<int>), codes in
    * [0, 255], against an explicit bounds row (frozen-bounds appends
    * encode against the index's bounds, same as [[ProductQuantization
    * .pqEncode]]). */
  def sqEncode(emb: DataFrame, bounds: DataFrame): DataFrame =
    emb.crossJoin(broadcast(bounds))
      .select(col("vec_id"), expr(
        s"""transform(sequence(0, ${Dim - 1}), i ->
           |  CASE WHEN maxs[i] > mins[i] THEN
           |    CAST(least(greatest(
           |      floor((e[i] - mins[i]) / (maxs[i] - mins[i]) * $Levels + 0.5D),
           |      0D), ${Levels}D) AS INT)
           |  ELSE 0 END)""".stripMargin.replace("\n", " ")).as("codes"))

  /** q149 — SQ8 asymmetric top-k: full-precision queries (the q20
    * subset) against dequantized codes. Output schema matches q20, so
    * recall@k against the exact search is directly measurable
    * (SimilaritySpec reports it, the q112 pattern). */
  def sqTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = embD(s, d)
    val bounds = sqBounds(emb)
    sqTopKFrom(emb, sqEncode(emb, bounds), bounds, k)
  }

  /** Search over ANY (vec_id, codes) table + its bounds: dequantize
    * per candidate (`mn + code/255 · (mx − mn)`), fused-cosine against
    * the query, bounded top-k. The queries stay full-precision rows
    * from `emb`; the corpus side reads codes only. */
  def sqTopKFrom(emb: DataFrame, codes: DataFrame, bounds: DataFrame,
                 k: Int = 5): DataFrame = {
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val decoded = codes.crossJoin(broadcast(bounds))
      .select(col("vec_id"), expr(
        s"""transform(sequence(0, ${Dim - 1}), i ->
           |  mins[i] + CAST(codes[i] AS DOUBLE) / $Levels * (maxs[i] - mins[i]))"""
          .stripMargin.replace("\n", " ")).as("ae"))
    decoded.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", SimilarityQueries.cosineExpr("qe", "ae"))
      .groupBy("qid")
      .agg(graft.ops.TopKAggregator.topKByScore(k)(
        round(col("cos"), 6), col("vec_id"), col("cos"), lit(0)).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("rk", "e")))
      .select(col("qid"), col("e._2").as("neighbor_id"),
        (col("rk") + 1).as("rank"), round(col("e._3"), 4).as("cos"))
  }

  /** q150 — SQ8 recall grading against the exact q20 search: the q112
    * eval contract ([[SimilarityQueries.recallEvalFrom]]) applied to
    * the quantized searcher. Integer-only output; the headline
    * recall@k is Σn_hits / (k·|Q|) downstream. On this corpus SQ8 is
    * near-lossless (unit-range dims, 1/510-range max per-dim error),
    * so the table doubles as the quantization-fidelity audit a
    * deployment runs before switching its scan to int8. */
  def sqRecall(s: SparkSession, d: String, k: Int = 5): DataFrame =
    SimilarityQueries.recallEvalFrom(
      // default k probes the durable candidate table (row-identical to
      // sqTopK's default output — RankFusion.searcherCandidates)
      if (k == 5) RankFusion.searcherCandidates(s, d, "sq8")
      else sqTopK(s, d, k).select(col("qid"), col("neighbor_id"), col("rank")),
      SimilarityQueries.cosineTopK(s, d, k).select(col("qid"), col("neighbor_id")))

  val sqTopKSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |p AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM
       |  (SELECT unnest(e) AS v, generate_subscripts(e, 1) AS pos FROM v) GROUP BY 1),
       |b AS (SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM p),
       |codes AS (SELECT vec_id,
       |  [CASE WHEN maxs[i] > mins[i] THEN
       |     CAST(least(greatest(floor((e[i] - mins[i]) / (maxs[i] - mins[i]) * $Levels + 0.5), 0), $Levels) AS INT)
       |   ELSE 0 END for i in generate_series(1, $Dim)] AS codes
       |  FROM v, b),
       |dec AS (SELECT vec_id,
       |  [mins[i] + CAST(codes[i] AS DOUBLE) / $Levels * (maxs[i] - mins[i])
       |   for i in generate_series(1, $Dim)] AS ae
       |  FROM codes, b),
       |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id % 100 = 0),
       |scored AS (SELECT q.qid, dec.vec_id,
       |    list_cosine_similarity(q.qe, dec.ae) AS cos
       |  FROM dec CROSS JOIN q WHERE dec.vec_id <> q.qid),
       |ranked AS (SELECT qid, vec_id, cos, row_number() OVER
       |  (PARTITION BY qid ORDER BY round(cos, 6) DESC, vec_id) AS rank FROM scored)
       |SELECT qid, vec_id AS neighbor_id, rank, round(cos, 4) AS cos
       |FROM ranked WHERE rank <= 5""".stripMargin.replace("\n", " ")

  val sqRecallSql: String =
    SimilarityQueries.recallSqlOver(sqTopKSql, SimilarityQueries.cosineTopKSql)
}
