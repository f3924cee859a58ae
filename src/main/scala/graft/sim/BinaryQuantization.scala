package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Binary quantization (BQ) — the fourth leg of the vector-compression
  * family (q79/q80 PQ at 4 bits/subvector, q149 SQ8 at 8 bits/dim,
  * this: 1 BIT per dimension): dimension i codes to a single bit,
  * set iff v_i clears the per-dimension MIDRANGE threshold
  * (mn_i + mx_i)/2 from the same one-pass bounds train as SQ8. A
  * 64-dim float64 vector becomes 8 bytes — 64× smaller than the
  * search representation — and candidate scoring collapses to XOR +
  * popcount, the cheapest distance that exists (this is what every
  * vector DB's "binary"/"bit" index and the Hamming stage of modern
  * two-phase retrievers do). Search is the canonical BQ pipeline:
  * a SYMMETRIC Hamming shortlist over packed codes, then an EXACT
  * full-precision rescore of the shortlist only.
  *
  * Codes pack into TWO longs of 32 bits each (lo = dims 0–31,
  * hi = dims 32–63) rather than one 64-bit word: bit 63 would need
  * `1 << 63`, which Java wraps silently and DuckDB rejects as
  * overflow — the halves keep both engines in well-defined integer
  * territory and cost nothing (16 bytes/vector, still 32× smaller).
  *
  * Scale shape: train is SQ8's one bounds pass; encode is a pure map
  * under the broadcast bounds row; the Hamming stage scans ONLY the
  * 16-byte codes (at 100 TB this is the entire point — the corpus
  * scan shrinks 32×, and XOR/popcount stay inside whole-stage
  * codegen), reduced map-side by the bounded top-R aggregator; the
  * rescore touches |Q|·R rows — shortlist-grain, never corpus-grain.
  * Determinism: thresholds come from min/max (order-independent
  * float extrema, unlike a mean), Hamming ties break on vec_id, and
  * the rescore reuses q20's round-to-6dp ordering contract.
  */
object BinaryQuantization {
  val Dim  = SimilarityQueries.Dim // 64
  val Half = 32

  /** Hamming shortlist size per query (the rescore budget). */
  val BqShortlist = 50
  val K = 5

  private def embD(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  /** One packed-bits half: bits 0..31 over dims [off, off+32). */
  private def packExpr(off: Int): String =
    s"""aggregate(sequence(0, ${Half - 1}), CAST(0 AS BIGINT), (acc, i) ->
       |  acc + IF(e[i + $off] > (mins[i + $off] + maxs[i + $off]) / 2D,
       |    shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"""
      .stripMargin.replace("\n", " ")

  /** Encode (vec_id, e) → (vec_id, lo, hi) against an explicit bounds
    * row (same frozen-bounds contract as [[ScalarQuantization
    * .sqEncode]]). */
  def bqEncode(emb: DataFrame, bounds: DataFrame): DataFrame =
    emb.crossJoin(broadcast(bounds))
      .select(col("vec_id"),
        expr(packExpr(0)).as("lo"), expr(packExpr(Half)).as("hi"))

  /** q203 — BQ two-phase top-k: Hamming shortlist of [[BqShortlist]]
    * over the packed codes, exact cosine rescore of the shortlist.
    * Output schema matches q20, so q204 grades recall through the
    * shared q112/q150 integer contract. */
  def bqTopK(s: SparkSession, d: String, k: Int = K): DataFrame = {
    val emb = embD(s, d).localCheckpoint(true) // read 3×: bounds, codes, rescore
    val bounds = ScalarQuantization.sqBounds(emb)
    val codes = bqEncode(emb, bounds).localCheckpoint(true)
    val qcodes = codes.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("lo").as("qlo"), col("hi").as("qhi"))
    val shortlist = codes.crossJoin(broadcast(qcodes))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("ham",
        expr("bit_count(lo ^ qlo) + bit_count(hi ^ qhi)").cast("double"))
      .groupBy("qid")
      .agg(graft.ops.TopKAggregator.topKByScore(BqShortlist)(
        -col("ham"), col("vec_id"), col("ham"), lit(0)).as("top"))
      .select(col("qid"), explode(col("top")).as("c"))
      .select(col("qid"), col("c._2").as("vec_id"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    shortlist
      .join(emb, "vec_id") // shortlist-grain probe into the float corpus
      .join(broadcast(queries), "qid")
      .withColumn("cos", SimilarityQueries.cosineExpr("qe", "e"))
      .groupBy("qid")
      .agg(graft.ops.TopKAggregator.topKByScore(k)(
        round(col("cos"), 6), col("vec_id"), col("cos"), lit(0)).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("rk", "e")))
      .select(col("qid"), col("e._2").as("neighbor_id"),
        (col("rk") + 1).as("rank"), round(col("e._3"), 4).as("cos"))
  }

  /** q204 — BQ recall grading against the exact q20 search (the q112/
    * q150 contract): how much fidelity does 1 bit/dim + rescore keep?
    * The production go/no-go table before switching a retriever's
    * first phase to packed codes. Measured on this corpus (64 dims is
    * AGGRESSIVE for BQ — production binary indexes live at ≥512 dims):
    * recall@5 = 0.68 at 500 vecs, and 0.48 / 0.60 / 0.77 at 5 000
    * vecs for shortlist 50 / 100 / 200 — the fidelity-vs-rescore-
    * budget curve a deployment reads off this table before choosing
    * R (or rejecting 1 bit/dim outright, which IS a valid audit
    * outcome; SQ8 at the same corpus is near-lossless, q150). */
  def bqRecall(s: SparkSession, d: String, k: Int = K): DataFrame =
    SimilarityQueries.recallEvalFrom(
      // default k probes the durable candidate table (row-identical to
      // bqTopK's default output — RankFusion.searcherCandidates)
      if (k == K) RankFusion.searcherCandidates(s, d, "bq")
      else bqTopK(s, d, k).select(col("qid"), col("neighbor_id"), col("rank")),
      SimilarityQueries.cosineTopK(s, d, k).select(col("qid"), col("neighbor_id")))

  private def packSql(off: Int): String =
    s"""CAST(list_sum([CASE WHEN e[i + $off] > (mins[i + $off] + maxs[i + $off]) / 2
       |  THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END
       |  for i in generate_series(1, $Half)]) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  val bqTopKSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |p AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM
       |  (SELECT unnest(e) AS v, generate_subscripts(e, 1) AS pos FROM v) GROUP BY 1),
       |b AS (SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM p),
       |codes AS (SELECT vec_id, ${packSql(0)} AS lo, ${packSql(Half)} AS hi FROM v, b),
       |qc AS (SELECT vec_id AS qid, lo AS qlo, hi AS qhi FROM codes WHERE vec_id % 100 = 0),
       |ham AS (SELECT qc.qid, c.vec_id,
       |    bit_count(xor(c.lo, qc.qlo)) + bit_count(xor(c.hi, qc.qhi)) AS ham
       |  FROM codes c CROSS JOIN qc WHERE c.vec_id <> qc.qid),
       |short AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY ham ASC, vec_id ASC) AS rn
       |  FROM ham) WHERE rn <= $BqShortlist),
       |scored AS (SELECT s.qid, s.vec_id,
       |    list_cosine_similarity(qv.e, cv.e) AS cos
       |  FROM short s JOIN v qv ON qv.vec_id = s.qid JOIN v cv ON cv.vec_id = s.vec_id),
       |ranked AS (SELECT qid, vec_id, cos, row_number() OVER
       |  (PARTITION BY qid ORDER BY round(cos, 6) DESC, vec_id) AS rank FROM scored)
       |SELECT qid, vec_id AS neighbor_id, rank, round(cos, 4) AS cos
       |FROM ranked WHERE rank <= $K""".stripMargin.replace("\n", " ")

  val bqRecallSql: String =
    SimilarityQueries.recallSqlOver(bqTopKSql, SimilarityQueries.cosineTopKSql)
}
