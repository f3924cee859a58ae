package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Product quantization for the embedding store — the memory layout
  * that makes ANN search possible at 100 TB: each 64-dim float vector
  * (256 B) is encoded as [[NumSubs]] small codes (one byte-sized int
  * per subspace here; 8 ints ≤ 15), a 32–64× compression of the
  * candidate store. Search runs Asymmetric Distance Computation (ADC):
  * the query stays exact, each subspace's 16 centroid distances are
  * precomputed into a per-query distance table, and a candidate's
  * approximate squared-L2 distance is 8 table lookups — no vector
  * arithmetic per candidate at all.
  *
  * The codebook is DETERMINISTIC: subspace centroids are the
  * subvectors of the data vectors at a fixed id stride (the same
  * trained-k-means stand-in the IVF coarse quantizer uses —
  * `SimilarityQueries.CentStride` rationale), so the DuckDB oracle
  * reconstructs the identical codebook from the table itself and no
  * literals ship in the SQL. Encode/search are pure codegen'd
  * HOF expressions (`transform`/`aggregate` with ascending index
  * order, bit-identical across engines) — no UDF anywhere.
  *
  * Scale shape: encode is a one-off pass (16-row broadcast codebook,
  * explode to (vec, sub) grain, two keyed aggregations) whose output
  * would be persisted next to the IVF lists; search scans ONLY the
  * codes table with a broadcast distance table. Composed with the IVF
  * lists ([[ivfPqTopK]]) the scan narrows to the probed lists — the
  * classic IVF-PQ layout.
  */
object ProductQuantization {
  val Dim      = SimilarityQueries.Dim
  val NumSubs  = 8                 // 64 dims → 8 subspaces of 8
  val SubDim   = Dim / NumSubs
  val NumCents = 16                // 16 centroids/subspace → 4-bit codes
  val PqCentStride = 3             // codebook = vectors 1, 4, …, 46
  val PqCentOffset = 1

  private def embD(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  /** The 16 codebook vectors: (c, ce) with c = 0..15. */
  def pqCodebook(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % PqCentStride === PqCentOffset &&
        col("vec_id") < PqCentStride * NumCents + PqCentOffset)
      .select(((col("vec_id") - PqCentOffset) / PqCentStride).cast("int").as("c"),
        col("e").as("ce"))

  /** Per-(vector, centroid) array of [[NumSubs]] subspace squared-L2
    * distances, ascending-i summation — the shared kernel of encode
    * (argmin over c) and the ADC distance table (kept per c). */
  private def subDists(a: String, b: String) = expr(
    s"transform(sequence(0, ${NumSubs - 1}), j -> " +
      s"aggregate(sequence(0, ${SubDim - 1}), 0D, " +
      s"(acc, i) -> acc + ($a[j * $SubDim + i] - $b[j * $SubDim + i]) * " +
      s"($a[j * $SubDim + i] - $b[j * $SubDim + i])))")

  /** PQ-encode every vector against its own derived codebook. */
  def pqCodes(emb: DataFrame): DataFrame = pqEncode(emb, pqCodebook(emb))

  /** PQ-encode (vec_id, e) rows against an EXPLICIT (possibly frozen)
    * codebook: (vec_id, codes array<int>) where codes[j] = argmin over
    * c of the subspace-j distance (ties → lowest c, via a
    * lexicographic struct-min on (round(d,9), c) — the same rounding
    * the oracle applies, so tie sets agree exactly). The explicit
    * codebook is what index appends use: new vectors encode against
    * the index's codebook, not their own. */
  def pqEncode(emb: DataFrame, cents: DataFrame): DataFrame = {
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("c"),
        posexplode(subDists("e", "ce")).as(Seq("j", "d")))
      .groupBy("vec_id", "j")
      .agg(min(struct(round(col("d"), 9).as("d"), col("c"))).as("m"))
      .groupBy("vec_id")
      .agg(expr("transform(sort_array(collect_list(struct(j, m.c))), x -> x.c)")
        .as("codes"))
  }

  /** Per-query ADC distance table, outer-indexed by centroid:
    * dtab[c][j] = subspace-j squared L2 between the query and centroid
    * c. 16×8 doubles per query — broadcast to the code scan. */
  private def distTable(queries: DataFrame, cents: DataFrame): DataFrame =
    queries.crossJoin(broadcast(cents))
      .select(col("qid"), col("c"), subDists("qe", "ce").as("sd"))
      .groupBy("qid")
      .agg(expr("transform(sort_array(collect_list(struct(c, sd))), x -> x.sd)")
        .as("dtab"))

  /** ADC rank over per-query candidates (qid, vec_id, codes): the
    * approximate distance is [[NumSubs]] table lookups per candidate,
    * rank by ascending adc (ties: round(adc,6) then vec_id) — as the
    * BOUNDED k-smallest aggregate, not a per-anchor window (the q20
    * family rule): negating the quantized distance turns the existing
    * k-largest [[graft.ops.TopKAggregator.TopKByScore]] buffer into
    * min-k, and −0.0 == 0.0 keeps zero-distance ties on the id
    * tiebreak exactly like the ascending sort did. */
  private def adcTopK(cand: DataFrame, dtab: DataFrame, k: Int): DataFrame =
    cand.join(broadcast(dtab), "qid")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("adc", expr(
        s"aggregate(sequence(0, ${NumSubs - 1}), 0D, " +
          "(acc, j) -> acc + dtab[codes[j]][j])"))
      .groupBy("qid")
      .agg(graft.ops.TopKAggregator.topKByScore(k)(
        -round(col("adc"), 6), col("vec_id"), col("adc"), lit(0)).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("rk", "e")))
      .select(col("qid"), col("e._2").as("neighbor_id"),
        (col("rk") + 1).as("rank"), round(col("e._3"), 4).as("adc_dist"))

  /** q79 — PQ ADC top-k: exact queries against the COMPRESSED store
    * (every query scans every code — the flat-PQ baseline). Output
    * shape matches [[SimilarityQueries.cosineTopK]] (qid, neighbor_id,
    * rank, dist). */
  def pqTopK(s: SparkSession, d: String, k: Int = 5): DataFrame =
    adcSearchAll(SimilarityQueries.ivfQueries(embD(s, d)), embD(s, d), k)

  /** Flat ADC search over an ARBITRARY (vec_id, e) embedding set
    * (codebook and codes derived from it) — the PqSpec entry point. */
  def adcSearchAll(queries: DataFrame, emb: DataFrame, k: Int): DataFrame =
    adcTopK(queries.select("qid").crossJoin(pqCodes(emb)),
      distTable(queries, pqCodebook(emb)), k)

  /** q80 — IVF-PQ: ADC search restricted to the probed coarse lists
    * (the classic two-level layout: the coarse quantizer picks nProbe
    * lists and the PQ codes are scanned only inside them — candidates
    * come from the list join, BEFORE any distance math). Probe-all ≡
    * [[pqTopK]] (SimilaritySpec asserts), which keeps the composition
    * on q79's oracle; production sets nProbe ≪ nlist and the per-query
    * scan is nProbe lists of 4-byte codes — the 100 TB search budget. */
  def ivfPqTopK(s: SparkSession, d: String, k: Int = 5,
                nProbe: Int = Int.MaxValue): DataFrame =
    ivfPqFrom(embD(s, d), k, nProbe)

  /** DataFrame-level core of [[ivfPqTopK]]: input (vec_id, e).
    *
    * r20 probe-all fast path (the [[SimilarityQueries.ivfSearch]]
    * move): at nProbe = Int.MaxValue the probe window, the cent_id
    * routing join AND the (qid, vec_id) distinct are the identity —
    * every list is probed, every vector sits in exactly one list, so
    * the candidate set is all (query, code) pairs, which is exactly
    * [[adcSearchAll]] (≡ flat PQ, the equality SimilaritySpec has
    * always asserted). The old path shuffled the |Q|·N candidate
    * cross product through a distinct for nothing. */
  def ivfPqFrom(emb: DataFrame, k: Int = 5,
                nProbe: Int = Int.MaxValue): DataFrame = {
    val queries = SimilarityQueries.ivfQueries(emb)
    if (nProbe == Int.MaxValue) adcSearchAll(queries, emb, k)
    else {
      val coarse = SimilarityQueries.ivfCentroids(emb)
      val assigned = SimilarityQueries.ivfAssign(emb, coarse)
        .select("cent_id", "vec_id")
      val wProbe = Window.partitionBy("qid")
        .orderBy(round(col("qcos"), 6).desc, col("cent_id"))
      val probes = queries.crossJoin(broadcast(coarse))
        .select(col("qid"), col("cent_id"),
          SimilarityQueries.cosineExpr("qe", "ce").as("qcos"))
        .withColumn("prank", row_number().over(wProbe))
        .filter(col("prank") <= nProbe)
        .select(col("qid"), col("cent_id"))
      val cand = probes.join(assigned, "cent_id")
        .select(col("qid"), col("vec_id")).distinct()
        .join(pqCodes(emb), "vec_id")
      adcTopK(cand, distTable(queries, pqCodebook(emb)), k)
    }
  }

  /** q81 — IVF-PQ against the PERSISTED index: the coarse probe runs
    * on the durable codebook, the ADC scan on the bucketed
    * `ivf_codes` table (read pre-partitioned on cent_id — the 64×
    * smaller probe target the layout exists for). Probe-all ≡ flat PQ
    * keeps it on q79's oracle. The PQ distance table still derives
    * from the snapshot's PQ codebook (a 16-row scan of the embeddings
    * file — the frozen-codebook discipline). */
  def ivfPqTopKIndexed(s: SparkSession, d: String, k: Int = 5,
                       nProbe: Int = Int.MaxValue): DataFrame = {
    val (centTbl, _) = SimilarityQueries.ivfIndex(s, d)
    val queries = SimilarityQueries.ivfQueries(embD(s, d))
    // r20 probe-all fast path ([[ivfPqFrom]]'s argument, on the
    // PERSISTED codes): every code row's cent_id ∈ the durable
    // codebook by build construction, so probe selection and the
    // routing join are the identity — scan the bucketed codes table
    // once against the broadcast query set
    val cand =
      if (nProbe == Int.MaxValue)
        s.table(SimilarityQueries.ivfCodesTable(s, d))
          .select(col("vec_id"), col("codes"))
          .crossJoin(broadcast(queries.select("qid")))
      else {
        val coarse = s.table(centTbl)
        val wProbe = Window.partitionBy("qid")
          .orderBy(round(col("qcos"), 6).desc, col("cent_id"))
        val probes = queries.crossJoin(broadcast(coarse))
          .select(col("qid"), col("cent_id"),
            SimilarityQueries.cosineExpr("qe", "ce").as("qcos"))
          .withColumn("prank", row_number().over(wProbe))
          .filter(col("prank") <= nProbe)
          .select(col("qid"), col("cent_id"))
        probes
          .join(s.table(SimilarityQueries.ivfCodesTable(s, d)), "cent_id")
          .select(col("qid"), col("vec_id"), col("codes"))
      }
    adcTopK(cand, distTable(queries, pqCodebook(embD(s, d))), k)
  }

  val pqTopKSql: String = {
    val m = NumSubs; val sd = SubDim; val nc = NumCents
    val st = PqCentStride; val off = PqCentOffset
    // subspace-j squared L2 between DuckDB 1-based list slices, same
    // ascending-i summation as the Spark HOF
    def subd(a: String, b: String) =
      s"[list_sum([($a[j * $sd + i] - $b[j * $sd + i]) * ($a[j * $sd + i] - $b[j * $sd + i]) " +
        s"for i in generate_series(1, $sd)]) for j in generate_series(0, ${m - 1})]"
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |cents AS (SELECT CAST((vec_id - $off) // $st AS INT) AS c, e AS ce FROM v
       |  WHERE vec_id % $st = $off AND vec_id < ${st * nc + off}),
       |sdv AS (SELECT v.vec_id, cents.c, ${subd("v.e", "cents.ce")} AS sd FROM v CROSS JOIN cents),
       |sde AS (SELECT vec_id, c, unnest(sd) AS d, unnest(generate_series(0, ${m - 1})) AS j FROM sdv),
       |am AS (SELECT vec_id, j, c, row_number() OVER (PARTITION BY vec_id, j ORDER BY round(d, 9), c) AS rn FROM sde),
       |codes AS (SELECT vec_id, list(c ORDER BY j) AS codes FROM am WHERE rn = 1 GROUP BY vec_id),
       |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id % 100 = 0),
       |qd AS (SELECT q.qid, cents.c, ${subd("q.qe", "cents.ce")} AS sd FROM q CROSS JOIN cents),
       |dt AS (SELECT qid, list(sd ORDER BY c) AS dtab FROM qd GROUP BY qid),
       |adc AS (SELECT dt.qid, codes.vec_id,
       |  list_sum([dt.dtab[codes.codes[j + 1] + 1][j + 1] for j in generate_series(0, ${m - 1})]) AS adc
       |  FROM dt CROSS JOIN codes WHERE codes.vec_id <> dt.qid),
       |ranked AS (SELECT qid, vec_id, adc, row_number() OVER (PARTITION BY qid ORDER BY round(adc, 6), vec_id) AS rank FROM adc)
       |SELECT qid, vec_id AS neighbor_id, CAST(rank AS INT) AS rank, round(adc, 4) AS adc_dist
       |FROM ranked WHERE rank <= 5""".stripMargin.replace("\n", " ")
  }
}
