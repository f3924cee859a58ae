package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Deduplication operators for the training-data pipeline: exact
  * (hash-groupBy), MinHash+LSH banding, SimHash blocking, and
  * banded-candidate exact-Jaccard near-dup pairs.
  *
  * Scale design: every near-dup variant is
  *   per-row signature (no shuffle) → explode bands/blocks →
  *   shuffle ONCE on the small band key → within-bucket pairs →
  *   exact verification on the candidates only.
  * The candidate generator is always a signature-derived key whose
  * bucket count GROWS with the data (band values are 122-bit-ish
  * strings, SimHash blocks are 2^16 per index), so no fixed-cardinality
  * blocking key (e.g. language × source) can degenerate to O(n²) within
  * a hot block. Driver holds no per-doc state.
  *
  * Oracle story: all hash math bottoms out in md5 (identical in DuckDB
  * via `md5_number_lower`) plus universal-hash constants generated here
  * and injected into the oracle SQL as literals — so the DuckDB twin
  * recomputes the exact same signatures, bands, candidates and Jaccard
  * scores, LSH misses included.
  */
object DedupQueries {
  val MinHashPerms = 64
  val BandRows     = 2   // 32 bands × 2 rows: P[miss | J] = (1-J²)^32 — ≈1e-4 at J=0.5
  val MinHashBands: Int = MinHashPerms / BandRows
  val MinHashSeed  = 42L
  val ShingleN     = 3
  val MinJaccard   = 0.5

  private val Perms: Array[(Long, Long)] =
    Hashing.permConstants(MinHashPerms, MinHashSeed)

  /** Exact dedup via content-hash groupBy: one shuffle on md5(text).
    * At 100 TB, group on the hash (fixed 32 bytes), never on raw text. */
  def exactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  val exactDedupSql: String =
    "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies FROM documents GROUP BY md5(text)"

  /** q103 — exact dedup with a QUALITY-AWARE survivor: where q16 keeps
    * the smallest id (crawl order), production dedup keeps the BEST
    * copy of each duplicate group — here the longest normalized text
    * (n_chars), id as the deterministic tiebreak. The whole policy is
    * one struct-max aggregate — `max(struct(n_chars, −doc_id))` orders
    * by quality then by SMALLEST id — so survivor choice rides the
    * same single exchange the q16 groupBy already pays: changing the
    * keep policy costs nothing at 100 TB. Normalization strips
    * non-alphanumerics (the q54/streaming-dedup fingerprint family) so
    * formatting-only variants collapse into one group. */
  def dedupKeepBest(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
        .as("content_hash"))
      .agg(
        max(struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("best"),
        count(lit(1)).as("n_copies"))
      .select(col("content_hash"), (-col("best.nid")).as("keep_id"),
        col("best.n_chars").as("keep_chars"), col("n_copies"))

  val dedupKeepBestSql: String =
    """WITH g AS (SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS content_hash,
      |  doc_id, n_chars,
      |  row_number() OVER (PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
      |    ORDER BY n_chars DESC, doc_id) AS rn,
      |  count(*) OVER (PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) AS n_copies
      |  FROM documents)
      |SELECT content_hash, doc_id AS keep_id, n_chars AS keep_chars, n_copies
      |FROM g WHERE rn = 1""".stripMargin.replace("\n", " ")

  /** text → the 32 LSH band values ("v0:v1" strings of consecutive
    * signature slots). One NATIVE expression call computes base hashes
    * + the full signature + band formatting — a single pass per row,
    * no shuffle, no UDF encoder roundtrip, inside whole-stage codegen
    * ([[graft.functions.MinHashBandVals]]; the Scala-UDF original is
    * the r13 conversion's baseline in PERF_NOTES). Same permutation
    * family: permConstants(bands·rows, seed) ≡ Perms.take(bands·rows). */
  private def bandValsCol(text: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.minHashBandVals(
      text, ShingleN, MinHashBands, BandRows, MinHashSeed, charGrain = false)

  /** Per-doc MinHash signatures exploded to LSH band values. Input to
    * the band-bucket shuffle; also a useful persisted artifact
    * (signatures are computed once, reused across dedup runs). */
  def minHashBands(s: SparkSession, d: String): DataFrame =
    minHashBandsOf(spreadScan(s, Tables.documents(s, d)))

  /** Same, over an arbitrary (doc_id, text) slice — lets the batch
    * side of incremental dedup compute signatures for ONLY today's
    * documents instead of the whole table. */
  def minHashBandsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(bandValsCol(col("text"))).as(Seq("band", "band_val")))

  // ---- shared DuckDB CTE fragments (must mirror Hashing exactly) ----

  /** words → 3-word shingles, <3 tokens → the whole text as 1 shingle
    * (Hashing.wordShingles). */
  private val shinglesCte: String =
    """ws AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS w FROM documents),
      |sh AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      |  ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] END AS shingles FROM ws)""".stripMargin

  private def permValues: String =
    Perms.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }
      .mkString("perms(perm, a, b) AS (SELECT * FROM (VALUES ", ", ", "))")

  /** doc_id, band, band_val — the exact twin of [[minHashBands]]. */
  private def bandsCtes: String =
    s"""$shinglesCte,
       |$permValues,
       |base AS (SELECT doc_id, CAST(md5_number_lower(s) >> 3 AS BIGINT) AS x
       |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
       |sig AS (SELECT doc_id, perm,
       |  min(CAST((CAST(a AS HUGEINT) * x + b) % ${Hashing.MersennePrime} AS BIGINT)) AS v
       |  FROM base, perms GROUP BY doc_id, perm),
       |bands AS (SELECT doc_id, CAST(perm // $BandRows AS INT) AS band,
       |  string_agg(CAST(v AS VARCHAR), ':' ORDER BY perm) AS band_val
       |  FROM sig GROUP BY doc_id, perm // $BandRows)""".stripMargin

  val minHashBandsSql: String =
    s"WITH ${bandsCtes.replace("\n", " ")} SELECT doc_id, band, band_val FROM bands"

  /** LAYOUT-PROOF the corpus scan ahead of CPU-heavy per-doc hashing
    * (shingle/signature projections). The test-harness parquet files
    * are single-file single-ROW-GROUP (the driver's testdata and
    * ScaleData's coalesce(1) output), and a parquet scan cannot split
    * inside a row group — so the scan stage, and with it the ENTIRE
    * pipelined shingle/hash projection, runs as ONE task however many
    * cores the session has. That serial stage is why the pair family's
    * round-over-round numbers tracked single-core machine throughput
    * instead of plan quality (r14→r17 "creep", VERDICT r17 item 3:
    * q166 26→86 s with code, data and output bit-identical).
    *
    * Fix: when the scan yields under HALF the session's shuffle width,
    * redistribute the (doc_id, text) rows round-robin BEFORE the
    * projection. Gated on the actual scan parallelism, so on a
    * realistically-laid-out corpus (100 TB = thousands of row groups)
    * this is a no-op passthrough — the shuffle only exists where a
    * degenerate layout does. The half-width gate (r18 advice) is
    * deliberate: a mid-size layout at, say, 20 of 32 partitions is
    * NOT the pathology this guards against (one row group serializing
    * a CPU stage), and a full-corpus text shuffle to close a ≤2× gap
    * costs more than it buys; below half-width the worst-case CPU
    * serialization exceeds 2× and the shuffle pays for itself. The
    * `df.rdd.getNumPartitions` probe does force physical planning of
    * the scan subplan per call — milliseconds, amortized against the
    * CPU-heavy hashing stages every caller feeds. */
  private[graft] def spreadScan(s: SparkSession, df: DataFrame): DataFrame = {
    val width = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (df.rdd.getNumPartitions * 2 <= width) df.repartition(width) else df
  }

  /** MinHash+LSH near-dup pairs: candidates share ≥ 1 band bucket
    * (ONE shuffle on the band value), then exact shingle-set Jaccard is
    * recomputed on the candidates only and filtered to ≥ minJaccard.
    * This is the scale-correct replacement for (lang, source)-blocked
    * all-pairs Jaccard: the pair space is bounded by signature
    * similarity, not by a handful of metadata blocks. */
  def minHashJaccardPairs(s: SparkSession, d: String,
                          minJaccard: Double = MinJaccard): DataFrame =
    minHashJaccardPairsFromBands(
      minHashBands(s, d),
      Tables.documents(s, d).select("doc_id", "text"), minJaccard)

  /** Pair generation from a PRECOMPUTED band table — at 100 TB persist
    * [[minHashBands]] once (parquet, bucketed by band_val) and pass it
    * here: the self-join then reads the signature table twice instead
    * of recomputing every signature on both sides of the join.
    *
    * Candidates come from a band-table SELF-JOIN on (band, band_val):
    * both sides shuffle on the same key from the same canonical subplan,
    * so ReuseExchange computes the signature UDF once and the hash join
    * STREAMS each bucket's pair space — an r4 experiment that rewrote
    * this as groupBy + collect_set + a pair-exploding HOF materialized
    * each bucket's O(B²) pair array in memory and was 10× slower on the
    * skewed buckets (measured: q19 2.0 s → 20.9 s at sf0.1). Join wins.
    *
    * The exact-Jaccard verify stage (r4) joins the tiny candidate pair
    * set against the docs table TWICE (doc_a text, doc_b text) — AQE
    * sees the pair set's runtime size and broadcasts it, so both doc
    * scans stream map-side with ZERO corpus shuffle — and shingles per
    * pair inside the verify UDF. Verify cost scales with candidate
    * count, not corpus size (the r3 version shingled every document,
    * twice); per-pair text shipping is no heavier than the r3 design,
    * which shipped the even-larger distinct-shingle arrays per pair. */
  def minHashJaccardPairsFromBands(bands: DataFrame, docs: DataFrame,
                                   minJaccard: Double = MinJaccard): DataFrame = {
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact shingle-set Jaccard per candidate pair — mirrors the
    // oracle's shs CTE; scaled-integer form so the threshold compare
    // and the shipped double are engine-exact (FLOAT RULE)
    val jaccardUdf = udf { (ta: String, tb: String) =>
      Hashing.exactJaccardX10k(
        Hashing.wordShingles(ta, ShingleN).distinct,
        Hashing.wordShingles(tb, ShingleN).distinct)
    }
    // no broadcast hint: AQE broadcasts the pair side when its runtime
    // size allows (the common case) and falls back to a shuffled join
    // when a dup-heavy corpus makes the pair set itself large — a
    // pinned hint would OOM exactly there
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        jaccardUdf(col("text_a"), col("text_b")).as("jx"))
      .filter(col("jx") >= math.round(minJaccard * 10000))
      .select(col("doc_a"), col("doc_b"),
        (col("jx").cast("double") / 10000.0).as("jaccard"))
  }

  val minHashJaccardPairsSql: String = {
    // scaled-integer jaccard: identical half-up arithmetic to
    // Hashing.exactJaccardX10k (greatest(,1) = the union==0 → 0 branch)
    val jx = "(CAST(len(list_intersect(x.ss, y.ss)) AS BIGINT) * 10000 " +
      "+ (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))) // 2) " +
      "// greatest(len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss)), 1)"
    (s"""WITH $bandsCtes,
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |shs AS (SELECT doc_id, list_distinct(shingles) AS ss FROM sh),
        |jj AS (SELECT doc_a, doc_b, $jx AS jx
        |  FROM cand JOIN shs x ON x.doc_id = cand.doc_a JOIN shs y ON y.doc_id = cand.doc_b)
        |SELECT doc_a, doc_b, CAST(jx AS DOUBLE) / 10000.0 AS jaccard
        |FROM jj WHERE jx >= ${math.round(MinJaccard * 10000)}""").stripMargin.replace("\n", " ")
  }

  // ------------------------------------------ banding planner (q258)

  /** q258 candidate (bands, rows) splits of the 64-permutation
    * budget, and the planner's stricter target threshold τ = 0.7. */
  val PlannerConfigs: Seq[(Int, Int)] =
    Seq((64, 1), (32, 2), (16, 4), (8, 8), (4, 16), (2, 32))
  val PlannerTauX10k = 7000L
  /** FLOOR of the planner's doc-sampling modulus (1/4 docs → 1/16
    * pair mass at small corpora — the q138 [[AuditMod]] convention). */
  val PlannerSampleModFloor = 4L
  /** Divisor turning √N into the modulus: mod = max(floor,
    * ⌊√N⌋ div 16). Calibrated so the fixture corpora (sf0.01/sf0.1,
    * N ≤ ~25k) keep the historical mod = 4 exactly (decisions
    * unchanged), while bigger corpora sample at rate Θ(1/√N). */
  val PlannerSampleSqrtDiv = 16L

  /** q258 sampling modulus, Θ(√N): docs sampled ∝ √N, so sampled
    * PAIR mass ∝ N/mod² = Θ(256·w/N per histogram bin of true mass
    * w) — with duplicate-pair mass growing ∝ N (a fixed dup rate),
    * the per-bin expected sample count is CONSTANT in N and the
    * histogram's relative error stays bounded at ~mod/√w =
    * Θ(√N/(16·√w)) — the same fixed-relative-error contract the
    * HLL/Bloom sketches document. Planner cost is Θ(√N) docs through
    * the signature pipeline: sub-linear, which is what a PLAN-TIME
    * tool must be at 100 TB. ⌊√N⌋ via IEEE sqrt is exact for
    * N < 2⁵² (the true root is ≥ 2⁻⁷ below the next integer at any
    * realistic N, far beyond half-ulp), so both engines embed the
    * identical modulus by construction. */
  def plannerSampleMod(nDocs: Long): Long =
    math.max(PlannerSampleModFloor,
      math.sqrt(nDocs.toDouble).toLong / PlannerSampleSqrtDiv)

  /** q258 — BANDING PLANNER: pick (bands, rows) for a STRICTER dedup
    * target (τ = 0.7) from the MEASURED similarity distribution of
    * the current candidates, instead of eyeballing the S-curve. For
    * each split b×r of the 64-permutation budget, the catch
    * probability p(s) = 1 − (1 − s^r)^b is a CONSTANT per Jaccard
    * bin — computed once driver-side (BigDecimal-rounded ppm
    * literals embedded in BOTH engines' plans, so cross-engine
    * equality is by construction, not libm luck) — and the planner
    * weights those constants by the q19 pair histogram: expected
    * recall on the must-keep mass (J ≥ τ) vs expected false-candidate
    * rate on the shed-able mass (J < τ). Chosen = argmax(keep −
    * shed), ties to fewer bands (cheaper index).
    *
    * Honest conditioning, documented: the histogram is over pairs the
    * CURRENT (32×2, J ≥ 0.5) pipeline surfaces on a deterministic
    * 1/[[plannerSampleMod]] doc sample — mod = Θ(√N), so planner
    * cost is SUB-LINEAR in the corpus while each histogram bin keeps
    * a fixed expected sample count (error bound at the def) — the
    * q138 audit posture: a PLANNER reads a distribution sketch, it
    * never pays the full pair pipeline (measured 41.3 → 13.0 s at
    * sf1 with the fixed mod 4; the √N mod shrinks the sample further
    * as N grows). Pairs below today's threshold are not observable
    * here; q138's sampled audit covers that tail.
    *
    * Scale shape: sampled-candidate-grain pairs folded to ≤ 11 bins;
    * everything after is a 6-config × 11-bin constant join. */
  def bandingPlanner(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // SAMPLED histogram (the q138 posture): a planner reads a 1/16
    // pair-mass sketch of the distribution, never the full pair
    // pipeline — the doc filter is on doc_id alone so it pushes below
    // the shingle/minhash projection (measured: 41.3 → 4.4 s at sf1)
    val mod = plannerSampleMod(Tables.documents(s, d).count())
    val sampled = Tables.documents(s, d).select("doc_id", "text")
      .filter(graft.functions.GraftFunctions.md5Lower64(
          concat_ws("|", lit("plan:"), col("doc_id")))
        .bitwiseAND(Long.MaxValue) % mod === 0L)
    val hist = minHashJaccardPairsFromBands(minHashBandsOf(sampled), sampled)
      .select(expr("CAST(round(jaccard * 10000) AS BIGINT) div 500").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("w"))
    import s.implicits._
    val cdf = plannerConstants.toDF("b", "r", "bin", "p_ppm")
    val agg = hist.join(broadcast(cdf), "bin")
      .groupBy("b", "r")
      .agg(
        sum(when(col("bin") >= PlannerTauX10k / 500, col("w") * col("p_ppm")))
          .as("hi_mass"),
        sum(when(col("bin") >= PlannerTauX10k / 500, col("w"))).as("hi_w"),
        sum(when(col("bin") < PlannerTauX10k / 500, col("w") * col("p_ppm")))
          .as("lo_mass"),
        sum(when(col("bin") < PlannerTauX10k / 500, col("w"))).as("lo_w"))
      .select(col("b"), col("r"),
        expr("coalesce(hi_mass, 0) div greatest(coalesce(hi_w, 0), 1)")
          .as("keep_recall_ppm"),
        expr("coalesce(lo_mass, 0) div greatest(coalesce(lo_w, 0), 1)")
          .as("shed_catch_ppm"))
      .withColumn("score",
        col("keep_recall_ppm") - col("shed_catch_ppm"))
    agg.withColumn("rn", row_number().over(
        Window.orderBy(col("score").desc, col("b"))).cast("long"))
      .select(col("b"), col("r"), col("keep_recall_ppm"),
        col("shed_catch_ppm"), col("score"),
        when(col("rn") === 1L, 1L).otherwise(0L).as("chosen"))
  }

  /** The (b, r, bin, p_ppm) constant grid — p = 1 − (1 − s^r)^b at
    * the bin center s = (bin·500 + 250)/10⁴ (bin 20, J = 1 exactly,
    * takes p = 1), rounded half-up to ppm driver-side. */
  private def plannerConstants: Seq[(Int, Int, Long, Long)] =
    for {
      (b, r) <- PlannerConfigs
      bin <- 10L to 20L
    } yield {
      val s = if (bin >= 20L) 1.0 else (bin * 500L + 250L).toDouble / 10000.0
      val p = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
      (b, r, bin,
        BigDecimal(p * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }

  val bandingPlannerSql: String = {
    val values = plannerConstants
      .map { case (b, r, bin, p) => s"($b, $r, $bin, $p)" }.mkString(", ")
    val tauBin = PlannerTauX10k / 500
    // the CTE named `documents` shadows the base table inside the
    // embedded q19 SQL — the sample filter lands below everything
    s"""WITH smod AS (SELECT greatest($PlannerSampleModFloor,
       |  CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)
       |    // $PlannerSampleSqrtDiv) AS m FROM main.documents),
       |documents AS (SELECT * FROM main.documents
       |  WHERE CAST(md5_number_lower('plan:' || '|' || CAST(doc_id AS VARCHAR))
       |    & ${Long.MaxValue} AS BIGINT) % (SELECT m FROM smod) = 0),
       |pairs AS ($minHashJaccardPairsSql),
       |hist AS (SELECT CAST(round(jaccard * 10000) AS BIGINT) // 500 AS bin,
       |  CAST(count(*) AS BIGINT) AS w FROM pairs GROUP BY 1),
       |cdf AS (SELECT CAST(b AS INT) AS b, CAST(r AS INT) AS r,
       |  CAST(bin AS BIGINT) AS bin, CAST(p_ppm AS BIGINT) AS p_ppm
       |  FROM (VALUES $values) AS t(b, r, bin, p_ppm)),
       |agg AS (SELECT b, r,
       |  CAST(coalesce(sum(CASE WHEN hist.bin >= $tauBin THEN w * p_ppm END), 0)
       |    // greatest(coalesce(sum(CASE WHEN hist.bin >= $tauBin THEN w END), 0), 1)
       |    AS BIGINT) AS keep_recall_ppm,
       |  CAST(coalesce(sum(CASE WHEN hist.bin < $tauBin THEN w * p_ppm END), 0)
       |    // greatest(coalesce(sum(CASE WHEN hist.bin < $tauBin THEN w END), 0), 1)
       |    AS BIGINT) AS shed_catch_ppm
       |  FROM hist JOIN cdf ON cdf.bin = hist.bin GROUP BY 1, 2),
       |sc AS (SELECT *, keep_recall_ppm - shed_catch_ppm AS score FROM agg)
       |SELECT b, r, keep_recall_ppm, shed_catch_ppm, score,
       |  CAST(CASE WHEN row_number() OVER (ORDER BY score DESC, b) = 1
       |    THEN 1 ELSE 0 END AS BIGINT) AS chosen
       |FROM sc""".stripMargin.replace("\n", " ")
  }

  // -------------------------------------- banding recall audit (q138)

  /** Sampling modulus for the q138 audit's doc sample (final literal —
    * the r10 init-cycle rule). Both PAIR endpoints must survive, so a
    * near-dup pair survives at 1/AuditMod² — 4 keeps enough true pairs
    * in the sample to populate the curve's high-J bins. */
  final val AuditMod = 4L

  /** q138 — BANDING RECALL AUDIT: the measured catch-probability curve
    * of the (32 bands × 2 rows) LSH config, per exact-Jaccard decile —
    * the surface-dedup twin of q112's ANN recall eval. Banding's
    * guarantee is probabilistic (P[caught | J] = 1 − (1 − J²)³²); this
    * op MEASURES it on the corpus instead of trusting the formula, so
    * a (b, r) retune — or a shingling change that shifts the J
    * distribution — shows up as a recall number, not an anecdote.
    * Output: per Jaccard bin (jx div 1000), pair count, pairs sharing
    * ≥ 1 band bucket, and integer fixed-point recall — ≤ 11 rows.
    *
    * Ground truth needs Jaccard on pairs banding did NOT catch, so
    * candidates cannot bound the work. Bounding is two-level:
    * (1) sample DOCS (md5-deterministic, mod [[AuditMod]]; at 100 TB
    * cap |S| exactly with the q77 order-statistic threshold pattern);
    * (2) within the sample, NEVER materialize |S|²/2 pairs — a naive
    * pair join shipping two shingle arrays per pair measured 27 s at
    * sf0.1 on serialization alone. Instead a SPARSE set-similarity
    * join: explode to (doc, shingle-hash) rows, equi-join on the hash
    * (cost = Σ per-hash doc-count², i.e. the actual shared-shingle
    * mass — similarity work scales with similarity, 1.3 s at sf0.1),
    * derive |intersection| per CO-OCCURRING pair by counting, and
    * reconstruct the disjoint remainder (Jaccard 0, bin 0)
    * arithmetically from C(|S|,2) minus the co-occurring count — the
    * zero-similarity ocean is counted, never enumerated. Hashes are
    * the same md5>>3 longs the oracle's `base` CTE computes, so both
    * engines see identical sets; every downstream ratio is integer
    * `div` (FLOAT RULE). */
  def bandingRecall(s: SparkSession, d: String): DataFrame = {
    val sampled = Tables.documents(s, d).select("doc_id", "text")
      .filter(graft.functions.GraftFunctions.md5Lower64(
          concat_ws("|", lit("audit:"), col("doc_id")))
        .bitwiseAND(Long.MaxValue) % AuditMod === 0L)
    // ONE tokenize/shingle projection feeds BOTH halves (VERDICT r12
    // wrong-2: the intersection join and the banding side used to run
    // two independent UDF pipelines over the sampled texts). The
    // distinct-hash arrays are persisted — audit-sample-bounded
    // (~|S|·set-size longs; at 100 TB AuditMod caps |S|), and Bench's
    // clearCache() drops it after materialization — so the shingling
    // truly runs once, not once per plan branch.
    val hashed = sampled
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingleHashes(col("text"), ShingleN).as("hs"))
      .persist()
    val docHash = hashed.select(col("doc_id"), explode(col("hs")).as("h"))
    val sizes = docHash.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // sparse intersection counts: only pairs sharing ≥ 1 shingle appear
    val interPairs = docHash.as("ha")
      .join(docHash.as("hb"),
        col("ha.h") === col("hb.h") && col("ha.doc_id") < col("hb.doc_id"))
      .groupBy(col("ha.doc_id").as("doc_a"), col("hb.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("CAST((inter * 10000 + (sz_a + sz_b - inter) div 2) div (sz_a + sz_b - inter) AS BIGINT)")
          .as("jx"))
    // the banding side reads the SAME persisted hash arrays — the min
    // of a signature permutation is duplicate-invariant, so bands from
    // distinct hashes ≡ bands from the shingle multiset
    val bands = hashed.select(col("doc_id"),
      posexplode(graft.functions.GraftFunctions.bandValsFromHashes(
        col("hs"), MinHashBands, BandRows, MinHashSeed)).as(Seq("band", "band_val")))
    val caught = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .withColumn("hit", lit(1))
    val binnedInter = interPairs.join(caught, Seq("doc_a", "doc_b"), "left")
      .groupBy(expr("CAST(jx div 1000 AS INT)").as("jx_bin"))
      .agg(count(lit(1)).as("n_pairs"), count(col("hit")).as("n_caught"))
    // the disjoint remainder: C(|S|,2) − co-occurring pairs, all at
    // Jaccard 0 → bin 0; banding hits among them (signature-collision
    // pairs with zero real overlap) counted by anti-join — three 1-row
    // aggregates crossed in, nothing pair-sized. |S| counts docs WITH
    // ≥ 1 shingle (count of `sizes`, not of `sampled`): the oracle's
    // shs/pairs CTEs join through `base`, so a sampled doc shorter
    // than ShingleN words is outside its pair universe — both engines
    // must enumerate the same one
    val nS = sizes.agg(count(lit(1)).as("n_s"))
    val nInter = interPairs.agg(count(lit(1)).as("ip"))
    val caughtDisjoint = caught
      .join(interPairs.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_anti")
      .agg(count(lit(1)).as("cd"))
    val remainder = nS.crossJoin(nInter).crossJoin(caughtDisjoint)
      .select(lit(0).as("jx_bin"),
        expr("CAST((n_s * (n_s - 1)) div 2 - ip AS BIGINT)").as("n_pairs"),
        col("cd").as("n_caught"))
    binnedInter.unionByName(remainder)
      .groupBy("jx_bin")
      .agg(sum("n_pairs").as("n_pairs"), sum("n_caught").as("n_caught"))
      .filter(col("n_pairs") > 0)
      .withColumn("recall_x10k",
        expr("CAST(n_caught * 10000 div n_pairs AS BIGINT)"))
  }

  val bandingRecallSql: String = {
    val jx = "(CAST(len(list_intersect(x.ss, y.ss)) AS BIGINT) * 10000 " +
      "+ (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))) // 2) " +
      "// greatest(len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss)), 1)"
    s"""WITH $bandsCtes,
       |smp AS (SELECT doc_id FROM documents
       |  WHERE CAST(md5_number_lower('audit:' || '|' || CAST(doc_id AS VARCHAR))
       |    & ${Long.MaxValue} AS BIGINT) % $AuditMod = 0),
       |shs AS (SELECT base.doc_id, list_distinct(list(x)) AS ss
       |  FROM base JOIN smp ON smp.doc_id = base.doc_id GROUP BY base.doc_id),
       |pairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, $jx AS jx
       |  FROM shs x JOIN shs y ON x.doc_id < y.doc_id),
       |caught AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
       |  JOIN smp sa ON sa.doc_id = a.doc_id JOIN smp sb ON sb.doc_id = b.doc_id)
       |SELECT CAST(jx // 1000 AS INT) AS jx_bin, count(*) AS n_pairs,
       |  CAST(count(c.doc_a) AS BIGINT) AS n_caught,
       |  CAST(count(c.doc_a) * 10000 // count(*) AS BIGINT) AS recall_x10k
       |FROM pairs p LEFT JOIN caught c ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b
       |GROUP BY 1""".stripMargin.replace("\n", " ")
  }

  /** text → [simhash blocks 0..3] (md5-token-hash SimHash, 16-bit
    * pigeonhole blocks — Hamming ≤ 3 ⇒ ≥ 1 identical block). Native
    * expression ([[graft.functions.SimHashBlocksExpr]]) since r13. */
  private def simBlocksCol(text: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.simHashBlocks(text)

  /** SimHash fingerprints as their 4 × 16-bit pigeonhole blocks: a
    * groupBy on any (block index, block value) finds all Hamming ≤ 3
    * candidates in one shuffle; block space is 2^16 per index so bucket
    * sizes shrink as the corpus grows. */
  def simHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), simBlocksCol(col("text")).as("blk"))
      .select(col("doc_id"),
        col("blk")(0).as("block0"), col("blk")(1).as("block1"),
        col("blk")(2).as("block2"), col("blk")(3).as("block3"))

  /** DuckDB twin of [[simHash]]: identical md5 token hashes, identical
    * strict `> 0` bit rule; empty-token docs produce all-zero blocks. */
  val simHashSql: String = {
    val blocks = (0 to 3).map { k =>
      s"COALESCE(CAST(sum(CASE WHEN b >= ${k * 16} AND b < ${(k + 1) * 16} AND bit = 1 THEN 1 << (b - ${k * 16}) ELSE 0 END) AS INT), 0) AS block$k"
    }.mkString(", ")
    ("""WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS tok FROM documents),
       |th AS (SELECT doc_id, md5_number_lower(tok) AS h FROM toks),
       |bits AS (SELECT doc_id, b,
       |  CASE WHEN sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS bit
       |  FROM th, range(64) r(b) GROUP BY doc_id, b)
       |SELECT d.doc_id, """ + blocks +
      " FROM documents d LEFT JOIN bits ON bits.doc_id = d.doc_id GROUP BY d.doc_id").stripMargin.replace("\n", " ")
  }

  /** The dedup KEEP-LIST: drop every doc that appears as the higher id
    * of a verified near-dup pair (greedy keep-lowest-id — the standard
    * "drop later duplicates" policy; like all pair-greedy dedup it is
    * not transitive-closure clustering, documented). One anti-join
    * against the banded pair set — no extra shuffle beyond q19's. */
  def nearDupKeep(s: SparkSession, d: String,
                  minJaccard: Double = MinJaccard): DataFrame = {
    val drop = minHashJaccardPairs(s, d, minJaccard).select("doc_b").distinct()
    Tables.documents(s, d)
      .join(drop, col("doc_id") === col("doc_b"), "left_anti")
      .select("doc_id", "lang", "source")
  }

  val nearDupKeepSql: String =
    s"SELECT doc_id, lang, source FROM documents WHERE doc_id NOT IN " +
      s"(SELECT doc_b FROM ($minHashJaccardPairsSql))"

  /** Transitive-closure dedup CLUSTERS: connected components over the
    * MinHash-verified near-dup pair graph, every document labeled with
    * the minimum doc_id reachable from it (singletons label themselves).
    * This is the clustering q28's pair-greedy keep-list deliberately
    * isn't: A~B, B~C puts A,B,C in one cluster even when A~C was never
    * emitted as a pair.
    *
    * Algorithm: iterative min-label propagation — per round, each node
    * takes min(own label, neighbors' labels); fixpoint after
    * O(component diameter) rounds. Near-dup components are shallow
    * (dup clusters are cliques-ish), so rounds stay single-digit; a
    * 100 TB run with adversarial chain-shaped graphs would switch to
    * large-star/small-star (Kiveris et al.) to collapse rounds to
    * O(log diameter) — same per-round join+min-agg shuffle shape as
    * here, so the physical plan survives the swap. Driver holds only
    * the loop counter and the converged? count — never vertex state. */
  def dedupClusters(s: SparkSession, d: String,
                    minJaccard: Double = MinJaccard): DataFrame =
    clustersFromEdges(
      Tables.documents(s, d).select("doc_id"),
      minHashJaccardPairs(s, d, minJaccard).select("doc_a", "doc_b"))

  /** Core label propagation: (doc_id) vertices × (doc_a, doc_b) edges →
    * (doc_id, cluster = min reachable doc_id).
    *
    * r5 loop shape — ONE join + ONE aggregate + ONE driver action per
    * iteration (the r4 shape ran join→agg→join per round plus a second
    * join+count job for the convergence check, VERDICT r4 item 5):
    *  - the adjacency carries a SELF-LOOP per vertex, so the per-round
    *    msg join + min-agg yields min(own ∪ neighbors) directly — no
    *    trailing left-join back onto labels;
    *  - the self-loop row also smuggles the vertex's OWN previous label
    *    through the aggregate (min over rows where nb = src), so the
    *    convergence signal (labels are monotone non-increasing:
    *    changed ⇔ new < old) rides the same pass. */
  def clustersFromEdges(docs: DataFrame, edges: DataFrame,
                        maxIters: Int = 50): DataFrame =
    clustersFromEdgesWithStats(docs, edges, maxIters)._1

  /** [[clustersFromEdges]] plus (rounds run, labels still changing in
    * the last round) — exposed so tests can pit propagation's
    * O(diameter) round count against star contraction's O(log n) on
    * adversarial graphs instead of asserting the trade-off in prose. */
  private[graft] def clustersFromEdgesWithStats(
      docs: DataFrame, edges: DataFrame,
      maxIters: Int = 50): (DataFrame, Int, Long) = {
    // both edge orientations from ONE pass over the (expensive) pair
    // pipeline — union(edges, edges.swap) would execute it twice
    val adj = edges
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("nb")),
        struct(col("doc_b").as("src"), col("doc_a").as("nb")))).as("e"))
      .select(col("e.src").as("src"), col("e.nb").as("nb"))
      .union(docs.select(col("doc_id").as("src"), col("doc_id").as("nb")))
      .persist()
    var labels = docs.select(col("doc_id"), col("doc_id").as("cluster"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // localCheckpoint, not persist, for the SAME reason as the star
      // loop below: persist caches data but keeps the full logical
      // plan, so round k re-analyzes a k-level-deep nest of every
      // previous round's join — planning, not execution, came to
      // dominate past ~10 rounds (exposed by DedupSpec's 5k-chain
      // adversarial graph; invisible at the ≤3 rounds real near-dup
      // graphs take). Checkpointing truncates each round's plan to a
      // scan of the materialized label set.
      val next = adj
        .join(labels.select(col("doc_id").as("nb"), col("cluster")), "nb")
        .groupBy(col("src").as("doc_id"))
        .agg(
          min("cluster").as("cluster"),
          min(when(col("nb") === col("src"), col("cluster"))).as("old"))
        .select(col("doc_id"), col("cluster"),
          (col("cluster") < col("old")).as("chg"))
        .localCheckpoint(true)
      changed = next.agg(sum(when(col("chg"), 1L).otherwise(0L))).head()
        .getLong(0)
      labels.unpersist() // no-op on iteration 0 (initial labels unpersisted)
      labels = next
      iter += 1
    }
    adj.unpersist()
    (labels.select("doc_id", "cluster"), iter, changed)
  }

  /** DuckDB twin: min reachable id per node via a recursive CTE over the
    * same verified pair set (UNION dedup bounds the recursion). */
  val dedupClustersSql: String =
    "WITH RECURSIVE adj AS (SELECT doc_a AS src, doc_b AS nb FROM " +
      s"($minHashJaccardPairsSql) UNION ALL SELECT doc_b, doc_a FROM ($minHashJaccardPairsSql)), " +
      "reach(doc_id, lbl) AS (SELECT doc_id, doc_id FROM documents " +
      "UNION SELECT a.src, r.lbl FROM adj a JOIN reach r ON r.doc_id = a.nb) " +
      "SELECT doc_id, min(lbl) AS cluster FROM reach GROUP BY doc_id"

  /** q271 — DEDUP-CLUSTER SIZE DISTRIBUTION: the telemetry row a
    * dedup owner reads after every run — is the duplicate mass a few
    * MEGA-clusters (template spam, mirrored sites: one representative
    * saves thousands of docs) or a long tail of pairs (benign
    * near-edits: diminishing returns)? Per cluster size: how many
    * clusters, how many docs they hold, and the doc mass the q105
    * keep-one-representative policy would remove at that size (size−1
    * per cluster). The q45 labels feed a size-grain rollup; singleton
    * "clusters" (never matched) are the size-1 row, so Σ n_docs =
    * |corpus| exactly (spec-pinned).
    *
    * Scale shape: PERSIST-AND-PROBE. Telemetry is read often and the
    * labels change only when the corpus snapshot does, so the
    * clustering (q64 large/small-star over the verified pairs — the
    * expensive part) runs ONCE per snapshot into the durable
    * [[clusterAssignmentTable]] (the [[corpusIndex]] lifecycle:
    * snapshot-tagged location, build-once lock, completion marker);
    * every telemetry pull after that is one (cluster) count aggregate
    * + one (size) rollup over the persisted labels — no pair
    * enumeration, no star contraction, cost ∝ |corpus| scan, output
    * bounded by distinct cluster sizes. DedupSpec pins that the warm
    * path's plan is scan→aggregate with NO join. */
  def clusterSizeHistogram(s: SparkSession, d: String): DataFrame =
    s.table(clusterAssignmentTable(s, d))
      .groupBy("cluster").agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum("sz").as("n_docs"),
        sum(expr("sz - 1")).as("docs_removed_by_keep_one"))

  val clusterSizeHistogramSql: String =
    s"""WITH cl AS ($dedupClustersSql),
       |cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS sz
       |  FROM cl GROUP BY 1)
       |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(sum(sz) AS BIGINT) AS n_docs,
       |  CAST(sum(sz - 1) AS BIGINT) AS docs_removed_by_keep_one
       |FROM cs GROUP BY 1""".stripMargin.replace("\n", " ")

  /** Durable CLUSTER-ASSIGNMENT table: (doc_id, cluster) labels from
    * the q64 large/small-star clustering, persisted once per corpus
    * snapshot under [[indexRoot]]/clusters-<tag> with the
    * [[corpusIndex]] lifecycle (snapshot tag from the data files,
    * build-once lock, completion marker, per-session catalog
    * re-registration over the durable files). Labels are identical to
    * [[dedupClustersLargeStar]] by construction — the table IS that
    * result written down, so q271 (and any other assignment consumer)
    * reads instead of re-clustering per pull. A data refresh changes
    * the tag and versions the table; stale reuse is impossible. */
  def clusterAssignmentTable(s: SparkSession, d: String): String = {
    val tag = graft.ops.DurableIndex.snapshotTag(d, "documents.parquet")
    val tbl = s"dedup_cluster_labels_$tag"
    graft.ops.DurableIndex.locked(s"clusters-$tag") {
      if (!s.catalog.tableExists(tbl)) {
        val loc = indexRoot.resolve(s"clusters-$tag")
        if (graft.ops.DurableIndex.complete(loc)) {
          s.sql(s"CREATE TABLE IF NOT EXISTS $tbl (doc_id BIGINT, cluster BIGINT) " +
            s"USING PARQUET LOCATION '${loc.resolve("labels")}'")
        } else {
          java.nio.file.Files.createDirectories(loc)
          dedupClustersLargeStar(s, d)
            .select(col("doc_id").cast("long").as("doc_id"),
              col("cluster").cast("long").as("cluster"))
            .write.mode("overwrite")
            .option("path", loc.resolve("labels").toString)
            .saveAsTable(tbl)
          graft.ops.DurableIndex.markComplete(loc)
        }
      }
    }
    tbl
  }

  /** Durable VERIFIED-PAIRS table: the banded-MinHash + exact-Jaccard
    * near-dup pairs ([[minHashJaccardPairs]]) written down once per
    * corpus snapshot under [[indexRoot]]/pairs-<tag> with the
    * [[corpusIndex]] lifecycle (snapshot tag, build-once lock,
    * completion marker, per-session catalog re-registration). The
    * pair set is THE shared intermediate of the dedup family — q45's
    * clustering, q116/q187's graphs and q115's audit all start from
    * it — and it changes only when the corpus snapshot does, so
    * consumers that need the raw pairs probe this table instead of
    * re-running the band join + verify UDF per pull (the q271
    * persist-and-probe posture; r17 measured q115's recompute
    * composition at 253 s in-run at sf1 when its exchange reuse
    * failed to fire — a probe is immune to that by construction). */
  def verifiedPairsTable(s: SparkSession, d: String): String = {
    val tag = graft.ops.DurableIndex.snapshotTag(d, "documents.parquet")
    val tbl = s"dedup_verified_pairs_$tag"
    graft.ops.DurableIndex.locked(s"pairs-$tag") {
      if (!s.catalog.tableExists(tbl)) {
        val loc = indexRoot.resolve(s"pairs-$tag")
        if (graft.ops.DurableIndex.complete(loc)) {
          s.sql(s"CREATE TABLE IF NOT EXISTS $tbl " +
            "(doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE) " +
            s"USING PARQUET LOCATION '${loc.resolve("pairs")}'")
        } else {
          java.nio.file.Files.createDirectories(loc)
          minHashJaccardPairs(s, d)
            .select(col("doc_a").cast("long").as("doc_a"),
              col("doc_b").cast("long").as("doc_b"), col("jaccard"))
            .write.mode("overwrite")
            .option("path", loc.resolve("pairs").toString)
            .saveAsTable(tbl)
          graft.ops.DurableIndex.markComplete(loc)
        }
      }
    }
    tbl
  }

  /** q105 — cluster REPRESENTATIVE selection: after near-dup
    * clustering (q45), each cluster keeps its best member — longest
    * text, id tiebreak, the q103 policy applied at the CLUSTER grain
    * (pair-greedy keep-lists like q28 drop by pair order; selecting
    * per transitive cluster is what canonical-document pipelines
    * actually ship). One struct-max aggregate over the cluster labels
    * — the clustering's own exchange shape, nothing new shuffles. */
  def clusterRepresentatives(s: SparkSession, d: String): DataFrame =
    dedupClusters(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy("cluster")
      .agg(
        max(struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("best"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster"), (-col("best.nid")).as("rep_id"),
        col("best.n_chars").as("rep_chars"), col("cluster_size"))

  val clusterRepresentativesSql: String =
    s"""WITH cl AS ($dedupClustersSql),
       |j AS (SELECT cl.cluster, d.doc_id, d.n_chars,
       |  row_number() OVER (PARTITION BY cl.cluster ORDER BY d.n_chars DESC, d.doc_id) AS rn,
       |  count(*) OVER (PARTITION BY cl.cluster) AS cluster_size
       |  FROM cl JOIN documents d ON cl.doc_id = d.doc_id)
       |SELECT cluster, doc_id AS rep_id, n_chars AS rep_chars, cluster_size
       |FROM j WHERE rn = 1""".stripMargin.replace("\n", " ")

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC '14) — the adversarial-diameter alternative to
    * [[clustersFromEdges]]: min-label propagation needs O(diameter)
    * rounds, star contraction O(log² n) regardless of graph shape, so
    * a chain-of-100k component costs ~tens of rounds instead of 100k.
    * Near-dup graphs are usually shallow (clusters are near-cliques),
    * which is why propagation is the default; this is the swap-in when
    * the edge distribution is unknown or adversarial.
    *
    * Per round, the edge set is REWRITTEN (not annotated):
    *  - large-star: every node connects its strictly-LARGER neighbors
    *    to its neighborhood minimum — per edge (u,v), u<v, exactly one
    *    emission (v, min Γ⁺(u)), so the set never grows;
    *  - small-star: with edges oriented hi→lo, every hi connects its
    *    smaller neighbors and itself to their collective minimum.
    * Both are one hash-agg (min per node, map-side partial) + one
    * re-join per round — the same keyed-shuffle shape as one
    * propagation step, never a per-node neighbor list in a buffer
    * (hub nodes would make `collect_set` the q59-style scale-killer).
    * The fixpoint is a forest of stars centered at each component's
    * minimum id, read off as the final labels. Convergence is detected
    * by a (count, xor-of-edge-hashes) signature of the edge set — one
    * driver action per round holding two longs, never vertex state (a
    * 2⁻⁶⁴ signature collision would only stop one round early on an
    * already-star-shaped graph).
    */
  def clustersLargeSmallStar(docs: DataFrame, edges: DataFrame,
                             maxIters: Int = 50): DataFrame =
    clustersLargeSmallStarWithStats(docs, edges, maxIters)._1

  /** [[clustersLargeSmallStar]] plus the number of LS+SS rounds it took
    * — exposed so tests can assert the O(log) round count on planted
    * deep-chain graphs. */
  private[graft] def clustersLargeSmallStarWithStats(
      docs: DataFrame, edges: DataFrame,
      maxIters: Int = 50): (DataFrame, Int) = {
    def canon(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Seq(least(a, b).as("lo"), greatest(a, b).as("hi"))
    // localCheckpoint, not persist: persist caches the DATA but keeps
    // the full LOGICAL plan, so after k rounds Catalyst re-analyzes a
    // plan that nests the entire upstream pair pipeline k levels deep —
    // planning time, not execution, dominates the loop. Checkpointing
    // truncates the lineage to a scan of the materialized edge set
    // (~|E| rows). On a cluster this becomes reliable `checkpoint` to
    // durable storage; locally the executor-memory variant is exact.
    var e = edges.filter(col("doc_a") =!= col("doc_b"))
      .select(canon(col("doc_a"), col("doc_b")): _*)
      .distinct().localCheckpoint(true)
    // edge-set signature: (row count, xor of per-edge hashes). Order-
    // independent, computed over the just-checkpointed edge set.
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(bit_xor(xxhash64(col("lo"), col("hi"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(e)
    var iter = 0
    var stable = false
    while (!stable && iter < maxIters) {
      // ---- large-star: (v, min Γ⁺(u)) for every neighbor v > u
      val sym = e.select(explode(array(
          struct(col("lo").as("src"), col("hi").as("nb")),
          struct(col("hi").as("src"), col("lo").as("nb")))).as("p"))
        .select(col("p.src").as("src"), col("p.nb").as("nb"))
      val mins = sym.groupBy("src").agg(min("nb").as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      // emitted pairs always have m ≤ src < nb, so (m, nb) is canonical
      val e1 = sym.filter(col("nb") > col("src"))
        .join(mins, "src")
        .filter(col("nb") =!= col("m"))
        .select(col("m").as("lo"), col("nb").as("hi"))
        .distinct()
      // ---- small-star: edges are already oriented hi→lo; each hi
      // links its smaller neighbors and itself to their minimum
      val smins = e1.groupBy("hi").agg(min("lo").as("m"))
      val e2 = e1.join(smins, "hi")
        .select(col("m").as("lo"), col("lo").as("hi"))   // (v, m) for v ∈ N(hi)
        .union(smins.select(col("m").as("lo"), col("hi")))// (hi, m)
        .filter(col("lo") =!= col("hi"))                  // drops v = m
        .distinct().localCheckpoint(true)
      val nsig = signature(e2)
      e.unpersist()
      stable = nsig == sig
      sig = nsig
      e = e2
      iter += 1
    }
    val labels = docs
      .join(e.groupBy(col("hi").as("doc_id")).agg(min("lo").as("cluster")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"))
    (labels, iter)
  }

  /** q64: the same cluster labels as q45, computed by star contraction —
    * registered so the adversarial-diameter path is oracle-checked, not
    * a comment. Oracle: identical SQL to q45 (same output contract). */
  def dedupClustersLargeStar(s: SparkSession, d: String,
                             minJaccard: Double = MinJaccard): DataFrame =
    clustersLargeSmallStar(
      Tables.documents(s, d).select("doc_id"),
      minHashJaccardPairs(s, d, minJaccard).select("doc_a", "doc_b"))

  // ------------------------------------------- character-n-gram Jaccard

  val CharGramN     = 5 // 3-grams measured useless here: background J is
                        // 0.4-0.7 on the small synthetic vocabulary;
                        // 5-grams drop every non-dup pair below 0.4
                        // while true near-dups stay >= 0.8
  val CharGramMinJ  = 0.8
  val CharBandRows  = 6  // 10 bands x 6 rows (of the 64 shared perms):
  val CharBands     = 10 // P[band hit] = J^6 is 0.7% per band at the
                         // J=0.3 background, 53% at J=0.9, so candidate
                         // volume tracks near-dups (the q19-style 32x2
                         // layout passed 99.6% of the 0.2-0.4 background
                         // mass and the verify stage ate 313 s at sf0.1)

  /** q67 — n-gram Jaccard near-dup pairs at the CHARACTER level: exact
    * char-5-gram set Jaccard, the robust-to-tokenization dedup family
    * next to word-shingle MinHash (q19) and SimHash (q62). Candidates
    * come from MinHash-LSH banding over the char-gram sets (reusing
    * q19's permutation constants, re-bucketed 10 bands × 6 rows) and
    * the emitted score is the EXACT Jaccard recomputed per candidate;
    * the oracle recomputes the identical bands, so LSH misses agree
    * bit-for-bit. Recall at the τ=0.8 threshold: 1−(1−J⁶)¹⁰ ≈ 95% at
    * J=0.8, 99.95% at J=0.9 (where this corpus's true dups live).
    *
    * This operator is the round's measured lesson in candidate
    * generation — three designs built, two are dead ends HERE:
    *  1. naive (lang, length-bucket) block join: 75 s at sf0.1 — a
    *     universal trigram pairs everyone in a 1000-doc block;
    *  2. textbook positional prefix filtering (ppjoin Lemma 1,
    *     rarest-first order, integer-exact prefix lengths): still 1.34M
    *     candidates for 5 true pairs, 30 s — even the RAREST trigram
    *     of a doc has df ≈ 900 on this small synthetic vocabulary, so
    *     no exact prefix scheme can prune at τ=0.8 over a ~0.55
    *     background;
    *  3. q19's own 32×2 band layout over trigrams: 313 s — P[band hit]
    *     = J² passes 99.6% of the 0.2-0.4 background mass.
    * The working design attacks BOTH knobs: 5-grams grow the gram
    * space until background J drops under 0.4, and 6-row bands make a
    * background hit cost J⁶. Candidate volume then tracks near-dup
    * count, not block or background co-membership — the property that
    * survives 100 TB. */
  def charNgramJaccardPairs(s: SparkSession, d: String,
                            minJ: Double = CharGramMinJ): DataFrame = {
    val bands = spreadScan(s, Tables.documents(s, d))
      .select(col("doc_id"),
        posexplode(charBandValsCol(col("text"))).as(Seq("band", "band_val")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // scaled-integer jaccard (FLOAT RULE — engine-exact threshold + cell)
    val jaccardUdf = udf { (ta: String, tb: String) =>
      Hashing.exactJaccardX10k(
        Hashing.charShingles(ta, CharGramN),
        Hashing.charShingles(tb, CharGramN))
    }
    val docs = Tables.documents(s, d)
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        jaccardUdf(col("text_a"), col("text_b")).as("jx"))
      .filter(col("jx") >= math.round(minJ * 10000))
      .select(col("doc_a"), col("doc_b"),
        (col("jx").cast("double") / 10000.0).as("jaccard"))
  }

  /** text -> 10 LSH band values over the char-shingle MinHash signature
    * (first 60 of the 64 shared permutations, 6 rows per band) —
    * native since r13, same family slicing: permConstants(60, seed) ≡
    * Perms.take(60). */
  private def charBandValsCol(text: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.minHashBandVals(
      text, CharGramN, CharBands, CharBandRows, MinHashSeed, charGrain = true)

  /** doc_id, band, band_val over CHAR shingles — twin of
    * [[charBandValsUdf]], mirroring the word-level bandsCtes. */
  private def charBandsCtes: String =
    s"""csh AS (SELECT doc_id, CASE WHEN len(text) < $CharGramN THEN [text]
       |  ELSE list_transform(range(1, len(text) - ${CharGramN - 1} + 1), i -> text[i:i+${CharGramN - 1}]) END AS shingles FROM documents),
       |$permValues,
       |cbase AS (SELECT doc_id, CAST(md5_number_lower(s) >> 3 AS BIGINT) AS x
       |  FROM (SELECT doc_id, unnest(shingles) AS s FROM csh)),
       |csig AS (SELECT doc_id, perm,
       |  min(CAST((CAST(a AS HUGEINT) * x + b) % ${Hashing.MersennePrime} AS BIGINT)) AS v
       |  FROM cbase, perms WHERE perm < ${CharBands * CharBandRows} GROUP BY doc_id, perm),
       |cbands AS (SELECT doc_id, CAST(perm // $CharBandRows AS INT) AS band,
       |  string_agg(CAST(v AS VARCHAR), ':' ORDER BY perm) AS band_val
       |  FROM csig GROUP BY doc_id, perm // $CharBandRows)""".stripMargin

  val charNgramJaccardPairsSql: String = {
    // scaled-integer jaccard — identical to Hashing.exactJaccardX10k
    val jx = "(CAST(len(list_intersect(x.ss, y.ss)) AS BIGINT) * 10000 " +
      "+ (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))) // 2) " +
      "// greatest(len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss)), 1)"
    (s"""WITH ${charBandsCtes},
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM cbands a JOIN cbands b ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |cshs AS (SELECT doc_id, list_distinct(shingles) AS ss FROM csh),
        |jj AS (SELECT doc_a, doc_b, $jx AS jx
        |  FROM cand JOIN cshs x ON x.doc_id = cand.doc_a JOIN cshs y ON y.doc_id = cand.doc_b)
        |SELECT doc_a, doc_b, CAST(jx AS DOUBLE) / 10000.0 AS jaccard
        |FROM jj WHERE jx >= ${math.round(CharGramMinJ * 10000)}""").stripMargin.replace("\n", " ")
  }

  // ------------------------------------------------- fuzzy record linkage

  val FuzzyMaxEdit = 3

  /** Blocked fuzzy matching (record linkage) over the part-name
    * dictionary: DISTINCT names first (the dictionary is orders of
    * magnitude smaller than the fact table — dedupe names, not rows),
    * block on the product word (last token), self-join within blocks,
    * verify with exact Levenshtein ≤ [[FuzzyMaxEdit]].
    *
    * Scale shape: the distinct-name aggregate is the only pass over the
    * big table; the pair join runs on the tiny dictionary. At 100 TB
    * the blocking key graduates from one token to q-gram LSH bands
    * (same band→bucket→verify pipeline as MinHash), keeping candidate
    * counts near-linear in dictionary size. */
  def fuzzyNameMatch(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .select(col("p_name").as("name"))
      .distinct()
      .withColumn("blk", element_at(split(col("name"), " "), -1))
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist") <= FuzzyMaxEdit)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("dist"))
  }

  val fuzzyNameMatchSql: String =
    "WITH names AS (SELECT DISTINCT p_name AS name, " +
      "list_extract(string_split(p_name, ' '), len(string_split(p_name, ' '))) AS blk FROM part) " +
      "SELECT a.name AS name_a, b.name AS name_b, " +
      "CAST(levenshtein(a.name, b.name) AS INT) AS dist " +
      "FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name " +
      s"WHERE levenshtein(a.name, b.name) <= $FuzzyMaxEdit"

  /** SimHash near-dup pairs (q62): pigeonhole block join, then exact
    * Hamming verification ≤ maxHamming. Registered in r5 — r4 shipped
    * only the block fingerprints (q18) and left this downstream
    * consumer unchecked. Scale shape is q18's: one shuffle on the
    * (block index, block value) key whose space is 2^16 per index, then
    * a codegen'd xor+popcount on the candidate pairs only. */
  def simHashPairs(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    // BLOCK COUNT SCALES WITH log N (the r13 verdict's documented-but-
    // unimplemented fix): the count-star is a cheap footer-level job
    // and deterministic per dataset, so the plan stays reproducible.
    val n = Tables.documents(s, d).count()
    simHashPairsBlocked(s, d, maxHamming, pigeonholeBlocks(n, maxHamming))
  }

  /** How many pigeonhole blocks for a corpus of n docs: the MINIMUM
    * B = maxHamming+1 gives 1-block keys of 64/B bits — a FIXED key
    * space, so within-key candidate-pair mass grows ∝ n² (measured
    * 7.5× for 3× data at sf3, VERDICT r13 §wrong-2). Growing B by one
    * adds ~64/B bits to the key (keys are B−k blocks, below), dividing
    * collision mass by ~2^(64/B); stepping B each ~2^13 growth in n
    * keeps n²/2^keybits ~linear in n. Thresholds are MEASURED, not
    * guessed (AbSimhash A/B, idle box, emit-once shape): B=5 beats
    * B=4 already at sf0.1 (5·10³ docs: 0.97 vs 1.15 s) and decisively
    * at sf1 (5·10⁴: 4.6 vs 10.4 s) — the 26-bit key pays for its 10/4
    * explode fan-out as soon as the n²/2^16 collision term is
    * non-trivial — so B=5 starts at 2·10³ and only the tiny-corpus
    * tail keeps the classic 4-block scheme. B=6 (the Manku WWW'07
    * table count, 20 combos × 33-bit keys) from 10⁸, where n²/2^26
    * collision mass would re-dominate. */
  def pigeonholeBlocks(n: Long, maxHamming: Int): Int =
    if (n < 2000L) maxHamming + 1
    else if (n < 100000000L) maxHamming + 2
    else maxHamming + 3

  /** Generalized pigeonhole blocking (Manku et al., WWW'07 §3): split
    * the 64-bit fingerprint into B blocks; a pair within Hamming k
    * leaves ≥ B−k blocks untouched, so keying every C(B, B−k)
    * combination of B−k blocks (packed into one long — ≤ 45 bits for
    * every B here) guarantees each true pair shares ≥ 1 (combo, key)
    * bucket. B = k+1 degenerates to the classic single-block scheme;
    * larger B trades explode fan-out C(B,B−k) per doc for a key space
    * 2^((B−k)·64/B) — the fan-out is linear cost, the key width kills
    * the quadratic collision term. The RESULT is blocking-independent
    * (verified pairs only), so q62's oracle is unchanged for any B
    * (SimHashBlockingSpec pins B=4/5/6 row-identical at sf0.001).
    *
    * Shape: fingerprint scan (native SimHashBlocksExpr) checkpointed
    * before the self-join (q116 fan-out discipline), posexplode of the
    * packed combo keys (pos = combo id), one shuffle on (ci, kv),
    * codegen bit_count(xor) verification on candidates only.
    *
    * EMIT-ONCE instead of distinct(): a near-identical pair matches
    * MANY combos (an exact duplicate matches all C(B,B−k)), so the
    * naive plan replicates every true pair per matching combo and
    * pays a pair-grain distinct() shuffle to undo it — at sf3 the
    * true-pair mass is ~1.3M rows and that shuffle dominated. Here a
    * pair is emitted ONLY by its first matching combo: combo ci fires
    * iff every earlier combo differs somewhere, a pure-arithmetic test
    * on the pair's fingerprint XOR ((x & comboMask_j) ≠ 0 — the join
    * key already proves (x & comboMask_ci) = 0). Exactly-once output
    * by construction ⇒ no distinct(), no replication surviving the
    * join, and the dedup "shuffle" becomes a codegen'd filter. */
  def simHashPairsBlocked(s: SparkSession, d: String, maxHamming: Int,
                          nBlocks: Int): DataFrame = {
    require(nBlocks > maxHamming, s"need > $maxHamming blocks")
    val widths = {
      val base = 64 / nBlocks; val rem = 64 % nBlocks
      (0 until nBlocks).map(j => if (j < rem) base + 1 else base)
    }
    val offsets = widths.scanLeft(0)(_ + _)
    // pack blocks j1<j2<…<jm of the fingerprint into one long key:
    // ((fp>>off_j1)&m1) << (w_j2+…) | … | ((fp>>off_jm)&m_jm)
    def blockExpr(j: Int): String =
      s"((simhash >> ${offsets(j)}) & ${(1L << widths(j)) - 1}L)"
    val combos = (0 until nBlocks).combinations(nBlocks - maxHamming).toSeq
    val keyExprs = combos.map { combo =>
      val shifted = combo.zipWithIndex.map { case (j, i) =>
        val below = combo.drop(i + 1).map(widths).sum
        if (below == 0) blockExpr(j)
        else s"shiftleft(${blockExpr(j)}, $below)"
      }
      expr(shifted.mkString(" | "))
    }
    // bit mask a combo covers on the fingerprint itself
    def comboMask(combo: Seq[Int]): Long =
      combo.map(j => ((1L << widths(j)) - 1) << offsets(j)).reduce(_ | _)
    val fp = spreadScan(s, Tables.documents(s, d))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.simHashBlocks(col("text")).as("blk"))
      .select(col("doc_id"),
        expr("shiftleft(CAST(blk[3] AS BIGINT), 48) | shiftleft(CAST(blk[2] AS BIGINT), 32) | " +
          "shiftleft(CAST(blk[1] AS BIGINT), 16) | CAST(blk[0] AS BIGINT)").as("simhash"))
      .localCheckpoint(true)
    val keys = fp.select(col("doc_id"), col("simhash"),
      posexplode(array(keyExprs: _*)).as(Seq("ci", "kv")))
    // first-match-only predicate: CASE on the emitting combo id
    val firstMatch = {
      val cases = combos.indices.map { ci =>
        val earlier = (0 until ci)
          .map(j => s"((simx & ${comboMask(combos(j))}L) != 0)")
        val cond = if (earlier.isEmpty) "true" else earlier.mkString(" AND ")
        s"WHEN $ci THEN $cond"
      }
      expr(s"CASE a.ci ${cases.mkString(" ")} ELSE false END")
    }
    keys.as("a")
      .join(keys.as("b"),
        col("a.ci") === col("b.ci") && col("a.kv") === col("b.kv") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("simx", expr("a.simhash ^ b.simhash"))
      .filter(firstMatch)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(simx) AS INT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** DuckDB twin of [[simHashPairs]]: reassembles the full 64-bit
    * fingerprint from the same md5-token bit votes as [[simHashSql]],
    * converts the unsigned sum to two's-complement BIGINT (so xor +
    * bit_count sees the identical bit pattern as the JVM Long), joins
    * on the 16-bit pigeonhole blocks, and verifies Hamming ≤ 3.
    * Block extraction `(h >> 16k) & 65535` is shift-kind-proof: the
    * mask keeps only bits the arithmetic/logical fill can't touch. */
  val simHashPairsSql: String = {
    val two63 = "CAST('9223372036854775808' AS HUGEINT)"
    val two64 = "CAST('18446744073709551616' AS HUGEINT)"
    ("""WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS tok FROM documents),
       |th AS (SELECT doc_id, md5_number_lower(tok) AS h FROM toks),
       |bits AS (SELECT doc_id, b,
       |  CASE WHEN sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS bit
       |  FROM th, range(64) r(b) GROUP BY doc_id, b),
       |hraw AS (SELECT doc_id, sum(CASE WHEN bit = 1 THEN CAST(1 AS HUGEINT) << CAST(b AS INT) ELSE CAST(0 AS HUGEINT) END) AS h
       |  FROM bits GROUP BY doc_id),
       |fp AS (SELECT d.doc_id,
       |  CAST(CASE WHEN coalesce(hraw.h, CAST(0 AS HUGEINT)) >= """ + two63 +
      " THEN coalesce(hraw.h, CAST(0 AS HUGEINT)) - " + two64 +
      """ ELSE coalesce(hraw.h, CAST(0 AS HUGEINT)) END AS BIGINT) AS simhash
       |  FROM documents d LEFT JOIN hraw ON hraw.doc_id = d.doc_id),
       |blocks AS (SELECT doc_id, simhash, k, (simhash >> CAST(k * 16 AS INT)) & 65535 AS bv FROM fp, range(4) r(k)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM blocks a JOIN blocks b ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
       |FROM cand JOIN fp x ON x.doc_id = cand.doc_a JOIN fp y ON y.doc_id = cand.doc_b
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""").stripMargin.replace("\n", " ")
  }

  /** q115 — CROSS-SIGNAL dedup audit: which documents the SURFACE
    * near-dup detector (q19's banded MinHash + exact-Jaccard pairs)
    * and the EMBEDDING detector (q88's SemDeDup ε-ball, via the 1:1
    * doc_id ↔ vec_id alignment of the test tables) disagree on. A
    * pipeline that runs both families — every serious corpus build
    * does — watches exactly this: `surface_only` rows are
    * paraphrase-blind encoder misses (or an ε set too tight),
    * `semantic_only` rows are either true paraphrases the
    * shingle/banding layer cannot see or an over-aggressive ε; the
    * audit is where those thresholds get tuned from.
    *
    * Scale: PERSIST-AND-PROBE (r18). Both inputs are the durable
    * snapshot artifacts — [[verifiedPairsTable]] and
    * [[graft.sim.SimilarityQueries.semanticDropsTable]] — not fresh
    * recomputes: the r13–r17 recompute composition fed each pipeline
    * into two union branches and relied on exchange reuse that fired
    * in isolation but NOT under a full bench run (r17 measured 253 s
    * in-run vs 58 s isolated at sf1 — a 4.3× gap from recomputing two
    * dedup pipelines twice each). Probing the written-down pair/drop
    * tables makes the audit two id-keyed left joins off the document
    * scan, cost ∝ corpus scan, immune to reuse heuristics; the build
    * cost is carried once per snapshot in `index_build` like every
    * other durable artifact. Output is integer/boolean-only. */
  def dedupCrossCheck(s: SparkSession, d: String): DataFrame = {
    val pairs = s.table(verifiedPairsTable(s, d))
    val surfIds = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct().withColumn("surface_dup", lit(true))
    val sem = s.table(graft.sim.SimilarityQueries.semanticDropsTable(s, d))
    val semIds = sem.select(col("vec_id").as("doc_id"))
      .union(sem.select(col("dup_of").as("doc_id")))
      .distinct().withColumn("semantic_dup", lit(true))
    Tables.documents(s, d).select("doc_id")
      .join(surfIds, Seq("doc_id"), "left")
      .join(semIds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("surface_dup"), lit(false)).as("surface_dup"),
        coalesce(col("semantic_dup"), lit(false)).as("semantic_dup"))
      .withColumn("verdict",
        when(col("surface_dup") && col("semantic_dup"), "both")
          .when(col("surface_dup"), "surface_only")
          .when(col("semantic_dup"), "semantic_only")
          .otherwise("neither"))
  }

  val dedupCrossCheckSql: String =
    s"""WITH pr AS ($minHashJaccardPairsSql),
       |surf AS (SELECT DISTINCT doc_id FROM
       |  (SELECT doc_a AS doc_id FROM pr UNION ALL SELECT doc_b FROM pr)),
       |sd AS (${graft.sim.SimilarityQueries.semanticDedupSql}),
       |sem AS (SELECT DISTINCT doc_id FROM
       |  (SELECT vec_id AS doc_id FROM sd UNION ALL SELECT dup_of FROM sd))
       |SELECT d.doc_id,
       |  surf.doc_id IS NOT NULL AS surface_dup,
       |  sem.doc_id IS NOT NULL AS semantic_dup,
       |  CASE WHEN surf.doc_id IS NOT NULL AND sem.doc_id IS NOT NULL THEN 'both'
       |    WHEN surf.doc_id IS NOT NULL THEN 'surface_only'
       |    WHEN sem.doc_id IS NOT NULL THEN 'semantic_only'
       |    ELSE 'neither' END AS verdict
       |FROM documents d LEFT JOIN surf ON surf.doc_id = d.doc_id
       |LEFT JOIN sem ON sem.doc_id = d.doc_id""".stripMargin.replace("\n", " ")

  /** q129 — SPLIT-LEAKAGE audit: near-dup clusters (q45) crossed with
    * the deterministic content-hash split (q85). A cluster whose
    * members land in ≥ 2 of train/val/test is eval CONTAMINATION —
    * the model sees a near-copy of a held-out doc during training, so
    * held-out loss reads better than it is. Splitting by content hash
    * prevents EXACT-dup leakage by construction (identical text ⇒
    * identical bucket) but near-dups hash apart — which is exactly
    * why the split must be audited at the CLUSTER grain, and why real
    * pipelines split by cluster representative instead. Output: one
    * row per cluster with per-split member counts and the leaky flag.
    *
    * Scale: cluster labels come from the O(log n)-round contraction
    * behind q45; this audit adds one doc_id equi-join and one
    * cluster-keyed aggregate — output bounded by |clusters|. */
  def splitLeakage(s: SparkSession, d: String): DataFrame = {
    val splits = graft.text.CorpusOps.deterministicSplit(s, d)
      .select("doc_id", "split")
    dedupClusters(s, d).join(splits, "doc_id")
      .groupBy("cluster")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("split") === "train", 1)).as("n_train"),
        count(when(col("split") === "val", 1)).as("n_val"),
        count(when(col("split") === "test", 1)).as("n_test"))
      .withColumn("leaky",
        (when(col("n_train") > 0, 1).otherwise(0) +
          when(col("n_val") > 0, 1).otherwise(0) +
          when(col("n_test") > 0, 1).otherwise(0)) >= 2)
  }

  // lazy: composing CorpusOps' SQL during DedupQueries' own init opens
  // the init cycle described at [[IncBatchMod]] — defer until first use
  lazy val splitLeakageSql: String =
    s"""WITH cl AS ($dedupClustersSql),
       |sp AS (${graft.text.CorpusOps.deterministicSplitSql})
       |SELECT cl.cluster, count(*) AS n_docs,
       |  count(*) FILTER (WHERE sp.split = 'train') AS n_train,
       |  count(*) FILTER (WHERE sp.split = 'val') AS n_val,
       |  count(*) FILTER (WHERE sp.split = 'test') AS n_test,
       |  CAST(count(*) FILTER (WHERE sp.split = 'train') > 0 AS INT)
       |    + CAST(count(*) FILTER (WHERE sp.split = 'val') > 0 AS INT)
       |    + CAST(count(*) FILTER (WHERE sp.split = 'test') > 0 AS INT) >= 2 AS leaky
       |FROM cl JOIN sp ON sp.doc_id = cl.doc_id
       |GROUP BY cl.cluster""".stripMargin.replace("\n", " ")

  // ------------------------------------------------------- link analysis

  /** PageRank fixed-point scale: ranks travel as integer units of
    * 10⁻¹², so both engines do BIGINT arithmetic end-to-end. */
  val PrScale   = 1000000000000L
  val PrDampNum = 85L // damping 0.85 as an integer ratio
  val PrDampDen = 100L
  val PrIters   = 3

  /** q116 — PAGERANK over the near-dup graph (q19's verified pairs as
    * undirected edges): link analysis joins CC (q45/q64) in the graph
    * family — where CC answers "which docs form one duplicate
    * cluster", PageRank ranks how CENTRAL a document is inside the
    * near-dup web, the signal that picks canonical pages out of
    * template farms (a hub shared by many variants outranks its
    * satellites).
    *
    * INTEGER fixed-point by construction (FLOAT RULE, iterative
    * flavor): ranks are BIGINT units of 10⁻¹², each edge contributes
    * `pr·85 div (100·deg)`, and the teleport term is
    * `(S·15 div 100) div N` — floor division loses a bounded trickle
    * of mass (documented; identically in both engines) but every
    * intermediate is exactly reproducible cross-engine, where a
    * double formulation would compound sum-order ULPs per iteration.
    * Dangling nodes (no near-dup partners) keep teleport mass only —
    * the standard simplification, identical in both engines.
    *
    * Scale shape: the pair table is the banding output (bounded by
    * near-dup volume, never corpus²); each of the [[PrIters]] rounds
    * is one src-keyed join + one dst-keyed aggregate + an id-keyed
    * left join back to the node set, localCheckpoint'ed so plan depth
    * stays O(1) per round (the CC-rounds discipline). */
  def pageRank(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    // checkpoint the band+verify pipeline BEFORE fan-out (q121's
    // discipline): edges/deg/edgesDeg each re-derive `pairs`, and
    // exchange reuse does not reliably dedupe the union+agg+join
    // consumers — the r13 sf3 run measured q116 at 457 s ≈ 4× the
    // 115 s pairs pipeline, vs ~0.5 s/round once pinned (ScaleProbe)
    val pairs = minHashJaccardPairs(s, d).select("doc_a", "doc_b")
      .localCheckpoint(true)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // degree rides each edge row, joined ONCE before the loop — the
    // first job-count pin caught deg (an aggregate over the edge set)
    // and the edge⋈deg join being re-run inside every round
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.join(deg, "src")
      .localCheckpoint(true) // band+verify runs once, not once per round
    val n = docs.count()
    val base = (PrScale * (PrDampDen - PrDampNum) / PrDampDen) / n
    var pr = docs.select(col("doc_id"), lit(PrScale / n).as("pr"))
    for (_ <- 1 to PrIters) {
      val contrib = edgesDeg
        .join(pr.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst"),
          expr(s"pr * $PrDampNum div ($PrDampDen * deg)").as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      pr = docs
        .join(contrib.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(base) + coalesce(col("in_mass"), lit(0L))).as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("doc_id"), col("pr").as("pr_x1e12"))
  }

  val pageRankSql: String = {
    def iter(i: Int): String = {
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""c$i AS (SELECT e.dst, sum(($prev.pr * $PrDampNum) // ($PrDampDen * dg.deg)) AS m
         |  FROM e JOIN $prev ON $prev.doc_id = e.src JOIN dg ON dg.src = e.src GROUP BY e.dst),
         |p$i AS (SELECT d.doc_id,
         |  ((${PrScale} * ${PrDampDen - PrDampNum}) // $PrDampDen) // nn.n + coalesce(c$i.m, 0) AS pr
         |  FROM documents d CROSS JOIN nn LEFT JOIN c$i ON c$i.dst = d.doc_id)""".stripMargin
    }
    // prs/e/dg are MATERIALIZED (r20): each PageRank round references
    // e and dg again, and DuckDB re-inlined the whole band+verify
    // pipeline per reference — the sf1 replay wall (793 s; 38 s
    // materialized at sf0.1 vs 126, row-identical)
    (s"""WITH prs AS MATERIALIZED ($minHashJaccardPairsSql),
        |e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM prs
        |  UNION ALL SELECT doc_b, doc_a FROM prs),
        |dg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |nn AS (SELECT count(*) AS n FROM documents),
        |p0 AS (SELECT doc_id, $PrScale // nn.n AS pr FROM documents, nn),
        |${(1 to PrIters).map(iter).mkString(", ")}
        |SELECT doc_id, CAST(pr AS BIGINT) AS pr_x1e12 FROM p$PrIters""")
      .stripMargin.replace("\n", " ")
  }

  /** q121 — TRIANGLE counts over the near-dup graph: the third graph
    * signal next to CC (q45/q64, "which docs form one cluster") and
    * PageRank (q116, "which doc is the hub") — triangles measure how
    * COHESIVE a neighborhood is. A template farm shows as a dense
    * near-clique (every variant near-dups every other → many
    * triangles); a chain of pairwise-similar revisions shows none —
    * the signal that separates "one document, many copies" from
    * "drifting lineage" when choosing how aggressively to collapse a
    * cluster.
    *
    * Algorithm is compact-forward with DEGREE-ORDERED orientation
    * (Latapy 2008; the standard distributed-triangle trick): orient
    * every edge toward the higher (degree, id) endpoint and count each
    * triangle at its lowest-ordered vertex. The wedge join then fans
    * out per vertex over OUT-degree in the orientation, which the
    * degree order caps at O(√m) — a hub of degree h contributes
    * O(h) wedges instead of O(h²), so the skew a template farm would
    * inject into a naive id-ordered wedge join is structurally
    * bounded (Σ wedges ≤ O(m^1.5) on any graph). The oracle counts
    * the same triangles with the naive a<b<c three-way join — output
    * (per-doc participation) is orientation-invariant, so the scale
    * algorithm and the readable formulation share one answer.
    *
    * Scale shape: the edge table is the banding output (near-dup
    * volume, never corpus²), localCheckpoint'ed once and reused by
    * the degree build, both wedge sides, and the closing probe. */
  def triangleCounts(s: SparkSession, d: String): DataFrame =
    triangleCountsFromPairs(
      minHashJaccardPairs(s, d).select("doc_a", "doc_b")
        .localCheckpoint(true)) // band+verify runs once, feeds all four uses

  /** [[triangleCounts]] over an explicit (doc_a, doc_b) edge frame —
    * the unit the spec runs on planted cliques/chains/stars, where the
    * test corpus's near-dup graph is too sparse to exercise the wedge
    * join. */
  def triangleCountsFromPairs(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("doc_a").as("v"))
      .union(pairs.select(col("doc_b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient each edge toward the higher (deg, id) endpoint
    val e = pairs
      .join(deg.select(col("v").as("doc_a"), col("deg").as("da")), "doc_a")
      .join(deg.select(col("v").as("doc_b"), col("deg").as("db")), "doc_b")
      .select(
        when(struct(col("da"), col("doc_a")) < struct(col("db"), col("doc_b")),
          struct(col("doc_a").as("src"), col("doc_b").as("dst")))
          .otherwise(struct(col("doc_b").as("src"), col("doc_a").as("dst")))
          .as("e"),
        when(struct(col("da"), col("doc_a")) < struct(col("db"), col("doc_b")),
          struct(col("da").as("ds"), col("db").as("dd")))
          .otherwise(struct(col("db").as("ds"), col("da").as("dd")))
          .as("o"))
      .select(col("e.src"), col("e.dst"), col("o.ds"), col("o.dd"))
    // wedges at the lowest-ordered vertex: two out-edges of u, the
    // (deg, id)-smaller head first so the closing edge is oriented
    val w1 = e.select(col("src").as("u"), col("dst").as("v"),
      col("dd").as("dv"))
    val w2 = e.select(col("src").as("u"), col("dst").as("w"),
      col("dd").as("dw"))
    val wedges = w1.join(w2, "u")
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
    val tris = wedges.join(
      e.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
  }

  val triangleCountsSql: String =
    s"""WITH prs AS ($minHashJaccardPairsSql),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM prs),
       |tri AS (SELECT e1.a, e1.b, e2.b AS c
       |  FROM e e1 JOIN e e2 ON e2.a = e1.b
       |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |m AS (SELECT a AS doc_id FROM tri
       |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
       |SELECT doc_id, count(*) AS n_triangles
       |FROM m GROUP BY doc_id""".stripMargin.replace("\n", " ")

  // ------------------------------------------------- incremental dedup

  // `final val` (no type ascription) = compile-time constants, inlined
  // at every use site: builder-authored SQL strings in OTHER objects
  // interpolate these, and a plain val read during an object-init
  // cycle (DedupQueries → splitLeakageSql → CorpusOps → Scrub →
  // back into mid-init DedupQueries) silently yields 0 — which baked
  // `doc_id % 0 = 0` into q128's oracle in the r10 full-registry run.
  final val IncBatchMod = 5
  final val IncBatchRem = 4

  /** q71 — INCREMENTAL dedup: deduplicate a NEW batch against an
    * EXISTING corpus, the shape a nightly crawl actually runs (the
    * self-join dedups q16-q19 answer "is this corpus internally
    * clean"; production asks "which of today's documents are already
    * in the index"). Here the batch is the doc_id % 5 == 4 slice
    * standing in for today's crawl.
    *
    * Verdict per batch doc: 'exact_dup' (content md5 already in the
    * corpus), else 'near_dup' (shares a MinHash band with a corpus doc
    * AND verified word-shingle Jaccard >= 0.5 — q19's banding and
    * threshold), else 'new'.
    *
    * Scale shape — why this is NOT just a filtered q19: the band join
    * is batch x corpus, never corpus x corpus. At 100 TB the corpus
    * side's md5s and band table are PERSISTED artifacts (bucketed by
    * hash / band_val, as minHashJaccardPairsFromBands documents); the
    * daily cost is streaming the batch's signatures against those
    * buckets — proportional to the batch, not the index. The verify
    * join ships text only for candidate pairs, and every stage is a
    * keyed equi-join with no unbounded state. */
  def incrementalDedup(s: SparkSession, d: String): DataFrame = {
    val isNew = col("doc_id") % IncBatchMod === IncBatchRem
    val docs = Tables.documents(s, d)
    val hashes = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val exactDup = hashes.filter(isNew)
      .join(hashes.filter(!isNew).select("h").distinct(), Seq("h"), "left_semi")
      .select("doc_id")
    val bands = minHashBands(s, d)
    val bandNew = col("doc_id") % IncBatchMod === IncBatchRem
    val cand = bands.filter(bandNew).as("a")
      .join(bands.filter(!bandNew).as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("corpus_id"))
      .distinct()
    // scaled-integer jaccard so the verdict threshold is engine-exact
    // (FLOAT RULE): a pair sitting a ULP under round(j,4) == 0.5 would
    // otherwise flip near_dup/new between Spark and the oracle
    val jaccardUdf = udf { (ta: String, tb: String) =>
      Hashing.exactJaccardX10k(
        Hashing.wordShingles(ta, ShingleN).distinct,
        Hashing.wordShingles(tb, ShingleN).distinct)
    }
    val nearDup = cand
      .join(docs.select(col("doc_id"), col("text").as("text_a")), "doc_id")
      .join(docs.select(col("doc_id").as("corpus_id"), col("text").as("text_b")), "corpus_id")
      .filter(jaccardUdf(col("text_a"), col("text_b")) >= math.round(MinJaccard * 10000))
      .select("doc_id").distinct()
    docs.filter(isNew).select("doc_id")
      .join(exactDup.withColumn("e", lit(1)), Seq("doc_id"), "left")
      .join(nearDup.withColumn("n", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("e") === 1, "exact_dup")
          .when(col("n") === 1, "near_dup")
          .otherwise("new").as("verdict"))
  }

  val incrementalDedupSql: String = {
    // scaled-integer jaccard threshold — identical to exactJaccardX10k
    val jx = "(CAST(len(list_intersect(x.ss, y.ss)) AS BIGINT) * 10000 " +
      "+ (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))) // 2) " +
      "// greatest(len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss)), 1)"
    (s"""WITH $bandsCtes,
        |bh AS (SELECT doc_id, md5(text) AS h FROM documents),
        |exact_dup AS (SELECT DISTINCT b.doc_id FROM bh b JOIN bh c ON b.h = c.h
        |  AND b.doc_id % $IncBatchMod = $IncBatchRem AND c.doc_id % $IncBatchMod <> $IncBatchRem),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS corpus_id
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
        |  AND a.doc_id % $IncBatchMod = $IncBatchRem AND b.doc_id % $IncBatchMod <> $IncBatchRem),
        |shs AS (SELECT doc_id, list_distinct(shingles) AS ss FROM sh),
        |near_dup AS (SELECT DISTINCT cand.doc_id FROM cand
        |  JOIN shs x ON x.doc_id = cand.doc_id JOIN shs y ON y.doc_id = cand.corpus_id
        |  WHERE $jx >= ${math.round(MinJaccard * 10000)})
        |SELECT d.doc_id, CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
        |  WHEN n.doc_id IS NOT NULL THEN 'near_dup' ELSE 'new' END AS verdict
        |FROM documents d LEFT JOIN exact_dup e ON e.doc_id = d.doc_id
        |LEFT JOIN near_dup n ON n.doc_id = d.doc_id
        |WHERE d.doc_id % $IncBatchMod = $IncBatchRem""").stripMargin.replace("\n", " ")
  }

  // ------------------------------------ indexed incremental dedup (q75)

  /** Bucket count for the persisted corpus index. 8 at test scale; at
    * 100 TB size it so each bucket's band file set is a few hundred MB
    * (the shuffle paid once at write time replaces a corpus-side
    * shuffle on EVERY nightly run). */
  final val IndexBuckets = 8 // final: inlined into cross-object SQL (see IncBatchMod)

  /** Root for persisted indexes — shared machinery in
    * [[graft.ops.DurableIndex]] (snapshot tagging, build locking,
    * completion marker); exposed here for the spec's file assertions. */
  def indexRoot: java.nio.file.Path = graft.ops.DurableIndex.root

  /** The corpus-side dedup index as DURABLE bucketed parquet tables,
    * built at most once per data snapshot and REUSED across sessions
    * (VERDICT r7 item 2 — tomorrow's nightly run must probe, not
    * rebuild). Returns the catalog names of:
    *
    *  - `inc_corpus_hashes_<tag>`: distinct corpus content md5s,
    *    bucketed+sorted by `h` — the exact-dup probe target.
    *  - `inc_corpus_bands_<tag>`:  corpus (doc_id, band_key) where
    *    band_key = "band|band_val", bucketed+sorted by `band_key` — the
    *    near-dup candidate probe target. A single composite key column
    *    so the join keys equal the bucket spec exactly and the bucketed
    *    scan's HashPartitioning satisfies the join's distribution.
    *
    * Lifecycle: files live under [[indexRoot]]/dedup-<snapshot tag> and are
    * deliberately NOT deleted on exit — they are the artifact. Catalog
    * entries are per-session; a session that finds the files (marker
    * present) re-registers them as EXTERNAL bucketed tables via DDL —
    * bucket metadata lives in the catalog, not the files, so a plain
    * `read.parquet` would silently lose the exchange-free property
    * (DedupSpec asserts a fresh session's probe plan stays
    * exchange-free and rewrites nothing).
    *
    * This is the artifact the q71 scale story promises: the nightly run
    * streams the BATCH's signatures against these buckets; the corpus
    * side is read pre-partitioned with no exchange and no signature
    * recomputation. Cost per run ∝ batch size, not index size. */
  def corpusIndex(s: SparkSession, d: String): (String, String) = {
    val tag = graft.ops.DurableIndex.snapshotTag(d, "documents.parquet")
    val hashTbl = s"inc_corpus_hashes_$tag"
    val bandTbl = s"inc_corpus_bands_$tag"
    val textTbl = appendedTextsTable(s, d)
    graft.ops.DurableIndex.locked(tag) {
      if (!s.catalog.tableExists(hashTbl) || !s.catalog.tableExists(bandTbl) ||
          !s.catalog.tableExists(textTbl)) {
        val loc = indexRoot.resolve(s"dedup-$tag")
        if (graft.ops.DurableIndex.complete(loc)) {
          // reuse: redeclare the external bucketed tables over the
          // existing files (written by saveAsTable with this exact
          // bucket spec, so file naming carries the bucket ids)
          s.sql(s"CREATE TABLE IF NOT EXISTS $hashTbl (h STRING) USING PARQUET " +
            s"CLUSTERED BY (h) SORTED BY (h) INTO $IndexBuckets BUCKETS " +
            s"LOCATION '${loc.resolve("hashes")}'")
          s.sql(s"CREATE TABLE IF NOT EXISTS $bandTbl (doc_id BIGINT, band_key STRING) " +
            s"USING PARQUET CLUSTERED BY (band_key) SORTED BY (band_key) " +
            s"INTO $IndexBuckets BUCKETS LOCATION '${loc.resolve("bands")}'")
          s.sql(s"CREATE TABLE IF NOT EXISTS $textTbl (doc_id BIGINT, text STRING) " +
            s"USING PARQUET LOCATION '${loc.resolve("texts")}'")
        } else {
          java.nio.file.Files.createDirectories(loc)
          val isCorpus = col("doc_id") % IncBatchMod =!= IncBatchRem
          val corpusDocs = Tables.documents(s, d).filter(isCorpus)
          corpusDocs.select(md5(col("text")).as("h")).distinct()
            .write.mode("overwrite")
            .option("path", loc.resolve("hashes").toString)
            .bucketBy(IndexBuckets, "h").sortBy("h")
            .saveAsTable(hashTbl)
          minHashBandsOf(corpusDocs)
            .select(col("doc_id"),
              concat_ws("|", col("band"), col("band_val")).as("band_key"))
            .write.mode("overwrite")
            .option("path", loc.resolve("bands").toString)
            .bucketBy(IndexBuckets, "band_key").sortBy("band_key")
            .saveAsTable(bandTbl)
          // the write-back text side-table starts EMPTY: it holds only
          // texts appended after the snapshot (the snapshot's own texts
          // stay in documents.parquet — no duplication at build time)
          corpusDocs.select(col("doc_id"), col("text")).limit(0)
            .write.mode("overwrite")
            .option("path", loc.resolve("texts").toString)
            .saveAsTable(textTbl)
          graft.ops.DurableIndex.markComplete(loc)
        }
      }
    }
    (hashTbl, bandTbl)
  }

  /** Name of the index's appended-texts side table — (doc_id, text) of
    * every document appended SINCE the snapshot, so the near-dup verify
    * stage can resolve candidate texts that documents.parquet doesn't
    * hold. Deliberately NOT under the `inc_corpus` prefix: it is never
    * a probe target (the tiny candidate set joins it broadcast, like
    * the documents table itself), so the exchange-free plan assertions
    * scope to the bucketed probe tables only. */
  private def appendedTextsTable(s: SparkSession, d: String): String =
    s"inc_texts_${graft.ops.DurableIndex.snapshotTag(d, "documents.parquet")}"

  /** The nightly loop's WRITE-BACK: append a batch's signatures to the
    * persisted corpus index, so tomorrow's run sees today's admitted
    * documents without any rebuild. `newDocs` is the (doc_id, text)
    * set the caller decided joins the corpus (typically the "new"
    * verdicts of [[incrementalVerdictsIndexed]] — appending a known
    * duplicate is harmless for correctness, the probes are semi-joins,
    * but wastes index bytes). Appends run through saveAsTable(Append)
    * with the SAME bucket spec, so the new files land with bucket ids
    * and the probe plan stays exchange-free (DedupSpec asserts after
    * an append); the parquet commit protocol keeps a failed append
    * from leaving half-visible files. Cost ∝ batch, never index. */
  def appendToCorpusIndex(s: SparkSession, d: String, newDocs: DataFrame): Unit = {
    val (hashTbl, bandTbl) = corpusIndex(s, d)
    newDocs.select(md5(col("text")).as("h")).distinct()
      .write.mode("append")
      .bucketBy(IndexBuckets, "h").sortBy("h")
      .saveAsTable(hashTbl)
    minHashBandsOf(newDocs)
      .select(col("doc_id"),
        concat_ws("|", col("band"), col("band_val")).as("band_key"))
      .write.mode("append")
      .bucketBy(IndexBuckets, "band_key").sortBy("band_key")
      .saveAsTable(bandTbl)
    // texts land in the side table so future near-dup candidates against
    // these docs can still be exact-Jaccard verified
    newDocs.select(col("doc_id"), col("text"))
      .write.mode("append")
      .saveAsTable(appendedTextsTable(s, d))
    // see SimilarityQueries.appendToIvfIndex: when `newDocs` rides in
    // from a foreachBatch Dataset the write refreshes the STREAM
    // CLONE's relation cache, not s's — refresh s so callers on s see
    // the appended index immediately.
    s.catalog.refreshTable(hashTbl)
    s.catalog.refreshTable(bandTbl)
    s.catalog.refreshTable(appendedTextsTable(s, d))
  }

  /** Index MAINTENANCE: merge the accumulated per-append files back to
    * one file per bucket (appends land one file per bucket per batch —
    * after a year of nightly runs each probe task would open ~365 small
    * files). Rewrites both bucketed probe tables through the same
    * bucket spec and swaps the files in place ([[graft.ops.DurableIndex
    * .compactBucketedTable]]); probe results and the exchange-free plan
    * are unchanged (DedupSpec asserts both). The texts side table is
    * broadcast-side (never a probe target), so its file count is not a
    * per-probe-task cost and it is left alone. Cost ∝ index size — run
    * it from the maintenance window, not the nightly probe. */
  def compactCorpusIndex(s: SparkSession, d: String): Unit = {
    val tag = graft.ops.DurableIndex.snapshotTag(d, "documents.parquet")
    val (hashTbl, bandTbl) = corpusIndex(s, d)
    val loc = indexRoot.resolve(s"dedup-$tag")
    graft.ops.DurableIndex.locked(tag) {
      graft.ops.DurableIndex.compactBucketedTable(
        s, hashTbl, loc.resolve("hashes"), "h", IndexBuckets)
      graft.ops.DurableIndex.compactBucketedTable(
        s, bandTbl, loc.resolve("bands"), "band_key", IndexBuckets)
    }
  }

  /** q75 — incremental dedup against the PERSISTED corpus index: same
    * output as [[incrementalDedup]] (same oracle), but the corpus md5s
    * and band table are read from the bucketed tables [[corpusIndex]]
    * wrote once. Signature compute + shuffle happen only for the batch:
    * the bucketed corpus scans arrive pre-partitioned on the join key,
    * so EnsureRequirements shuffles ONLY the batch side (PlanAuditSpec
    * asserts zero exchanges above the index scans). This is the plan a
    * nightly crawl runs at 100 TB — daily cost ∝ batch, not index. */
  def incrementalDedupIndexed(s: SparkSession, d: String): DataFrame =
    incrementalVerdictsIndexed(s, d,
      Tables.documents(s, d)
        .filter(col("doc_id") % IncBatchMod === IncBatchRem)
        .select("doc_id", "text"))

  /** The index-probing core of [[incrementalDedupIndexed]] over an
    * ARBITRARY (doc_id, text) batch — also the per-micro-batch body of
    * the streaming twin ([[graft.streaming.StreamingFraud
    * .incrementalDedupStream]]): signatures are computed for the batch
    * rows only, the corpus side is the bucketed [[corpusIndex]] (no
    * exchange, no recompute), so each call costs ∝ the batch. */
  def incrementalVerdictsIndexed(s: SparkSession, d: String,
                                 batch: DataFrame): DataFrame = {
    val (hashTbl, bandTbl) = corpusIndex(s, d)
    // candidate-text resolution covers BOTH the snapshot's documents and
    // everything appended to the index since (the write-back side table)
    val docs = Tables.documents(s, d).select("doc_id", "text")
      .union(s.table(appendedTextsTable(s, d)))
    val exactDup = batch.select(col("doc_id"), md5(col("text")).as("h"))
      .join(s.table(hashTbl), Seq("h"), "left_semi")
      .select("doc_id")
    val cand = minHashBandsOf(batch)
      .select(col("doc_id"),
        concat_ws("|", col("band"), col("band_val")).as("band_key"))
      .join(s.table(bandTbl).withColumnRenamed("doc_id", "corpus_id"), "band_key")
      .select("doc_id", "corpus_id")
      .distinct()
    // same engine-exact scaled-integer threshold as q71 (q75 ≡ q71
    // output contract, so the verify stages must quantize identically)
    val jaccardUdf = udf { (ta: String, tb: String) =>
      Hashing.exactJaccardX10k(
        Hashing.wordShingles(ta, ShingleN).distinct,
        Hashing.wordShingles(tb, ShingleN).distinct)
    }
    val nearDup = cand
      .join(batch.select(col("doc_id"), col("text").as("text_a")), "doc_id")
      .join(docs.select(col("doc_id").as("corpus_id"), col("text").as("text_b")), "corpus_id")
      .filter(jaccardUdf(col("text_a"), col("text_b")) >= math.round(MinJaccard * 10000))
      .select("doc_id").distinct()
    batch.select("doc_id")
      .join(exactDup.withColumn("e", lit(1)), Seq("doc_id"), "left")
      .join(nearDup.withColumn("n", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("e") === 1, "exact_dup")
          .when(col("n") === 1, "near_dup")
          .otherwise("new").as("verdict"))
  }

  // ---------------------- prefix-filter similarity join (q166)

  /** Jaccard threshold as an exact rational (1/2) — the compare is
    * i·Den ≥ u·Num in both engines, never a float. */
  val PrefixJacNum = 1L
  val PrefixJacDen = 2L

  /** q166 — EXACT set-similarity self-join with PREFIX FILTERING
    * (Chaudhuri et al. SSJoin / Xiao et al. PPJoin, both public): all
    * document pairs whose shingle-set Jaccard ≥ 1/2, with COMPLETE
    * recall — the deterministic counterpart of the q19 MinHash path,
    * whose banding is probabilistic and can miss (q138 measures how
    * often). Same elements as the whole dedup family: distinct word-
    * [[ShingleN]]-gram base hashes.
    *
    * Why it scales: order every document's shingles by GLOBAL document
    * frequency ascending (rarest first, ties by hash — one total order
    * corpus-wide). If J(a,b) ≥ t, a and b MUST share a token within
    * their first |s| − ⌈t·|s|⌉ + 1 tokens in that order (else even
    * perfect overlap of the remainders is too small). So only the
    * PREFIX tokens enter the join index — and because prefixes are the
    * RAREST tokens, bucket sizes in the equi-join are small where the
    * corpus is big; the frequent tokens that would dominate a naive
    * share-a-token join never index anything. A length filter
    * (Den·min ≥ Num·max) prunes size-incompatible pairs inside the
    * join condition, before the exchange fans out.
    *
    * Plan: one shingle projection → explode → df counts (hash-keyed
    * aggregate); rank-join back on hash (same key → one exchange
    * layout); per-doc sorted rebuild (doc-bounded buffers),
    * localCheckpoint'd ONCE — the prefix index AND both verify sides
    * read the checkpoint, so the corpus is shingled exactly once
    * (on a cluster this becomes reliable `checkpoint`). Then PPJoin's
    * two candidate prunes on top of the basic prefix slice, both
    * measured at sf1 (50k docs, avg 53 shingles/doc):
    *
    *  - POSITIONAL filter (Xiao et al. §3.2): for the first shared
    *    token in the global order — which, because prefixes are
    *    downward-closed in that order, is simultaneously the
    *    min-position match row on BOTH sides — the remaining overlap
    *    is at most min(sz_a−pos_a, sz_b−pos_b), so require
    *    min(...)·(Num+Den) ≥ Num·(sz_a+sz_b) per matched row. Any
    *    truly-similar pair's first-match row always passes, so recall
    *    stays complete. Cut distinct candidates 36.8M → 17.1M at sf1.
    *  - ASYMMETRIC index prefix: role-order the pair (probe = bigger
    *    by (sz, doc_id), indexed = smaller); the indexed side only
    *    needs its 2t/(1+t)-prefix (sz − ⌈2t·sz/(1+t)⌉ + 1 ≈ sz/3 at
    *    t=1/2) because the minimum overlap with an equal-or-larger
    *    partner is ⌈2t/(1+t)·sz⌉. Fewer index rows enter the
    *    equi-join's hot buckets.
    *
    * Exact verify on the candidate pairs only — array_intersect over
    * the two checkpointed hash arrays, intersection math in integers.
    * Verify cost is candidate-mass-shaped, like q19/q67; nothing is
    * ever all-pairs. Measured at sf1: 132 s (t-prefix both sides,
    * distinct, 3× corpus re-shingle) → 35 s, identical 2375 rows. */
  def prefixFilterPairs(s: SparkSession, d: String): DataFrame = {
    // spreadScan: 42.3 → 25.0 s at sf1/width-32 (r18 measurement)
    val shs = spreadScan(s, Tables.documents(s, d)).select(col("doc_id"),
      graft.functions.GraftFunctions.shingleHashes(col("text"), ShingleN).as("hs"))
    val ex = shs.select(col("doc_id"), explode(col("hs")).as("x"))
    val freq = ex.groupBy("x").agg(count(lit(1)).as("df"))
    val ranked = ex.join(freq, "x")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("x")))).as("ord"))
      .select(col("doc_id"),
        expr("transform(ord, o -> o.x)").as("hs_ord"),
        size(col("ord")).as("sz"))
      .withColumn("p", expr(
        s"sz - CAST((sz * $PrefixJacNum + $PrefixJacDen - 1) div $PrefixJacDen AS INT) + 1"))
      .withColumn("pi", expr(
        s"sz - CAST((sz * ${2 * PrefixJacNum} + ${PrefixJacNum + PrefixJacDen} - 1) " +
          s"div ${PrefixJacNum + PrefixJacDen} AS INT) + 1"))
      .localCheckpoint(true)
    val idx = ranked.select(col("doc_id"), col("sz"), col("pi"),
      posexplode(expr("slice(hs_ord, 1, p)")).as(Seq("pos", "x")))
    val cand = idx.as("a").join(idx.as("b"),
        col("a.x") === col("b.x") &&
          (col("a.sz") > col("b.sz") ||
            (col("a.sz") === col("b.sz") && col("a.doc_id") > col("b.doc_id"))) &&
          col("b.pos") < col("b.pi") &&
          col("b.sz") * PrefixJacDen >= col("a.sz") * PrefixJacNum &&
          least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos")) *
            (PrefixJacNum + PrefixJacDen) >=
            (col("a.sz") + col("b.sz")) * PrefixJacNum)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    cand
      .join(ranked.select(col("doc_id").as("doc_a"), col("hs_ord").as("ha")), "doc_a")
      .join(ranked.select(col("doc_id").as("doc_b"), col("hs_ord").as("hb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("i"),
        (size(col("ha")) + size(col("hb"))).cast("long").as("ab"))
      .select(col("doc_a"), col("doc_b"), col("i"), (col("ab") - col("i")).as("u"))
      .where(col("i") * PrefixJacDen >= col("u") * PrefixJacNum)
      .select(col("doc_a"), col("doc_b"),
        expr("CAST((i * 10000 + u div 2) div u AS BIGINT)").as("jx"))
  }

  /** Honest oracle: ALL-PAIRS exact Jaccard, no prefix logic at all —
    * independently confirms the filter's complete-recall claim at
    * oracle scale (C(|D|,2) list intersections; sf0.01 grain). */
  val prefixFilterPairsSql: String =
    s"""WITH ${shinglesCte.replace("\n", " ")},
       |shs AS (SELECT doc_id, list_distinct([CAST(md5_number_lower(s) >> 3 AS BIGINT)
       |  for s in shingles]) AS ss FROM sh),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(len(list_intersect(a.ss, b.ss)) AS BIGINT) AS i,
       |  CAST(len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss)) AS BIGINT) AS u
       |  FROM shs a JOIN shs b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST((i * 10000 + u // 2) // u AS BIGINT) AS jx
       |FROM p WHERE i * $PrefixJacDen >= u * $PrefixJacNum""".stripMargin.replace("\n", " ")

  // -------------------------------------- multi-source BFS (min-hop)

  val BfsMaxDepth   = 4
  val BfsSeedStride = 50 // seeds: customers with c_custkey % 50 == 0
  val BfsMaxQty     = 2  // sparsifier: only low-quantity lineitems form edges

  /** q179 — multi-source BFS: minimum hop distance from a seed set of
    * customers through the customer↔supplier bipartite graph (an edge
    * where a supplier shipped a low-quantity lineitem on the
    * customer's order), out to [[BfsMaxDepth]] hops. The graph
    * reachability primitive the propagation family (q45/q64 CC, q116
    * PageRank) doesn't cover: CC answers "same component?", BFS
    * answers "how far?" — blast-radius and neighborhood-expansion
    * queries over entity graphs.
    *
    * Frontier-iterative: each round expands ONLY the newly-reached
    * frontier (one key-partitioned equi-join with the checkpointed
    * edge table), dedups it, and anti-joins the visited set — the
    * textbook distributed BFS. Because the graph is bipartite and all
    * seeds sit on one side, the whole frontier alternates sides each
    * round, so each round joins on a single key. Work per round is
    * O(frontier-adjacent edges); plan depth stays O(1) per round via
    * the CC-rounds localCheckpoint discipline. At 100 TB the edge
    * table is the one big artifact — built once (join + distinct =
    * two exchanges), checkpointed, and re-joined by key each round
    * with no rescan of lineitem. */
  def bfsDepth(s: SparkSession, d: String): DataFrame = {
    val edges = Tables.lineitem(s, d)
      .filter(col("l_quantity") <= BfsMaxQty)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
      .localCheckpoint(true) // built once, re-joined every round
    val seeds = Tables.customer(s, d)
      .filter(col("c_custkey") % BfsSeedStride === 0)
      .select(lit("C").as("typ"), col("c_custkey").as("node_id"),
        lit(0L).as("dist"))
    var visited  = seeds.localCheckpoint(true)
    var frontier = visited
    for (depth <- 1 to BfsMaxDepth) {
      val fromCust = depth % 2 == 1 // seeds are customers; sides alternate
      val next =
        if (fromCust)
          frontier.join(edges, col("node_id") === col("cust"))
            .select(lit("S").as("typ"), col("supp").as("node_id"),
              lit(depth.toLong).as("dist"))
        else
          frontier.join(edges, col("node_id") === col("supp"))
            .select(lit("C").as("typ"), col("cust").as("node_id"),
              lit(depth.toLong).as("dist"))
      frontier = next.distinct()
        .join(visited.select("typ", "node_id"), Seq("typ", "node_id"), "left_anti")
        .localCheckpoint(true)
      visited = visited.union(frontier).localCheckpoint(true)
    }
    visited
  }

  val bfsDepthSql: String =
    s"""WITH RECURSIVE e AS (SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_quantity <= $BfsMaxQty),
       |r(typ, node_id, dist) AS (
       |  SELECT 'C', c_custkey, 0 FROM customer WHERE c_custkey % $BfsSeedStride = 0
       |  UNION
       |  SELECT CASE WHEN r.typ = 'C' THEN 'S' ELSE 'C' END,
       |         CASE WHEN r.typ = 'C' THEN e.supp ELSE e.cust END, r.dist + 1
       |  FROM r JOIN e ON (r.typ = 'C' AND e.cust = r.node_id)
       |               OR (r.typ = 'S' AND e.supp = r.node_id)
       |  WHERE r.dist < $BfsMaxDepth)
       |SELECT typ, node_id, CAST(min(dist) AS BIGINT) AS dist
       |FROM r GROUP BY typ, node_id""".stripMargin.replace("\n", " ")

  // ------------------------------------------- k-core peeling (dense cores)

  val KCoreK      = 3
  val KCoreRounds = 8

  /** q180 — k-core peeling over the q179 bipartite graph: repeatedly
    * delete nodes with degree < [[KCoreK]] until the survivor set is
    * stable; emit each survivor with its within-core degree. The
    * dense-subgraph primitive behind collusion detection (customers
    * and suppliers locked in mutually dense low-quantity trade — the
    * fraud-ring shape) and hyperlink-graph quality filtering; the
    * peeling family is disjoint from propagation (q45/q64/q116): CC
    * spreads labels outward, k-core erodes the sparse fringe inward.
    *
    * [[KCoreRounds]] fixed peel rounds, each ONE degree aggregate per
    * side + two key-partitioned semi-joins over the surviving edge
    * set, localCheckpoint'ed (the CC-rounds discipline — O(1) plan
    * depth per round). Work per round is O(surviving edges), and the
    * edge set only shrinks. The fixed round count makes the op
    * deterministic and oracle-replayable (unrolled, like q116/q175);
    * KCoreSpec asserts the fixpoint is reached well inside the budget
    * — peeling's cascade depth grows with graph diameter, not size,
    * so the bound holds at 100 TB (add rounds ∝ log N if it ever
    * doesn't: each round is one linear pass). */
  def kcoreBipartite(s: SparkSession, d: String): DataFrame = {
    var edges = Tables.lineitem(s, d)
      .filter(col("l_quantity") <= BfsMaxQty)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
      .localCheckpoint(true)
    for (_ <- 1 to KCoreRounds) {
      val keepC = edges.groupBy("cust").agg(count(lit(1)).as("dc"))
        .filter(col("dc") >= KCoreK).select("cust")
      val keepS = edges.groupBy("supp").agg(count(lit(1)).as("ds"))
        .filter(col("ds") >= KCoreK).select("supp")
      edges = edges
        .join(keepC, Seq("cust"), "left_semi")
        .join(keepS, Seq("supp"), "left_semi")
        .localCheckpoint(true)
    }
    edges.groupBy("cust").agg(count(lit(1)).as("core_deg"))
      .select(lit("C").as("typ"), col("cust").as("node_id"), col("core_deg"))
      .union(edges.groupBy("supp").agg(count(lit(1)).as("core_deg"))
        .select(lit("S").as("typ"), col("supp").as("node_id"), col("core_deg")))
  }

  val kcoreBipartiteSql: String = {
    def round(i: Int): String = {
      val prev = s"e${i - 1}"
      s"""kc$i AS (SELECT cust FROM $prev GROUP BY cust HAVING count(*) >= $KCoreK),
         |ks$i AS (SELECT supp FROM $prev GROUP BY supp HAVING count(*) >= $KCoreK),
         |e$i AS MATERIALIZED (SELECT e.cust, e.supp FROM $prev e
         |  JOIN kc$i USING (cust) JOIN ks$i USING (supp))""".stripMargin
    }
    // MATERIALIZED: each e_i is referenced three times (kc/ks/e of the
    // next round); default CTE inlining would re-expand the whole
    // prefix 3^rounds times and blow the oracle's file-handle budget
    s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_quantity <= $BfsMaxQty),
       |${(1 to KCoreRounds).map(round).mkString(", ")}
       |SELECT 'C' AS typ, cust AS node_id, CAST(count(*) AS BIGINT) AS core_deg
       |FROM e$KCoreRounds GROUP BY cust
       |UNION ALL
       |SELECT 'S', supp, CAST(count(*) AS BIGINT) FROM e$KCoreRounds GROUP BY supp"""
      .stripMargin.replace("\n", " ")
  }

  // ---------------------------------- personalized PageRank from seeds

  val PprIters = 4

  /** q183 — personalized PageRank from the q179 seed cohort over the
    * same bipartite trade graph: stationary relevance TO the seeds,
    * not global importance. Completes the round's graph family — BFS
    * answers "how far from the seeds", k-core "how dense", PPR "how
    * RELEVANT": random-walk-with-restart mass that decays smoothly
    * with both distance and branching (the GraphSAGE/PPR-sampling and
    * data-valuation primitive). Teleport goes ONLY to seeds — unlike
    * q116, unreached nodes hold exactly zero and are dropped, so the
    * output is seed-neighborhood-sized, not graph-sized.
    *
    * Same integer fixed-point contract as q116 (mass ×1e12, integer
    * div — bit-identical cross-engine, no compounding ULPs), same
    * per-round shape: one src-keyed join + one dst-keyed aggregate +
    * one node-keyed left join, localCheckpoint'ed per round. The
    * directed edge list (both bipartite directions, out-degree
    * attached ONCE before the loop) is the only graph-sized artifact.
    * At 100 TB: [[PprIters]] rounds of linear joins; the node state is
    * two longs per node. */
  def pprSeeds(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.lineitem(s, d)
      .filter(col("l_quantity") <= BfsMaxQty)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
      .localCheckpoint(true)
    val degC = e0.groupBy("cust").agg(count(lit(1)).as("deg"))
    val degS = e0.groupBy("supp").agg(count(lit(1)).as("deg"))
    val edges = e0.join(degC, "cust")
      .select(lit("C").as("styp"), col("cust").as("src"),
        lit("S").as("dtyp"), col("supp").as("dst"), col("deg"))
      .union(e0.join(degS, "supp")
        .select(lit("S").as("styp"), col("supp").as("src"),
          lit("C").as("dtyp"), col("cust").as("dst"), col("deg")))
      .localCheckpoint(true) // deg attached once, reused every round
    val nodes = Tables.customer(s, d)
      .select(lit("C").as("typ"), col("c_custkey").as("node_id"),
        (col("c_custkey") % BfsSeedStride === 0).as("seed"))
      .union(Tables.supplier(s, d)
        .select(lit("S").as("typ"), col("s_suppkey").as("node_id"),
          lit(false).as("seed")))
      .localCheckpoint(true)
    val nSeeds = nodes.filter(col("seed")).count()
    val base = (PrScale * (PrDampDen - PrDampNum) / PrDampDen) / nSeeds
    var pr = nodes.select(col("typ"), col("node_id"),
      when(col("seed"), lit(PrScale / nSeeds)).otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to PprIters) {
      val contrib = edges
        .join(pr.withColumnRenamed("typ", "styp")
          .withColumnRenamed("node_id", "src"), Seq("styp", "src"))
        .select(col("dtyp"), col("dst"),
          expr(s"pr * $PrDampNum div ($PrDampDen * deg)").as("c"))
        .groupBy("dtyp", "dst").agg(sum("c").as("in_mass"))
      pr = nodes
        .join(contrib.withColumnRenamed("dtyp", "typ")
          .withColumnRenamed("dst", "node_id"), Seq("typ", "node_id"), "left")
        .select(col("typ"), col("node_id"),
          (when(col("seed"), lit(base)).otherwise(lit(0L)) +
            coalesce(col("in_mass"), lit(0L))).as("pr"))
        .localCheckpoint(true)
    }
    pr.filter(col("pr") > 0).select(col("typ"), col("node_id"),
      col("pr").as("ppr_x1e12"))
  }

  val pprSeedsSql: String = {
    def iter(i: Int): String = {
      val prev = s"p${i - 1}"
      s"""c$i AS MATERIALIZED (SELECT e.dtyp, e.dst,
         |  sum(($prev.pr * $PrDampNum) // ($PrDampDen * e.deg)) AS m
         |  FROM e JOIN $prev ON $prev.typ = e.styp AND $prev.node_id = e.src
         |  GROUP BY e.dtyp, e.dst),
         |p$i AS MATERIALIZED (SELECT n.typ, n.node_id, n.seed,
         |  (CASE WHEN n.seed THEN ((${PrScale} * ${PrDampDen - PrDampNum}) // $PrDampDen) // ns.n ELSE 0 END)
         |    + coalesce(c$i.m, 0) AS pr
         |  FROM nodes n CROSS JOIN ns
         |  LEFT JOIN c$i ON c$i.dtyp = n.typ AND c$i.dst = n.node_id)""".stripMargin
    }
    s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_quantity <= $BfsMaxQty),
       |dc AS (SELECT cust, count(*) AS deg FROM e0 GROUP BY cust),
       |ds AS (SELECT supp, count(*) AS deg FROM e0 GROUP BY supp),
       |e AS MATERIALIZED (
       |  SELECT 'C' AS styp, e0.cust AS src, 'S' AS dtyp, e0.supp AS dst, dc.deg
       |    FROM e0 JOIN dc USING (cust)
       |  UNION ALL
       |  SELECT 'S', e0.supp, 'C', e0.cust, ds.deg FROM e0 JOIN ds USING (supp)),
       |nodes AS MATERIALIZED (
       |  SELECT 'C' AS typ, c_custkey AS node_id, c_custkey % $BfsSeedStride = 0 AS seed FROM customer
       |  UNION ALL SELECT 'S', s_suppkey, false FROM supplier),
       |ns AS (SELECT count(*) AS n FROM nodes WHERE seed),
       |p0 AS MATERIALIZED (SELECT typ, node_id, seed,
       |  CASE WHEN seed THEN $PrScale // ns.n ELSE 0 END AS pr FROM nodes CROSS JOIN ns),
       |${(1 to PprIters).map(iter).mkString(", ")}
       |SELECT typ, node_id, CAST(pr AS BIGINT) AS ppr_x1e12
       |FROM p$PprIters WHERE pr > 0""".stripMargin.replace("\n", " ")
  }

  // --------------------------------- deterministic random-walk corpus

  val WalkLen = 4

  /** q184 — deterministic random-walk corpus from the q179 seed cohort
    * over the same bipartite trade graph: one length-[[WalkLen]] walk
    * per seed, the sampling primitive behind DeepWalk/node2vec graph
    * embeddings (walks ARE the "sentences" the skip-gram trainer
    * consumes) and behind GNN neighbor sampling. Where q179/q183
    * compute aggregate relevance, this MATERIALIZES trajectories.
    *
    * "Random" is derandomized the q85 way: at step t, walk w moves to
    * the out-neighbor minimizing md5(w:t:typ:node) — a content-keyed
    * choice both engines compute bit-identically (no RNG, so the 100 TB
    * corpus regenerates byte-for-byte on every run, and incremental
    * re-walks of changed subgraphs splice in consistently). Each step
    * includes the step index, so a walk does NOT simply bounce on one
    * edge: the argmin re-ranks every neighbor each hop.
    *
    * Scale: the frontier is seed-count-sized (one row per LIVE walk —
    * walks at sink nodes halt, though on this bipartite graph only an
    * isolated seed can halt). Each of the [[WalkLen]] rounds is one
    * frontier⋈edges equi-join plus one per-walk min-struct aggregate —
    * both linear in edge count, no window over the graph, driver holds
    * nothing. At 1000 executors the frontier co-partitions with the
    * edge table's src key. Output is exactly |seeds|·(WalkLen+1) rows. */
  def randomWalks(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.lineitem(s, d)
      .filter(col("l_quantity") <= BfsMaxQty)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    val edges = e0
      .select(lit("C").as("styp"), col("cust").as("src"),
        lit("S").as("dtyp"), col("supp").as("dst"))
      .union(e0.select(lit("S").as("styp"), col("supp").as("src"),
        lit("C").as("dtyp"), col("cust").as("dst")))
      .localCheckpoint(true) // walked 4×: cut the lineitem⋈orders recompute
    var cur = Tables.customer(s, d)
      .filter(col("c_custkey") % BfsSeedStride === 0)
      .select(col("c_custkey").as("walk_id"), lit("C").as("typ"),
        col("c_custkey").as("node_id"), lit(0L).as("step"))
    val steps = scala.collection.mutable.ArrayBuffer(cur)
    for (t <- 1 to WalkLen) {
      cur = cur
        .join(edges, col("styp") === col("typ") && col("src") === col("node_id"))
        .select(col("walk_id"), col("dtyp"), col("dst"),
          md5(concat_ws(":", col("walk_id"), lit(t), col("dtyp"), col("dst")))
            .as("hk"))
        // min over (hk, dtyp, dst): md5-keyed argmin, struct tail makes
        // the pick total even under a (practically impossible) collision
        .groupBy("walk_id")
        .agg(min(struct(col("hk"), col("dtyp"), col("dst"))).as("m"))
        .select(col("walk_id"), col("m.dtyp").as("typ"),
          col("m.dst").as("node_id"), lit(t.toLong).as("step"))
        .localCheckpoint(true) // frontier is |walks|-sized; cut lineage
      steps += cur
    }
    steps.reduce(_ union _).select("walk_id", "step", "typ", "node_id")
  }

  val randomWalksSql: String = {
    def step(t: Int): String =
      s"""w$t AS MATERIALIZED (SELECT walk_id, dtyp AS typ, dst AS node_id,
         |  CAST($t AS BIGINT) AS step FROM (
         |  SELECT w.walk_id, e.dtyp, e.dst, row_number() OVER (
         |    PARTITION BY w.walk_id
         |    ORDER BY md5(concat_ws(':', w.walk_id, $t, e.dtyp, e.dst)), e.dtyp, e.dst) AS rn
         |  FROM w${t - 1} w JOIN e ON e.styp = w.typ AND e.src = w.node_id)
         |  WHERE rn = 1)""".stripMargin
    s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_quantity <= $BfsMaxQty),
       |e AS MATERIALIZED (
       |  SELECT 'C' AS styp, cust AS src, 'S' AS dtyp, supp AS dst FROM e0
       |  UNION ALL SELECT 'S', supp, 'C', cust FROM e0),
       |w0 AS (SELECT c_custkey AS walk_id, 'C' AS typ, c_custkey AS node_id,
       |  CAST(0 AS BIGINT) AS step FROM customer WHERE c_custkey % $BfsSeedStride = 0),
       |${(1 to WalkLen).map(step).mkString(", ")}
       |${(0 to WalkLen).map(t => s"SELECT walk_id, step, typ, node_id FROM w$t")
          .mkString(" UNION ALL ")}""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------------- HITS hubs & authorities

  val HitsIters = 4

  /** q187 — HITS (Kleinberg) hubs & authorities over the DIRECTED
    * customer→supplier endorsement graph, completing the graph-scoring
    * family with the DUAL measure the others lack: q116/q183 rank by
    * random-walk mass, HITS ranks by MUTUAL REINFORCEMENT — a supplier
    * is authoritative when endorsed by strong hubs, a customer is a
    * strong hub when it endorses authoritative suppliers (the
    * curation analogue: source credibility vs curator judgement,
    * computed from the same interaction matrix as h←A·a, a←Aᵀ·h).
    *
    * All-integer fixed point, cross-engine exact: per half-step, one
    * edge⋈score join + one dst-keyed sum, then renormalization back to
    * total mass [[PrScale]] by the QUOTIENT trick — x // max(tot //
    * PrScale, 1) — which needs no overflow-prone x·scale product and
    * truncates identically in both engines. The normalizing total is a
    * one-row aggregate broadcast-crossed back (never collected).
    *
    * At 100 TB: [[HitsIters]] rounds of linear-in-edges joins; scores
    * are one long per touched node; the renorm adds two scalar
    * aggregates per round. Same contract as q183: untouched nodes hold
    * no rows at all, so state is edge-support-sized. */
  def hitsScores(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.lineitem(s, d)
      .filter(col("l_quantity") <= BfsMaxQty)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
      .localCheckpoint(true) // walked 2× per round
    val nC = e0.select("cust").distinct().count()
    def renorm(x: DataFrame, key: String, v: String): DataFrame = {
      val tot = x.agg(sum(col(v)).as("tot"))
      x.crossJoin(broadcast(tot))
        .select(col(key),
          expr(s"$v div greatest(tot div $PrScale, 1)").as(v))
    }
    var h = e0.select("cust").distinct()
      .select(col("cust"), lit(PrScale / nC).as("h"))
    var a: DataFrame = null
    for (_ <- 1 to HitsIters) {
      a = renorm(
        e0.join(h, "cust").groupBy("supp").agg(sum("h").as("a")),
        "supp", "a").localCheckpoint(true)
      h = renorm(
        e0.join(a, "supp").groupBy("cust").agg(sum("a").as("h")),
        "cust", "h").localCheckpoint(true)
    }
    h.select(lit("C").as("typ"), col("cust").as("node_id"),
        col("h").as("score_x1e12"))
      .union(a.select(lit("S"), col("supp"), col("a")))
      .filter(col("score_x1e12") > 0)
  }

  val hitsScoresSql: String = {
    def iter(t: Int): String =
      s"""ar$t AS (SELECT e.supp, sum(h.h) AS a FROM e JOIN h${t - 1} h USING (cust) GROUP BY e.supp),
         |a$t AS MATERIALIZED (SELECT supp,
         |  a // greatest((SELECT sum(a) FROM ar$t) // $PrScale, 1) AS a FROM ar$t),
         |hr$t AS (SELECT e.cust, sum(a.a) AS h FROM e JOIN a$t a USING (supp) GROUP BY e.cust),
         |h$t AS MATERIALIZED (SELECT cust,
         |  h // greatest((SELECT sum(h) FROM hr$t) // $PrScale, 1) AS h FROM hr$t)""".stripMargin
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_quantity <= $BfsMaxQty),
       |h0 AS (SELECT cust, $PrScale // (SELECT count(DISTINCT cust) FROM e) AS h
       |  FROM (SELECT DISTINCT cust FROM e)),
       |${(1 to HitsIters).map(iter).mkString(", ")}
       |SELECT 'C' AS typ, cust AS node_id, CAST(h AS BIGINT) AS score_x1e12
       |FROM h$HitsIters WHERE h > 0
       |UNION ALL
       |SELECT 'S', supp, CAST(a AS BIGINT) FROM a$HitsIters WHERE a > 0"""
      .stripMargin.replace("\n", " ")
  }

  // ------------------------------ label-propagation communities (LPA)

  val LpaRounds = 3

  /** q199 — synchronous LABEL-PROPAGATION community detection over the
    * q179 bipartite trade graph: each round, every node adopts the
    * PLURALITY label among its neighbors AND itself (count desc,
    * label asc on ties — fully deterministic, no random sweep order).
    * The community primitive the graph family still lacked: CC
    * (q45/q64) answers "connected at all?" — one bridge edge glues
    * two dense groups into one component; LPA splits along sparse
    * cuts because a node follows where MOST of its neighbors sit, not
    * any single edge. Nodes are namespaced into one integer id space
    * (cust → 2k, supp → 2k+1) so labels are totally ordered and the
    * min tie-break is pure integer compare on both engines.
    *
    * SELF-INCLUSION (a self-loop per node) is load-bearing, not a
    * tweak: under neighbors-only synchronous update on a bipartite
    * graph, labels swap sides every round — cust nodes forever hold
    * supp-origin labels and vice versa, so no community ever mixes
    * the two sides (LpaSpec caught exactly this). The self-vote
    * breaks the side-parity and is the standard retention fix.
    *
    * Fixed [[LpaRounds]] synchronous rounds (the q116/q183/q187
    * fixed-point contract: deterministic, oracle-unrollable; LPA
    * famously oscillates under synchronous update, so a fixed budget
    * is the PRINCIPLED stop rule here, not a compromise). Per round:
    * one dst-keyed join with the label state, one (node, label)-grain
    * count, one node-partitioned plurality window, localCheckpoint'ed
    * — O(1) plan depth per round, work ∝ directed edges. Output is
    * community-grain. At 100 TB the directed edge table is the one
    * graph-sized artifact, built once and re-joined by key each
    * round. */
  def lpaCommunities(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.lineitem(s, d)
      .filter(col("l_quantity") <= BfsMaxQty)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cu"), (col("l_suppkey") * 2 + 1).as("su"))
      .distinct()
    val both = e.select(col("cu").as("src"), col("su").as("dst"))
      .union(e.select(col("su").as("src"), col("cu").as("dst")))
    val nodes = both.select(col("src").as("node")).distinct()
    val und = both
      .union(nodes.select(col("node").as("src"), col("node").as("dst")))
      .localCheckpoint(true) // re-joined every round (self-loops included)
    var labels = nodes
      .select(col("node"), col("node").as("lab"))
      .localCheckpoint(true)
    val plurality = Window.partitionBy("node")
      .orderBy(col("c").desc, col("lab").asc)
    for (_ <- 1 to LpaRounds) {
      labels = und
        .join(labels.select(col("node").as("dst"), col("lab")), "dst")
        .groupBy(col("src").as("node"), col("lab"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(plurality))
        .filter(col("rn") === 1)
        .select("node", "lab")
        .localCheckpoint(true)
    }
    labels.groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("node") % 2 === 0, 1L).otherwise(0L)).as("n_cust"),
        sum(when(col("node") % 2 === 1, 1L).otherwise(0L)).as("n_supp"),
        min("node").as("min_node"), max("node").as("max_node"))
  }

  val lpaCommunitiesSql: String = {
    def round(t: Int): String =
      s"""c$t AS (SELECT u.src AS node, l.lab, count(*) AS c
         |  FROM u JOIN l${t - 1} l ON u.dst = l.node GROUP BY 1, 2),
         |l$t AS MATERIALIZED (SELECT node, lab FROM (SELECT node, lab,
         |  row_number() OVER (PARTITION BY node ORDER BY c DESC, lab ASC) AS rn
         |  FROM c$t) WHERE rn = 1)""".stripMargin
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS cu,
       |  l_suppkey * 2 + 1 AS su
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_quantity <= $BfsMaxQty),
       |b AS (SELECT cu AS src, su AS dst FROM e
       |  UNION ALL SELECT su, cu FROM e),
       |nd AS (SELECT DISTINCT src AS node FROM b),
       |u AS MATERIALIZED (SELECT src, dst FROM b
       |  UNION ALL SELECT node, node FROM nd),
       |l0 AS MATERIALIZED (SELECT node, node AS lab FROM nd),
       |${(1 to LpaRounds).map(round).mkString(", ")}
       |SELECT CAST(lab AS BIGINT) AS community,
       |  CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(count(*) FILTER (WHERE node % 2 = 0) AS BIGINT) AS n_cust,
       |  CAST(count(*) FILTER (WHERE node % 2 = 1) AS BIGINT) AS n_supp,
       |  CAST(min(node) AS BIGINT) AS min_node,
       |  CAST(max(node) AS BIGINT) AS max_node
       |FROM l$LpaRounds GROUP BY lab""".stripMargin.replace("\n", " ")
  }

  // --------------------------------- exact containment join (quotes)

  val ContainGramN = 5  // 3-grams measured 20.6 s at sf0.1: the fixed
                        // synthetic vocabulary keeps the 3-gram space at
                        // ~27k so df (and candidate mass) grows ∝N; the
                        // 5-gram space (~30⁵) dwarfs occurrence mass at
                        // any SF, pinning prefix df — and quotes shorter
                        // than 5 words aren't quotes worth chasing
  val ContainTauX4 = 8000L // τ = 0.8 as an exact ×10⁴ integer

  /** q188 — exact-recall CONTAINMENT join: ordered pairs (A, B) where
    * containment C(A→B) = |grams(A) ∩ grams(B)| / |grams(A)| ≥ τ — the
    * ASYMMETRIC dedup geometry Jaccard can't see (a short doc quoted
    * verbatim inside a long one has high containment but low Jaccard,
    * so q17/q62/q67 all miss it; q100's winnowing detects excerpts but
    * only approximately, from sampled fingerprints). This is the exact
    * complement, the same relationship q166 bears to q19.
    *
    * COMPLETE RECALL by the overlap prefix filter: C ≥ τ needs overlap
    * ≥ ⌈τ·|A|⌉, so among ANY |A|−⌈τ|A|⌉+1 grams of A at least one is
    * shared with B. Probe side therefore sends only each doc's
    * |A|−⌈τ|A|⌉+1 RAREST grams (global-df-ascending order — rarest
    * first minimizes Σ df over the prefix, i.e. candidate volume);
    * index side keeps all grams (containment can't prune the
    * container). Candidates then verify with the exact integer
    * containment — no LSH, no misses, and the oracle replays the
    * identical prefix, candidates and scores.
    *
    * Scale: candidate mass = Σ_docs Σ_prefix df(g). On natural corpora
    * gram space grows with N so prefix df stays O(1) and the join is
    * ~linear; on THIS fixed synthetic vocabulary df grows ∝N (same
    * documented residual as q62's block occupancy — measure, don't
    * guess). One gram-grain exchange each for df, prefix window, and
    * the probe⋈index join; verify touches candidates only, with the
    * native `word_grams_distinct` + array_intersect (no UDF). */
  def containmentPairs(s: SparkSession, d: String): DataFrame =
    containmentPairsFrom(Tables.documents(s, d))

  def containmentPairsFrom(docsIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docsIn
      .select(col("doc_id"), explode(graft.functions.GraftFunctions
        .wordGramsDistinct(col("text"), ContainGramN)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))
      .localCheckpoint(true) // feeds df, the prefix window, AND the index side
    val dfTab = grams.groupBy("gh").agg(count(lit(1)).as("df"))
    val nTab = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val prefix = grams.join(dfTab, "gh")
      .withColumn("rk",
        row_number().over(Window.partitionBy("doc_id").orderBy(col("df"), col("gh"))))
      .join(nTab, "doc_id")
      .filter(col("rk") <= expr("n_grams - (n_grams * 8 + 9) div 10 + 1"))
    val cand = prefix.select(col("doc_id").as("doc_a"), col("gh"))
      .join(grams.select(col("doc_id").as("doc_b"), col("gh")), "gh")
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val docs = docsIn
    def gset(c: org.apache.spark.sql.Column) =
      graft.functions.GraftFunctions.wordGramsDistinct(c, ContainGramN)
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
      .withColumn("ga", gset(col("text_a")))
      .withColumn("gb", gset(col("text_b")))
      .withColumn("cx",
        expr("(size(array_intersect(ga, gb)) * 10000L + size(ga) div 2) div size(ga)"))
      .filter(col("cx") >= ContainTauX4)
      .select(col("doc_a"), col("doc_b"),
        (col("cx").cast("double") / 10000.0).as("containment"))
  }

  val containmentPairsSql: String = {
    val n = ContainGramN
    s"""WITH ws AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS w FROM documents),
       |gr AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) < $n THEN [array_to_string(w, ' ')]
       |  ELSE [array_to_string(w[i:i+${n - 1}], ' ') for i in range(1, len(w) - ${n - 2})] END)) AS gram FROM ws),
       |gh AS MATERIALIZED (SELECT doc_id, md5(gram) AS gh FROM gr),
       |dfq AS (SELECT gh, count(*) AS df FROM gh GROUP BY gh),
       |na AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY doc_id),
       |pre AS (SELECT doc_id, gh FROM (
       |  SELECT g.doc_id, g.gh, na.n,
       |    row_number() OVER (PARTITION BY g.doc_id ORDER BY d.df, g.gh) AS rk
       |  FROM gh g JOIN dfq d USING (gh) JOIN na USING (doc_id))
       |  WHERE rk <= n - (n * 8 + 9) // 10 + 1),
       |cand AS (SELECT DISTINCT p.doc_id AS doc_a, g.doc_id AS doc_b
       |  FROM pre p JOIN gh g ON g.gh = p.gh AND g.doc_id <> p.doc_id),
       |sets AS (SELECT doc_id, list(gh) AS ss FROM gh GROUP BY doc_id),
       |cx AS (SELECT doc_a, doc_b,
       |  (len(list_intersect(x.ss, y.ss)) * 10000 + len(x.ss) // 2) // len(x.ss) AS c
       |  FROM cand JOIN sets x ON x.doc_id = cand.doc_a JOIN sets y ON y.doc_id = cand.doc_b)
       |SELECT doc_a, doc_b, CAST(c AS DOUBLE) / 10000.0 AS containment
       |FROM cx WHERE c >= $ContainTauX4""".stripMargin.replace("\n", " ")
  }
}
