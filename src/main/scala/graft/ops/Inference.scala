package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multiple-comparison inference over the source fleet: the
  * two-proportion z-test grid (q242) and Benjamini–Hochberg FDR
  * control over it (q243) — the layer that turns the drift quartet's
  * per-pair alarms (q198 KS / q216 MWU / q210 χ² / q229 ANOVA) into
  * a DECISION: with C(k,2) pairs tested every run, some alarms are
  * guaranteed by chance alone, and BH (Benjamini & Hochberg 1995) is
  * the standard correction that bounds the expected fraction of
  * false alarms at α instead of strangling power the way Bonferroni
  * does.
  *
  * FLOAT RULE (two layers):
  *  - z6 is ONE double tree over exact per-pair integers using ONLY
  *    IEEE correctly-rounded ops (+ − × ÷ sqrt) — bit-identical on
  *    both engines, then round(·, 6).
  *  - the BH p-value is the ONE-SIDED CANTELLI BOUND p = 1/(1+z²)
  *    (the distribution-free two-sided bound would be 2/(1+z²)) —
  *    RATIONAL, no erf/exp, whose libm implementations the two
  *    engines need not share. The relevant comparison is the
  *    two-sided NORMAL p, and 1/(1+z²) exceeds 2·Φ(−z) for all z,
  *    so the gate stays conservative (fewer rejections) versus the
  *    normal-tail p it stands in for — the safe direction;
  *    at a site with a shared math kernel, swap in the asymptotic
  *    normal p — the BH mechanics below are unchanged. p_ppm derives
  *    from the ALREADY-ROUNDED z6 with correctly-rounded ops only,
  *    so it is one integer both engines agree on, and every BH
  *    comparison after that is exact integer arithmetic.
  *
  * Scale shape: ONE (source) aggregate over the corpus scan computes
  * (n, x) per source; everything downstream — the pair grid, the
  * rank, the step-up scan — is C(|sources|,2)-grain grid math. The
  * rank window is a single-partition window over the PAIR GRID (190
  * rows at 20 sources), never the corpus.
  */
object Inference {

  /** BH target false-discovery rate: α = 5% (ppm fixed point). */
  val AlphaPpm = 50000L

  /** The success predicate whose rate is compared across sources:
    * q23's integer-space quality cut (n_tok ≥ 20 ∧ 5·n_stop < 3·n_tok)
    * — so q242 reads "did the GOOD-DOC RATE drift between these two
    * feeds", the proportion twin of q216's location test.
    *
    * Shaped as an ADDITIVE (source) count grid so it doubles as
    * streaming state (the q198/q217 posture —
    * [[graft.streaming.StreamingFraud.goodRateCountsStream]]): per
    * source just (n_g, x_g), two counters that only ratchet upward,
    * and [[twoPropZFromCounts]]/[[bhFdrFromCounts]] replay the full
    * registered outputs from any state snapshot without re-touching
    * the corpus. Input schema: (source, text). */
  def goodRateCounts(docs: DataFrame): DataFrame = {
    val stopPred = Seq("the", "a", "of", "and", "is", "to")
      .map(w => s"t = '$w'").mkString(" OR ")
    docs
      .select(col("source"),
        expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").cast("long")
          .as("ntok"),
        expr(s"size(filter(split(text, ' '), t -> $stopPred))").cast("long")
          .as("nstop"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_g"),
        sum(when(expr("ntok >= 20 AND 5 * nstop < 3 * ntok"), 1L)
          .otherwise(0L)).as("x_g"))
  }

  private def perSourceGood(s: SparkSession, d: String): DataFrame =
    goodRateCounts(Tables.documents(s, d))

  // The shared z tree — identical text on both engines; only
  // correctly-rounded IEEE ops, NULL on the degenerate pooled rates
  // (x = 0 or x = N, where the variance is zero).
  private def zExpr(xa: String, na: String, xb: String, nb: String): String = {
    val x = s"($xa + $xb)"
    val n = s"($na + $nb)"
    s"CASE WHEN $x = 0 OR $x = $n THEN NULL ELSE " +
      s"round((CAST($xa AS DOUBLE) / CAST($na AS DOUBLE) - " +
      s"CAST($xb AS DOUBLE) / CAST($nb AS DOUBLE)) / " +
      s"sqrt((CAST($x AS DOUBLE) / CAST($n AS DOUBLE)) * " +
      s"(1.0 - CAST($x AS DOUBLE) / CAST($n AS DOUBLE)) * " +
      s"(1.0 / CAST($na AS DOUBLE) + 1.0 / CAST($nb AS DOUBLE))), 6) END"
  }

  /** q242 — TWO-PROPORTION z-TEST per source pair on the good-doc
    * rate: the proportion member of the drift family. Pooled
    * variance (the standard score test): z = (p̂a − p̂b) /
    * √(p̂(1−p̂)(1/na+1/nb)) with p̂ = (xa+xb)/(na+nb). */
  def twoPropZ(s: SparkSession, d: String): DataFrame =
    twoPropZFromCounts(perSourceGood(s, d).localCheckpoint(true))

  /** The pair-grid tail over a (source, n_g, x_g) count snapshot —
    * batch and streaming replays share this exact code. */
  def twoPropZFromCounts(g: DataFrame): DataFrame = {
    val a = g.select(col("source").as("source_a"), col("n_g").as("n_a"),
      col("x_g").as("x_a"))
    val b = g.select(col("source").as("source_b"), col("n_g").as("n_b"),
      col("x_g").as("x_b"))
    a.join(b, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        col("n_a"), col("n_b"), col("x_a"), col("x_b"),
        expr(zExpr("x_a", "n_a", "x_b", "n_b")).as("z6"))
  }

  private val perSourceGoodSql: String = {
    val stopPred = Seq("the", "a", "of", "and", "is", "to")
      .map(w => s"t = '$w'").mkString(" OR ")
    "SELECT source, count(*) AS n_g, " +
      "CAST(sum(CASE WHEN len(regexp_extract_all(text, '[a-z0-9]+')) >= 20 " +
      s"AND 5 * len(list_filter(string_split(text, ' '), t -> $stopPred)) " +
      "< 3 * len(regexp_extract_all(text, '[a-z0-9]+')) THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS x_g FROM documents GROUP BY 1"
  }

  val twoPropZSql: String =
    s"""WITH g AS ($perSourceGoodSql)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  CAST(a.n_g AS BIGINT) AS n_a, CAST(b.n_g AS BIGINT) AS n_b,
       |  a.x_g AS x_a, b.x_g AS x_b,
       |  ${zExpr("a.x_g", "a.n_g", "b.x_g", "b.n_g")} AS z6
       |FROM g a JOIN g b ON a.source < b.source"""
      .stripMargin.replace("\n", " ")

  // Cantelli p in ppm from the rounded z — correctly-rounded ops on an
  // already-identical double, then a deterministic half-up round.
  private val PPpmExpr: String =
    "CAST(CASE WHEN z6 IS NULL THEN 1000000 " +
      "ELSE round(1000000.0 / (1.0 + z6 * z6), 0) END AS BIGINT)"

  /** q243 — BENJAMINI–HOCHBERG step-up over the q242 pair grid:
    * pairs ranked by p ascending; k* = max{k : p_(k) ≤ (k/m)·α};
    * pairs ranked ≤ k* are rejected (drift CONFIRMED at FDR α).
    * The step-up comparison is exact: p_ppm·m ≤ rank·[[AlphaPpm]]
    * in BIGINTs. Output carries the evidence trail (z6, p_ppm, rank,
    * the per-rank step-up flag's maximum k*) so the gate's decision
    * is auditable row by row. */
  def bhFdr(s: SparkSession, d: String): DataFrame =
    bhFdrFromCounts(perSourceGood(s, d).localCheckpoint(true))

  /** The full BH decision replayed from a count snapshot. */
  def bhFdrFromCounts(g: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = twoPropZFromCounts(g)
      .withColumn("p_ppm", expr(PPpmExpr))
    // pair-grid grain: the windows below see C(|sources|,2) rows
    val byP = Window.orderBy(col("p_ppm"), col("source_a"), col("source_b"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    pairs
      .withColumn("rank", row_number().over(byP).cast("long"))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("step_ok",
        when(col("p_ppm") * col("m") <= col("rank") * AlphaPpm, col("rank"))
          .otherwise(lit(0L)))
      .withColumn("k_star", max(col("step_ok")).over(all))
      .select(col("source_a"), col("source_b"), col("z6"), col("p_ppm"),
        col("rank"), col("k_star"),
        when(col("rank") <= col("k_star"), 1L).otherwise(0L).as("reject"))
  }

  /** q267 — A/A NULL CALIBRATION of the drift gate: split every
    * source into two pseudo-arms by a deterministic doc_id hash and
    * run the q242 two-proportion z WITHIN each source — where the
    * null is true BY CONSTRUCTION. The statistical-hygiene op every
    * experimentation platform runs before trusting its alarms
    * (Kohavi's A/A test): if pseudo-pairs reject at more than α, the
    * gate's variance model is broken (correlated docs, wrong
    * pooling), and every real alarm it raised is suspect. Emits the
    * per-source pseudo-z plus the realized false-alarm count at
    * |z| > 1.96 — expected ~5% of sources.
    *
    * Same FLOAT RULE as q242 (one correctly-rounded double tree);
    * the arm split is the md5-parity hash both engines share.
    *
    * Scale shape: ONE (source, arm) count aggregate over the scan;
    * everything after is |sources|-grain. */
  def aaCalibration(s: SparkSession, d: String): DataFrame = {
    val stopPred = Seq("the", "a", "of", "and", "is", "to")
      .map(w => s"t = '$w'").mkString(" OR ")
    val arms = Tables.documents(s, d)
      .select(col("source"),
        (graft.functions.GraftFunctions.md5Lower64(
          concat(lit("aa:"), col("doc_id").cast("string")))
          .bitwiseAND(Long.MaxValue) % 2).as("arm"),
        expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").cast("long")
          .as("ntok"),
        expr(s"size(filter(split(text, ' '), t -> $stopPred))").cast("long")
          .as("nstop"))
      .groupBy("source", "arm")
      .agg(count(lit(1)).as("n"),
        sum(when(expr("ntok >= 20 AND 5 * nstop < 3 * ntok"), 1L)
          .otherwise(0L)).as("x"))
    val a = arms.filter(col("arm") === 0)
      .select(col("source"), col("n").as("n_a"), col("x").as("x_a"))
    val b = arms.filter(col("arm") === 1)
      .select(col("source"), col("n").as("n_b"), col("x").as("x_b"))
    a.join(b, "source")
      .select(col("source"), col("n_a"), col("n_b"), col("x_a"), col("x_b"),
        expr(zExpr("x_a", "n_a", "x_b", "n_b")).as("z6"))
      .withColumn("false_alarm",
        expr("CAST(CASE WHEN z6 IS NOT NULL AND abs(z6) > 1.96 " +
          "THEN 1 ELSE 0 END AS BIGINT)"))
  }

  val aaCalibrationSql: String = {
    val stopPred = Seq("the", "a", "of", "and", "is", "to")
      .map(w => s"t = '$w'").mkString(" OR ")
    s"""WITH arms AS (SELECT source,
       |  CAST(md5_number_lower('aa:' || CAST(doc_id AS VARCHAR))
       |    & ${Long.MaxValue} AS BIGINT) % 2 AS arm,
       |  count(*) AS n,
       |  CAST(sum(CASE WHEN len(regexp_extract_all(text, '[a-z0-9]+')) >= 20
       |    AND 5 * len(list_filter(string_split(text, ' '), t -> $stopPred))
       |    < 3 * len(regexp_extract_all(text, '[a-z0-9]+'))
       |    THEN 1 ELSE 0 END) AS BIGINT) AS x
       |  FROM documents GROUP BY 1, 2),
       |a AS (SELECT source, CAST(n AS BIGINT) AS n_a, x AS x_a
       |  FROM arms WHERE arm = 0),
       |b AS (SELECT source, CAST(n AS BIGINT) AS n_b, x AS x_b
       |  FROM arms WHERE arm = 1),
       |z AS (SELECT a.source, n_a, n_b, x_a, x_b,
       |  ${zExpr("x_a", "n_a", "x_b", "n_b")} AS z6
       |  FROM a JOIN b ON a.source = b.source)
       |SELECT source, n_a, n_b, x_a, x_b, z6,
       |  CAST(CASE WHEN z6 IS NOT NULL AND abs(z6) > 1.96
       |    THEN 1 ELSE 0 END AS BIGINT) AS false_alarm
       |FROM z""".stripMargin.replace("\n", " ")
  }

  /** q257 — WILSON SCORE INTERVAL per source for the good-doc rate:
    * the proportion CI that behaves at the extremes where the naive
    * Wald interval collapses (x = 0 or x = n give Wald width 0;
    * Wilson stays honest — Brown, Cai & DasGupta 2001 recommend it
    * outright). The practical read: RANK SOURCES BY wilson_lo6 —
    * "sort by lower bound" — so a 3/3 source never outranks a
    * 940/1000 one. Pairs with q242/q243: the BH gate says WHICH
    * pairs drifted; this says how certain each source's own rate is.
    *
    * FLOAT RULE: one double tree per bound over the exact (n, x)
    * integers — center (p̂ + z²/2n) ∓ z·√(p̂(1−p̂)/n + z²/4n²), all
    * over (1 + z²/n), with z = 1.96 a shared literal; only
    * correctly-rounded IEEE ops (+ − × ÷ √), so both engines emit
    * identical doubles, then round(·, 6).
    *
    * Scale shape: the q242 count grid (one corpus scan, additive —
    * the streaming twin replays this too) plus per-row grid math;
    * output is |sources| rows. */
  def wilsonBounds(s: SparkSession, d: String): DataFrame =
    wilsonBoundsFromCounts(perSourceGood(s, d))

  def wilsonBoundsFromCounts(g: DataFrame): DataFrame =
    g.select(col("source"), col("n_g").as("n"), col("x_g").as("x"),
      expr("x_g * 1000000 div n_g").as("rate_ppm"),
      expr(wilsonExpr("x_g", "n_g", "-")).as("wilson_lo6"),
      expr(wilsonExpr("x_g", "n_g", "+")).as("wilson_hi6"))

  // (p̂ + z²/2n ∓ z√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n), z = 1.96 —
  // identical text on both engines, column names passed in.
  private def wilsonExpr(x: String, n: String, sign: String): String = {
    val p = s"(CAST($x AS DOUBLE) / CAST($n AS DOUBLE))"
    val nD = s"CAST($n AS DOUBLE)"
    s"round(($p + 3.8416 / (2.0 * $nD) $sign 1.96 * " +
      s"sqrt($p * (1.0 - $p) / $nD + 3.8416 / (4.0 * $nD * $nD))) / " +
      s"(1.0 + 3.8416 / $nD), 6)"
  }

  val wilsonBoundsSql: String =
    s"""WITH g AS ($perSourceGoodSql)
       |SELECT source, CAST(n_g AS BIGINT) AS n, x_g AS x,
       |  CAST(x_g * 1000000 // n_g AS BIGINT) AS rate_ppm,
       |  ${wilsonExpr("x_g", "n_g", "-")} AS wilson_lo6,
       |  ${wilsonExpr("x_g", "n_g", "+")} AS wilson_hi6
       |FROM g""".stripMargin.replace("\n", " ")

  val bhFdrSql: String =
    s"""WITH z AS ($twoPropZSql),
       |p AS (SELECT *, $PPpmExpr AS p_ppm FROM z),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (ORDER BY p_ppm, source_a, source_b) AS BIGINT) AS rank,
       |  CAST(count(*) OVER () AS BIGINT) AS m FROM p),
       |k AS (SELECT *, max(CASE WHEN p_ppm * m <= rank * $AlphaPpm
       |    THEN rank ELSE 0 END) OVER () AS k_star FROM r)
       |SELECT source_a, source_b, z6, p_ppm, rank, k_star,
       |  CAST(CASE WHEN rank <= k_star THEN 1 ELSE 0 END AS BIGINT) AS reject
       |FROM k""".stripMargin.replace("\n", " ")
}
