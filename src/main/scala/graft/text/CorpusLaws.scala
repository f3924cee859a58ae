package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Corpus statistical-law fits — Zipf's rank–frequency law and Heaps'
  * vocabulary-growth law — the two diagnostics that tell you whether a
  * text corpus LOOKS like natural language before you spend a training
  * run on it. A scraped corpus whose token frequencies don't fall as
  * ~1/rank is boilerplate- or spam-shaped; a corpus whose vocabulary
  * stops growing with size is template-generated. Both fits are OLS in
  * log–log space, reported with r² so the consumer sees the fit
  * quality, not just the exponent.
  *
  * Scale shape: Zipf runs entirely at VOCABULARY grain after the one
  * corpus→(token, freq) contraction (the q40/q87 shape); the rank
  * window is vocab-bounded, not corpus-bounded. Heaps never builds a
  * running distinct count over the corpus (inherently sequential):
  * instead each token contributes only its FIRST-occurrence position
  * (min doc_id — one aggregate), each document contributes its token
  * mass, and both collapse onto a fixed [[HeapsPoints]]-checkpoint
  * grid; the cumulative windows run on that grid. So the whole fit is
  * two corpus passes + grid math, at any corpus size.
  *
  * FLOAT RULE (r18, fixes the r17 hash flake): the ln-space points
  * quantize to ×[[OlsQ]] BIGINT fixed point BEFORE the moment sums,
  * so the sums are exact order-free integers in both engines and the
  * final 6dp cells descend from one identical double division tree;
  * r² (and slope, for a degenerate x grid) is NULL-guarded by EXACT
  * integer zero-variance tests (a saturated vocabulary makes Heaps'
  * V constant — slope 0 is the honest answer, r² undefined). */
object CorpusLaws {

  val HeapsPoints = 16

  private def tokensOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("token"))

  /** ×2²⁰ fixed-point scale for the ln-space points. A power of two,
    * so q = round(ln·2²⁰) is the same integer in every engine (the
    * q261/q169 rule), and from there EVERY compared cell descends
    * from exact, order-free integer algebra: the five OLS moment sums
    * run over BIGINT points (DECIMAL(38,0)/HUGEINT accumulators), so
    * Spark's partial-sum order and DuckDB's sequential fold produce
    * the SAME integers — the r17 flake (float moment sums whose
    * engine-dependent accumulation order flipped a round(…,6) cell
    * near a 5e-7 boundary) is structurally gone. The final
    * slope/intercept/r² divisions are one identical double tree over
    * those identical integers, so the rounded outputs are
    * bit-deterministic too. Quantization headroom: ln points ≤ ~40
    * (e⁴⁰ ≈ 2·10¹⁷ tokens) keep q ≤ 2²⁶, q² ≤ 2⁵², and the moment
    * sums inside DECIMAL(38,0) to ~10¹² vocabulary points. */
  val OlsQ = 1L << 20

  /** OLS (slope, intercept, r²) over (x, y) point columns via the
    * fixed-point moment algebra above. Returns a 1-row DataFrame.
    * Zero-variance guards are EXACT integer tests (B = 0, C = 0) —
    * no epsilon needed once the moments are integers. */
  private def olsFit(points: DataFrame, law: String): DataFrame = {
    val dec = "decimal(38,0)"
    val moments = points
      .select(
        expr(s"CAST(round(x * $OlsQ) AS BIGINT)").as("qx"),
        expr(s"CAST(round(y * $OlsQ) AS BIGINT)").as("qy"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("qx").cast(dec)).as("sx"),
        sum(col("qy").cast(dec)).as("sy"),
        sum((col("qx") * col("qx")).cast(dec)).as("sxx"),
        sum((col("qx") * col("qy")).cast(dec)).as("sxy"),
        sum((col("qy") * col("qy")).cast(dec)).as("syy"))
    val a = (col("n") * col("sxy") - col("sx") * col("sy")).cast(dec)
    val b = (col("n") * col("sxx") - col("sx") * col("sx")).cast(dec)
    val c = (col("n") * col("syy") - col("sy") * col("sy")).cast(dec)
    moments
      .select(col("n"), col("sx"), col("sy"),
        a.as("ia"), b.as("ib"), c.as("ic"))
      .select(
        lit(law).as("law"),
        col("n").as("n_points"),
        col("ia").cast("double").as("ad"),
        col("ib").cast("double").as("bd"),
        col("ic").cast("double").as("cd"),
        (col("ib") === lit(0)).as("bz"),
        (col("ic") === lit(0)).as("cz"),
        col("sx").cast("double").as("sxd"),
        col("sy").cast("double").as("syd"),
        col("n").cast("double").as("nd"))
      .select(
        col("law"), col("n_points"),
        round(slopeD, 6).as("slope"),
        round((col("syd") - slopeD * col("sxd")) /
          (col("nd") * lit(OlsQ.toDouble)), 6).as("intercept"),
        round(when(col("bz") || col("cz"), lit(null))
          .otherwise((col("ad") * col("ad")) / (col("bd") * col("cd"))), 6)
          .as("r2"))
  }

  /** Unrounded slope A/B with the exact-zero x-variance guard; shared
    * by the slope and intercept trees so both engines evaluate ONE
    * identical division. */
  private def slopeD: Column =
    when(col("bz"), lit(null)).otherwise(col("ad") / col("bd"))

  /** The two fits over an arbitrary documents-shaped frame (doc_id,
    * text) — the testable core. */
  def lawsFrom(docs: DataFrame): DataFrame = {
    val toks = tokensOf(docs)
    // ---- Zipf: ln(freq) on ln(rank), vocab grain
    val freq = toks.groupBy("token").agg(count(lit(1)).as("freq"))
    val ranked = freq.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token"))))
    val zipfPts = ranked.select(
      log(col("rank").cast("double")).as("x"),
      log(col("freq").cast("double")).as("y"))
    // ---- Heaps: ln(V) on ln(T) at HeapsPoints corpus-prefix checkpoints
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    // INTEGER bucket arithmetic (div, not /): float division here would
    // let a last-ulp difference flip a checkpoint assignment vs DuckDB
    def bucket(c: String): Column =
      least(lit(HeapsPoints.toLong), expr(s"$c * $HeapsPoints div (mx + 1)") + 1)
    val massByBucket = toks.groupBy("doc_id").agg(count(lit(1)).as("m"))
      .crossJoin(broadcast(mx))
      .groupBy(bucket("doc_id").as("b")).agg(sum(col("m")).as("mass"))
    val vocabByBucket = toks.groupBy("token").agg(min(col("doc_id")).as("first_doc"))
      .crossJoin(broadcast(mx))
      .groupBy(bucket("first_doc").as("b")).agg(count(lit(1)).as("v"))
    val grid = Window.orderBy("b") // ≤ HeapsPoints rows: grid-bounded
    val heapsPts = massByBucket.join(vocabByBucket, Seq("b"), "left")
      .select(col("b"), col("mass"), coalesce(col("v"), lit(0L)).as("v"))
      .select(col("b"),
        sum(col("mass")).over(grid).as("t_cum"),
        sum(col("v")).over(grid).as("v_cum"))
      .select(log(col("t_cum").cast("double")).as("x"),
        log(col("v_cum").cast("double")).as("y"))
    olsFit(zipfPts, "zipf").unionAll(olsFit(heapsPts, "heaps"))
  }

  /** q278 — Zipf slope + Heaps exponent over the documents table. */
  def corpusLaws(s: SparkSession, d: String): DataFrame =
    lawsFrom(Tables.documents(s, d))

  val corpusLawsSql: String =
    s"""WITH toks AS (SELECT doc_id,
       |    unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents),
       |freq AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1),
       |zp AS (SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY freq DESC, token) AS DOUBLE)) * $OlsQ) AS BIGINT) AS qx,
       |    CAST(round(ln(CAST(freq AS DOUBLE)) * $OlsQ) AS BIGINT) AS qy FROM freq),
       |zagg AS (SELECT count(*) AS n, sum(qx) AS sx, sum(qy) AS sy,
       |    sum(qx*qx) AS sxx, sum(qx*qy) AS sxy, sum(qy*qy) AS syy FROM zp),
       |mx AS (SELECT max(doc_id) AS mx FROM documents),
       |mb AS (SELECT least($HeapsPoints, (doc_id * $HeapsPoints) // (mx + 1) + 1) AS b,
       |    count(*) AS m FROM toks, mx GROUP BY 1),
       |vb AS (SELECT b, count(*) AS v FROM (
       |    SELECT least($HeapsPoints, (min(doc_id) * $HeapsPoints) // (mx + 1) + 1) AS b
       |    FROM toks, mx GROUP BY token, mx) GROUP BY 1),
       |hg AS (SELECT mb.b, sum(mb.m) OVER (ORDER BY mb.b) AS t_cum,
       |    sum(coalesce(vb.v, 0)) OVER (ORDER BY mb.b) AS v_cum
       |  FROM mb LEFT JOIN vb ON vb.b = mb.b),
       |hp AS (SELECT CAST(round(ln(CAST(t_cum AS DOUBLE)) * $OlsQ) AS BIGINT) AS qx,
       |    CAST(round(ln(CAST(v_cum AS DOUBLE)) * $OlsQ) AS BIGINT) AS qy FROM hg),
       |hagg AS (SELECT count(*) AS n, sum(qx) AS sx, sum(qy) AS sy,
       |    sum(qx*qx) AS sxx, sum(qx*qy) AS sxy, sum(qy*qy) AS syy FROM hp),
       |fits AS (SELECT 'zipf' AS law, n, sx, sy, sxx, sxy, syy FROM zagg
       |  UNION ALL SELECT 'heaps', n, sx, sy, sxx, sxy, syy FROM hagg),
       |calc AS (SELECT law, n,
       |    CAST(n*sxy - sx*sy AS DOUBLE) AS ad,
       |    CAST(n*sxx - sx*sx AS DOUBLE) AS bd,
       |    CAST(n*syy - sy*sy AS DOUBLE) AS cd,
       |    (n*sxx - sx*sx = 0) AS bz, (n*syy - sy*sy = 0) AS cz,
       |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
       |    CAST(n AS DOUBLE) AS nd FROM fits)
       |SELECT law, CAST(n AS BIGINT) AS n_points,
       |  round(CASE WHEN bz THEN NULL ELSE ad / bd END, 6) AS slope,
       |  round((syd - (CASE WHEN bz THEN NULL ELSE ad / bd END) * sxd) /
       |    (nd * ${OlsQ.toDouble}), 6) AS intercept,
       |  round(CASE WHEN bz OR cz THEN NULL ELSE (ad * ad) / (bd * cd) END, 6) AS r2
       |FROM calc""".stripMargin.replace("\n", " ")
}
