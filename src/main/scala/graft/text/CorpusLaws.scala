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
  * FLOAT NOTE: the log–log sums run over vocab-/grid-bounded point
  * sets and the outputs are rounded at 6dp (the established
  * cross-engine grain); r² is NULL-guarded when the dependent variable
  * has zero variance (a saturated vocabulary makes Heaps' V constant —
  * slope 0 is the honest answer, r² undefined). */
object CorpusLaws {

  val HeapsPoints = 16

  private def tokensOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("token"))

  /** OLS (slope, intercept, r²) over (x, y) point columns, with the
    * zero-variance guard. Returns a 1-row DataFrame. */
  private def olsFit(points: DataFrame, law: String): DataFrame =
    points.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
      .select(
        lit(law).as("law"),
        col("n").cast("long").as("n_points"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) / col("n"), 6)
          .as("intercept"),
        round(((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          zeroGuard((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("r2"))

  /** The zero-variance guard must be a TOLERANCE, not `nullif(x, 0)`:
    * for a genuinely constant dependent variable Spark's partial-sum
    * order sometimes leaves an ~1e-10 residual where DuckDB's single-
    * threaded fold gets exact 0.0 — an exact-zero test then disagrees
    * between engines run to run. Any |variance product| below the
    * threshold is zero AS A FIT (legit fits sit orders of magnitude
    * above it). */
  private val VarEps = 1e-9
  private def zeroGuard(c: Column): Column =
    when(abs(c) < VarEps, lit(null)).otherwise(c)

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
       |zp AS (SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, token) AS DOUBLE)) AS x,
       |    ln(CAST(freq AS DOUBLE)) AS y FROM freq),
       |zagg AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM zp),
       |mx AS (SELECT max(doc_id) AS mx FROM documents),
       |mb AS (SELECT least($HeapsPoints, (doc_id * $HeapsPoints) // (mx + 1) + 1) AS b,
       |    count(*) AS m FROM toks, mx GROUP BY 1),
       |vb AS (SELECT b, count(*) AS v FROM (
       |    SELECT least($HeapsPoints, (min(doc_id) * $HeapsPoints) // (mx + 1) + 1) AS b
       |    FROM toks, mx GROUP BY token, mx) GROUP BY 1),
       |hg AS (SELECT mb.b, sum(mb.m) OVER (ORDER BY mb.b) AS t_cum,
       |    sum(coalesce(vb.v, 0)) OVER (ORDER BY mb.b) AS v_cum
       |  FROM mb LEFT JOIN vb ON vb.b = mb.b),
       |hp AS (SELECT ln(CAST(t_cum AS DOUBLE)) AS x, ln(CAST(v_cum AS DOUBLE)) AS y FROM hg),
       |hagg AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM hp),
       |fits AS (SELECT 'zipf' AS law, n, sx, sy, sxx, sxy, syy FROM zagg
       |  UNION ALL SELECT 'heaps', n, sx, sy, sxx, sxy, syy FROM hagg)
       |SELECT law, CAST(n AS BIGINT) AS n_points,
       |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
       |  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) AS intercept,
       |  round((n*sxy - sx*sy) * (n*sxy - sx*sy) /
       |    (CASE WHEN abs((n*sxx - sx*sx) * (n*syy - sy*sy)) < 1e-9
       |          THEN NULL ELSE (n*sxx - sx*sx) * (n*syy - sy*sy) END), 6) AS r2
       |FROM fits""".stripMargin.replace("\n", " ")
}
