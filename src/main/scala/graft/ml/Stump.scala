package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Exact distributed DECISION-STUMP training (1-D CART split search) —
  * the ML primitive under feature selection, gradient-boosting's leaf
  * search, and every "which single signal separates the classes best"
  * audit. For each candidate feature dimension, the Gini-optimal
  * threshold over the labeled embedding corpus, found EXACTLY: every
  * candidate split's weighted Gini is a rational over integer class
  * counts, so the whole search is integer arithmetic and the two
  * engines agree bit-for-bit (no sampled histograms, no float Ginis —
  * minimizing Gini ⟺ maximizing Σ_side (Σ_c count²)/n_side, shipped
  * ×10⁶ by integer division).
  *
  * Scale shape: one (dim, value, label) count aggregate over the
  * exploded scan (the only corpus-sized exchange); the cumulative
  * class counts ride per-(dim, label) windows over the VALUE grid
  * (grid × |classes| rows — value-support-sized, not corpus-sized);
  * the per-dim argmax is a bounded window over the grid. Integer
  * headroom: Σ_c cum² ≤ |classes|·N², ×10⁶ must stay under 2⁶³ —
  * fine to ~10⁷ rows; past that, pre-bin values (the standard
  * XGBoost/LightGBM histogram move — same plan, coarser grid). */
object Stump {
  /** Candidate feature dims: the first [[StumpDims]] coordinates. */
  val StumpDims = 8
  val StumpScale = 1000000L

  /** q209 — per candidate dim: the best split (threshold, left size,
    * purity score ×1e6, gain over the unsplit parent ×1e6). A row per
    * dim keeps the output an audit table — argmax over it is the
    * trained stump. */
  def giniStump(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = Tables.embeddings(s, d)
      .select(posexplode(expr(
        s"slice(CAST(embedding AS ARRAY<DOUBLE>), 1, $StumpDims)"))
        .as(Seq("dim", "v")), col("label"))
    val cnt = rows.groupBy("dim", "v", "label")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // grid; feeds values, labels, and the join
    val values = cnt.select("dim", "v").distinct()
    val labels = cnt.select("label").distinct()
    // totals from ONE dim's grid (every dim carries every row — summing
    // across dims would inflate them StumpDims-fold)
    val tot = cnt.filter(col("dim") === 0)
      .groupBy("label").agg(sum("c").as("t"))
    // parent purity: Σ_c tot² ×1e6 div n — dim-independent scalar
    val parent = tot.agg(
      expr(s"sum(t * t) * $StumpScale div sum(t)").as("parent_ppm"),
      sum("t").as("n"))
    val cum = values.crossJoin(broadcast(labels))
      .join(cnt, Seq("dim", "v", "label"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("cum", sum("c").over(
        Window.partitionBy("dim", "label").orderBy("v")))
      .join(broadcast(tot), "label")
    val splits = cum.groupBy("dim", "v")
      .agg(
        sum("cum").as("n_left"),
        sum(expr("cum * cum")).as("ssq_l"),
        sum(expr("(t - cum) * (t - cum)")).as("ssq_r"))
      .crossJoin(broadcast(parent))
      .filter(col("n_left") < col("n")) // the all-left "split" is no split
      .withColumn("score_ppm", expr(
        s"ssq_l * $StumpScale div n_left + ssq_r * $StumpScale div (n - n_left)"))
    splits
      .withColumn("rn", row_number().over(
        Window.partitionBy("dim").orderBy(col("score_ppm").desc, col("v"))))
      .filter(col("rn") === 1)
      .select(col("dim"), col("v").as("split_v"), col("n_left"),
        col("score_ppm"), (col("score_ppm") - col("parent_ppm")).as("gain_ppm"))
  }

  val giniStumpSql: String =
    s"""WITH rows_e AS (SELECT CAST(s.i - 1 AS INT) AS dim, e.embedding[s.i] AS v, e.label
       |  FROM embeddings e CROSS JOIN (SELECT unnest(generate_series(1, $StumpDims)) AS i) s),
       |cnt AS (SELECT dim, CAST(v AS DOUBLE) AS v, label, count(*) AS c
       |  FROM rows_e GROUP BY 1, 2, 3),
       |vals AS (SELECT DISTINCT dim, v FROM cnt),
       |labs AS (SELECT DISTINCT label FROM cnt),
       |tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS t FROM cnt WHERE dim = 0 GROUP BY 1),
       |parent AS (SELECT CAST(sum(t * t) * $StumpScale // sum(t) AS BIGINT) AS parent_ppm,
       |  CAST(sum(t) AS BIGINT) AS n FROM tot),
       |cum AS (SELECT g.dim, g.v, g.label, t.t,
       |  CAST(sum(coalesce(c.c, 0)) OVER (PARTITION BY g.dim, g.label ORDER BY g.v)
       |    AS BIGINT) AS cum
       |  FROM (SELECT vals.dim, vals.v, labs.label FROM vals CROSS JOIN labs) g
       |  LEFT JOIN cnt c ON c.dim = g.dim AND c.v = g.v AND c.label = g.label
       |  JOIN tot t ON t.label = g.label),
       |splits AS (SELECT dim, v, CAST(sum(cum) AS BIGINT) AS n_left,
       |  CAST(sum(cum * cum) AS BIGINT) AS ssq_l,
       |  CAST(sum((t - cum) * (t - cum)) AS BIGINT) AS ssq_r
       |  FROM cum GROUP BY 1, 2),
       |scored AS (SELECT s.dim, s.v, s.n_left,
       |  CAST(s.ssq_l * $StumpScale // s.n_left
       |    + s.ssq_r * $StumpScale // (p.n - s.n_left) AS BIGINT) AS score_ppm,
       |  p.parent_ppm
       |  FROM splits s CROSS JOIN parent p WHERE s.n_left < p.n)
       |SELECT CAST(dim AS INT) AS dim, v AS split_v, n_left, score_ppm,
       |  score_ppm - parent_ppm AS gain_ppm
       |FROM (SELECT *, row_number() OVER
       |  (PARTITION BY dim ORDER BY score_ppm DESC, v) AS rn FROM scored)
       |WHERE rn = 1""".stripMargin.replace("\n", " ")
}
