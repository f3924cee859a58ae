package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Differentially-private count release via the GEOMETRIC MECHANISM
  * (the discrete Laplace of Ghosh–Roughgarden–Sundararajan: noise
  * k ∈ ℤ with P(k) ∝ p^|k|, p = e^−ε) — the privacy layer's missing
  * RELEASE op next to the k-anon/l-div/t-closeness AUDIT ops. Counting
  * queries have sensitivity 1, so adding two-sided-geometric noise at
  * parameter ε makes the released per-source histogram ε-DP, and the
  * discrete mechanism is exactly what integer engine parity wants: no
  * continuous Laplace floats to drift between engines.
  *
  * DERANDOMIZED SAMPLING, the dedup-family discipline: the uniform is
  * the 53-bit md5 of the release key ('dp:' + source), and the noise
  * is read off a precomputed inverse-CDF THRESHOLD LADDER — T_k =
  * floor(CDF(k)·2⁵³) for k ∈ [−[[DpTailBound]], +DpTailBound],
  * computed ONCE in Scala (pure integer thresholds; the ladder is in
  * both engines' query text, so the oracle replays the identical
  * draw). The ±[[DpTailBound]] truncation discards ≈ 2·e^(−ε·bound)
  * of mass — at ε=0.5, bound=100 that is ~10⁻²², far below the 53-bit
  * uniform's own 2⁻⁵³ resolution, so the clamp is unreachable by any
  * actual draw. A production
  * deployment keys the seed by (source, release_id) so each release
  * epoch redraws; the privacy analysis is per-release.
  *
  * The output is the AUDIT view (true count next to noise next to
  * release) for the correctness gate; the publishable projection is
  * (source, n_released, eps_x100). Releases are clamped at 0 (counts
  * are non-negative; post-processing preserves DP).
  *
  * Scale shape: one |sources|-bounded count aggregate, then pure map
  * math on the grid — the noise ladder is a constant-folded CASE
  * chain, no joins, no state. */
object Privacy {

  /** ε (×100): the per-release privacy budget. */
  val EpsX100 = 50
  /** Noise support bound: tail mass beyond ±100 (~10⁻²² at ε=0.5) is
    * below the 53-bit uniform's resolution — no draw can reach it. */
  val DpTailBound = 100

  /** Inverse-CDF thresholds: noise = min k with u53 < T_k. The final
    * threshold is pinned to 2⁵³ exactly (the CDF must exhaust the
    * uniform's range; float summation would leave it a few ulps shy). */
  private[graft] val thresholds: Seq[(Int, Long)] = {
    val p = math.exp(-EpsX100 / 100.0)
    val c = (1.0 - p) / (1.0 + p)
    val ks = -DpTailBound to DpTailBound
    var cdf = 0.0
    ks.map { k =>
      cdf += c * math.pow(p, math.abs(k))
      val t = if (k == DpTailBound) 1L << 53
              else math.min((cdf * (1L << 53)).toLong, 1L << 53)
      k -> t
    }
  }

  private def ladderSql(u: String): String =
    "CASE " + thresholds.map { case (k, t) => s"WHEN $u < $t THEN $k" }
      .mkString(" ") + s" ELSE $DpTailBound END"

  /** The noise draw as a column over a release-key string column —
    * reusable by any counting release (and by the spec on synthetic
    * key populations). Ascending-k when-chain: noise = min k with
    * u53 < T_k. */
  def geometricNoise(key: Column): Column = {
    val u = GraftFunctions.md5Lower53(key)
    thresholds.foldRight(lit(DpTailBound.toLong): Column) {
      case ((k, t), acc) => when(u < lit(t), lit(k.toLong)).otherwise(acc)
    }
  }

  /** q279 — the per-source DP count release (audit view). */
  def dpCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("noise", geometricNoise(concat(lit("dp:"), col("source"))))
      .select(col("source"), col("n_docs"), col("noise"),
        greatest(col("n_docs") + col("noise"), lit(0L)).as("n_released"),
        lit(EpsX100).as("eps_x100"))

  val dpCountsSql: String =
    s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
       |u AS (SELECT source, n_docs,
       |    CAST(md5_number_lower('dp:' || source) >> 11 AS BIGINT) AS u53 FROM c),
       |n AS (SELECT source, n_docs, ${ladderSql("u53")} AS noise FROM u)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(noise AS BIGINT) AS noise,
       |  greatest(n_docs + noise, 0) AS n_released,
       |  $EpsX100 AS eps_x100
       |FROM n""".stripMargin.replace("\n", " ")
}
