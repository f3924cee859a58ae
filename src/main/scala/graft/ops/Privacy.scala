package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Count release via the GEOMETRIC MECHANISM (the discrete Laplace of
  * Ghosh–Roughgarden–Sundararajan: noise k ∈ ℤ with P(k) ∝ p^|k|,
  * p = e^−ε) — the privacy layer's RELEASE-mechanism op next to the
  * k-anon/l-div/t-closeness AUDIT ops. Counting queries have
  * sensitivity 1, and the discrete mechanism is exactly what integer
  * engine parity wants: no continuous Laplace floats to drift between
  * engines.
  *
  * WHAT THIS OP IS AND IS NOT: it demonstrates the geometric
  * mechanism's ALGEBRA (inverse-CDF ladder, clamping, post-processing)
  * under engine-parity DERANDOMIZATION — the "uniform" is the 53-bit
  * md5 of the PUBLIC release key ('dp:' + source), so anyone who knows
  * the mechanism can recompute the draw and recover the exact count.
  * As registered it is therefore an AUDIT VIEW of the mechanism (it
  * even ships n_docs beside the release, deliberately), NOT a private
  * release. A deployment gets actual ε-DP by keying the draw with a
  * SECRET, per-epoch component — e.g. md5(secret_release_id || source)
  * — which leaves every threshold below unchanged; the privacy
  * analysis is then per-release, and the publishable projection is
  * (source, n_released, eps_x100) only.
  *
  * The noise is read off a precomputed inverse-CDF THRESHOLD LADDER —
  * T_k = floor(CDF(k)·2⁵³) for k ∈ [−[[DpTailBound]], +DpTailBound],
  * computed ONCE in Scala (pure integer thresholds; the ladder is in
  * both engines' query text, so the oracle replays the identical
  * draw). The ±[[DpTailBound]] truncation discards ≈ 2·e^(−ε·bound)
  * of mass — at ε=0.5, bound=100 that is ~10⁻²², far below the 53-bit
  * uniform's own 2⁻⁵³ resolution, so the clamp is unreachable by any
  * actual draw.
  *
  * The output is the audit view (true count next to noise next to
  * release) for the correctness gate. Releases are clamped at 0
  * (counts are non-negative; post-processing preserves DP).
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
