package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / the 100 TB checklist:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default here)
  * already splits oversized SHUFFLE-JOIN partitions at runtime; these
  * helpers cover the cases AQE does not: single-key hash aggregations
  * whose one reducer receives a hot key, and broadcast-inflation joins
  * where one dimension row matches a huge fact slice.
  */
object Skew {

  /** Two-stage aggregation for skewed group keys: stage 1 aggregates on
    * (key, salt) — spreading a hot key over `numSalts` reducers — and
    * stage 2 combines the partials per key. Correct for any aggregate
    * with an associative partial form; exposed for the common
    * count/sum/min/max combos.
    *
    * The salt is a deterministic hash of a high-cardinality column
    * (spread evenly, reproducible) — never rand(), which breaks retries
    * and task re-execution semantics. */
  def saltedSumCount(df: DataFrame, key: Column, saltSource: Column,
                     value: Column, numSalts: Int = 16): DataFrame =
    df.groupBy(key.as("k"), (pmod(xxhash64(saltSource), lit(numSalts))).as("salt"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_cnt"))
      .groupBy(col("k"))
      .agg(sum("partial_sum").as("total"), sum("partial_cnt").as("cnt"))

  /** Salted join for a skewed fact ⋈ small-dim: the fact side gets a
    * deterministic salt in [0, numSalts); the dim side is exploded
    * `numSalts`× so every (key, salt) pair finds its row. The shuffle
    * then spreads each hot key over `numSalts` reducers. Use when the
    * dim is too big to broadcast but the fact's key distribution is
    * skewed; result is identical to `fact.join(dim, factKey === dimKey,
    * "inner")`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: Column, dimKey: Column, saltSource: Column,
                 numSalts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(numSalts)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedFact
      .join(saltedDim,
        factKey === dimKey && saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }

  // ------------------------------------------- join-key skew profile

  /** Rows in the q135 profile: the hot head is what a planner looks
    * at; the full per-key distribution stays distributed. */
  val SkewTopN = 20

  /** q135 — join-KEY SKEW PROFILE of the q69 fact key (`l_suppkey`):
    * per hot key its row count, corpus share, and ratio to the mean
    * key load — the measurement that DECIDES between a plain shuffle
    * join, AQE skew splitting, and [[saltedJoin]]. Every production
    * salting story starts with this table (salt count ≈ the top key's
    * skew factor); shipping the diagnostic as a first-class op is
    * what makes the q69 mitigation reproducible instead of folklore.
    *
    * Scale shape: one fact scan into a keyed count (map-side partial
    * combine does the heavy lifting — the shuffle carries one row per
    * key per task), the scalar total/mean as a one-row broadcast over
    * the key-sized table, and a bounded TakeOrdered head. Nothing is
    * proportional to the fact table except the first combine. All
    * ratio columns are integer fixed-point (FLOAT RULE: integer
    * division on both engines — `div` / `//`), tiebreak on the key
    * keeps the head deterministic. The cnt·n_keys·10⁴ product is
    * widened to DECIMAL(38,0) / HUGEINT before dividing: at 100 TB
    * (1e8-row hot key × 1e7 keys) the Int64 product wraps silently in
    * Spark (ANSI off) while DuckDB raises — the widened intermediate
    * keeps the fixed-point ratio exact and engine-consistent. */
  def keySkewProfile(s: SparkSession, d: String): DataFrame =
    keySkewProfileFrom(Tables.lineitem(s, d), col("l_suppkey"))
      .withColumnRenamed("k", "l_suppkey")

  /** [[keySkewProfile]] over an explicit fact frame and key — the
    * generic entry [[profiledJoin]] and SkewSpec drive. Output columns
    * (k, cnt, share_x10k, skew_x10k), hot head only. */
  def keySkewProfileFrom(fact: DataFrame, key: Column): DataFrame = {
    val counts = fact.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum("cnt").as("total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("k"), col("cnt"),
        expr("CAST(CAST(cnt AS DECIMAL(38,0)) * 10000 div total AS BIGINT)").as("share_x10k"),
        expr("CAST(CAST(cnt AS DECIMAL(38,0)) * n_keys * 10000 div total AS BIGINT)").as("skew_x10k"))
      .orderBy(col("cnt").desc, col("k"))
      .limit(SkewTopN)
  }

  // --------------------------------- profile-driven join posture (r13)

  /** The three mitigation tiers the q135 measurement decides between.
    * Thresholds are on the profile's `skew_x10k` (top-key load as a
    * fixed-point multiple of the mean key load). */
  sealed trait JoinPosture
  /** No hot key: a plain shuffle join partitions evenly. */
  case object PlainShuffle extends JoinPosture
  /** Moderate hot key: AQE's runtime skew-split (on by default here)
    * handles it — partitions are oversized but splittable, no plan
    * change needed. */
  case object AqeSkewSplit extends JoinPosture
  /** Severe hot key: one reducer would own skew/10⁴ × the mean load —
    * pre-salt with enough salts to flatten the hot key back to ≈ mean. */
  final case class Salted(numSalts: Int) extends JoinPosture

  /** skew_x10k below this (4× the mean key load) → plain shuffle. */
  val AqeSkewX10k = 4L * 10000L
  /** skew_x10k below this (16× the mean) → AQE; at or above → salt. */
  val SaltSkewX10k = 16L * 10000L
  val MaxSalts = 64

  /** Read a (k, cnt, share_x10k, skew_x10k) profile head and pick the
    * posture. The profile is ≤ [[SkewTopN]] rows — a bounded collect,
    * the same "measurement drives the plan" move as AQE, done from a
    * persisted profile instead of runtime map stats. Salt count is the
    * top key's skew factor (VERDICT r12 #6 / the q135 doc's own
    * prescription), capped at [[MaxSalts]] so the dim-side explode
    * stays bounded. */
  def adviseJoin(profile: DataFrame): JoinPosture = {
    val top = profile.select(max("skew_x10k")).head()
    val skew = if (top.isNullAt(0)) 0L else top.getLong(0)
    if (skew < AqeSkewX10k) PlainShuffle
    else if (skew < SaltSkewX10k) AqeSkewSplit
    else Salted(math.min(MaxSalts, math.ceil(skew / 10000.0).toInt))
  }

  /** The connected pair: PROFILE the fact key (q135's op), then join
    * with the posture the profile advises — plain/AQE joins stay
    * untouched (AQE's own skew split needs no plan change), a severe
    * hot key routes through [[saltedJoin]]. Result rows are identical
    * across postures (SkewSpec pins this on constructed hot-key and
    * uniform tables); only the shuffle shape changes. Returns the
    * chosen posture alongside the joined frame so callers (and specs)
    * can see the decision. */
  def profiledJoin(fact: DataFrame, dim: DataFrame,
                   factKey: Column, dimKey: Column, saltSource: Column,
                   advise: DataFrame => JoinPosture = adviseJoin)
      : (JoinPosture, DataFrame) = {
    val posture = advise(keySkewProfileFrom(fact, factKey))
    val joined = posture match {
      case Salted(n) => saltedJoin(fact, dim, factKey, dimKey, saltSource, n)
      case _         => fact.join(dim, factKey === dimKey)
    }
    (posture, joined)
  }

  val keySkewProfileSql: String =
    s"""WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1),
       |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_keys FROM c)
       |SELECT l_suppkey, cnt,
       |  CAST(CAST(cnt AS HUGEINT) * 10000 // total AS BIGINT) AS share_x10k,
       |  CAST(CAST(cnt AS HUGEINT) * n_keys * 10000 // total AS BIGINT) AS skew_x10k
       |FROM c, t ORDER BY cnt DESC, l_suppkey LIMIT $SkewTopN""".stripMargin.replace("\n", " ")
}
