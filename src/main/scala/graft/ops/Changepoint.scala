package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrospective CHANGEPOINT DETECTION by binary segmentation (Scott &
  * Knott's recursive split, the standard baseline the PELT literature
  * measures against) on the daily event-count series. The drift family
  * (q148 PSI, q216 KS, CUSUM) answers "is today different from the
  * baseline?"; this answers the retrospective question "WHERE did the
  * level shift?" — the query you run after an incident to date the
  * regime changes.
  *
  * Depth-2 segmentation → up to 4 segments: the best single split of
  * the series by within-segment SSE reduction, then the best split of
  * each side. For a fixed series mean the SSE-minimizing split
  * MAXIMIZES Σ S_seg²/n_seg (the S²/n identity), so the score needs
  * only cumulative sums — no per-day residuals.
  *
  * FLOAT RULE: the score is gq = S_L²·10⁴ div n_L + S_R²·10⁴ div n_R —
  * pure BIGINT (argmax ties broken by smallest split index), identical
  * in both engines. The ×10⁴ scale bounds the product at S ≤ ~9.6·10⁷
  * events; past that drop the scale factor (the quantization is only
  * there to keep sub-unit gain differences ordered) or pre-aggregate
  * counts to ×10⁻³ units — documented, not silent.
  *
  * Scale shape: ONE corpus pass contracts events to the (day, count)
  * grid; everything after — cumulative sums, candidate scores, argmax,
  * segment assembly — is |days|-bounded grid math (windows on ≤ 31
  * rows). At 100 TB the grid is still 31 rows. */
object Changepoint {

  val ScoreScale = 10000L

  /** q280 — segments of the daily event-count series after depth-2
    * binary segmentation: (seg_id, day_start, day_end, n_days,
    * n_events, mean_x100). */
  def changepoints(s: SparkSession, d: String): DataFrame =
    segmentsFrom(Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c")))

  /** The segmentation over an arbitrary (day, c) grid — the testable core. */
  def segmentsFrom(grid: DataFrame): DataFrame = {
    val byDay = Window.orderBy("day") // |days|-bounded grid window
    val i = grid.select(col("day"), col("c"),
      row_number().over(byDay).cast("long").as("i"),
      sum("c").over(byDay).as("cum"))
      .localCheckpoint(true) // tiny grid, five consumers
    val t = i.agg(max("i").as("n"), max("cum").as("s"))
    // STRICT-GAIN GUARD at every level: a split is accepted only if its
    // score strictly exceeds the unsplit segment's S²·scale div n — a
    // constant sub-series must stay whole (without the guard its ties
    // would split degenerately at k = 1). Gains below the ×10⁴
    // quantization grain are treated as no-change by construction.
    val l1 = i.crossJoin(broadcast(t)).filter(col("i") < col("n"))
      .select(col("i").as("k"),
        expr(s"cum*cum*$ScoreScale div i + (s-cum)*(s-cum)*$ScoreScale div (n-i)")
          .as("gq"),
        expr(s"s*s*$ScoreScale div n").as("g0"))
      .filter(col("gq") > col("g0"))
    val k1 = l1.orderBy(col("gq").desc, col("k")).limit(1)
      .select(col("k").as("k1"))
    val ik = i.crossJoin(broadcast(k1))
    val c1 = ik.filter(col("i") === col("k1")).select(col("cum").as("cum1"))
    val l2a = ik.crossJoin(broadcast(c1)).filter(col("i") < col("k1"))
      .select(col("i").as("k"),
        expr(s"cum*cum*$ScoreScale div i + (cum1-cum)*(cum1-cum)*$ScoreScale div (k1-i)")
          .as("gq"),
        expr(s"cum1*cum1*$ScoreScale div k1").as("g0"))
      .filter(col("gq") > col("g0"))
    val l2b = ik.crossJoin(broadcast(c1)).crossJoin(broadcast(t))
      .filter(col("i") > col("k1") && col("i") < col("n"))
      .select(col("i").as("k"),
        expr(s"(cum-cum1)*(cum-cum1)*$ScoreScale div (i-k1) + (s-cum)*(s-cum)*$ScoreScale div (n-i)")
          .as("gq"),
        expr(s"(s-cum1)*(s-cum1)*$ScoreScale div (n-k1)").as("g0"))
      .filter(col("gq") > col("g0"))
    val k2a = l2a.orderBy(col("gq").desc, col("k")).limit(1).select(col("k"))
    val k2b = l2b.orderBy(col("gq").desc, col("k")).limit(1).select(col("k"))
    val bounds = k1.select(col("k1").as("k"))
      .union(k2a).union(k2b)
      .union(t.select(col("n").as("k"))).distinct()
    val byK = Window.orderBy("k") // ≤ 4 rows
    val segs = bounds.select(col("k").as("hi"),
      coalesce(lag("k", 1).over(byK), lit(0L)).as("lo"),
      row_number().over(byK).cast("long").as("seg_id"))
    segs.join(i, col("i") > col("lo") && col("i") <= col("hi"))
      .groupBy("seg_id")
      .agg(min("day").as("day_start"), max("day").as("day_end"),
        count(lit(1)).as("n_days"), sum("c").as("n_events"))
      .withColumn("mean_x100",
        expr("(n_events * 100 + n_days div 2) div n_days"))
  }

  val changepointsSql: String =
    s"""WITH g AS (SELECT CAST(ts AS DATE) AS day, count(*) AS c
       |    FROM events GROUP BY 1),
       |i AS (SELECT day, c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
       |    sum(c) OVER (ORDER BY day) AS cum FROM g),
       |t AS (SELECT max(i) AS n, max(cum) AS s FROM i),
       |l1 AS (SELECT i.i AS k,
       |    i.cum*i.cum*$ScoreScale // i.i + (t.s-i.cum)*(t.s-i.cum)*$ScoreScale // (t.n-i.i) AS gq,
       |    t.s*t.s*$ScoreScale // t.n AS g0
       |  FROM i, t WHERE i.i < t.n),
       |k1 AS (SELECT k FROM l1 WHERE gq > g0 ORDER BY gq DESC, k LIMIT 1),
       |c1 AS (SELECT i.cum AS cum1 FROM i, k1 WHERE i.i = k1.k),
       |l2a AS (SELECT i.i AS k,
       |    i.cum*i.cum*$ScoreScale // i.i + (c1.cum1-i.cum)*(c1.cum1-i.cum)*$ScoreScale // (k1.k-i.i) AS gq,
       |    c1.cum1*c1.cum1*$ScoreScale // k1.k AS g0
       |  FROM i, k1, c1 WHERE i.i < k1.k),
       |l2b AS (SELECT i.i AS k,
       |    (i.cum-c1.cum1)*(i.cum-c1.cum1)*$ScoreScale // (i.i-k1.k) + (t.s-i.cum)*(t.s-i.cum)*$ScoreScale // (t.n-i.i) AS gq,
       |    (t.s-c1.cum1)*(t.s-c1.cum1)*$ScoreScale // (t.n-k1.k) AS g0
       |  FROM i, k1, c1, t WHERE i.i > k1.k AND i.i < t.n),
       |k2a AS (SELECT k FROM l2a WHERE gq > g0 ORDER BY gq DESC, k LIMIT 1),
       |k2b AS (SELECT k FROM l2b WHERE gq > g0 ORDER BY gq DESC, k LIMIT 1),
       |bounds AS (SELECT k FROM k1 UNION SELECT k FROM k2a
       |  UNION SELECT k FROM k2b UNION SELECT n AS k FROM t),
       |segs AS (SELECT k AS hi, coalesce(lag(k) OVER (ORDER BY k), 0) AS lo,
       |    CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS seg_id FROM bounds)
       |SELECT seg_id, min(i.day) AS day_start, max(i.day) AS day_end,
       |  count(*) AS n_days, CAST(sum(i.c) AS BIGINT) AS n_events,
       |  CAST((sum(i.c) * 100 + count(*) // 2) // count(*) AS BIGINT) AS mean_x100
       |FROM segs JOIN i ON i.i > segs.lo AND i.i <= segs.hi
       |GROUP BY seg_id""".stripMargin.replace("\n", " ")
}
