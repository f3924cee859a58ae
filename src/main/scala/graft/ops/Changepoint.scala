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
  * in both engines. The ×10⁴ scale bounds the series total at
  * [[MaxSeriesTotal]] events (2·S²·10⁴ must stay under 2⁶³); past that
  * drop the scale factor (the quantization is only there to keep
  * sub-unit gain differences ordered) or pre-aggregate counts to
  * ×10⁻³ units. The bound is ENFORCED at runtime — a series past it
  * fails loudly instead of wrapping silently (both engines would wrap
  * the same way and produce matching-but-wrong splits).
  *
  * Scale shape: ONE corpus pass contracts events to the (day, count)
  * grid; everything after — cumulative sums, candidate scores, argmax,
  * segment assembly — is |days|-bounded grid math (windows on ≤ 31
  * rows). At 100 TB the grid is still 31 rows. */
object Changepoint {

  val ScoreScale = 10000L

  /** Largest series total the ×10⁴ quantization tolerates: gq sums two
    * S²·ScoreScale div n terms, so 2·S²·10⁴ ≤ 2⁶³−1 ⟹ S ≤ 2.147·10⁷.
    * Enforced in [[segmentsFrom]] — exceeding it raises instead of
    * wrapping. */
  val MaxSeriesTotal = 21000000L

  /** q280 — segments of the daily event-count series after depth-2
    * binary segmentation: (seg_id, day_start, day_end, n_days,
    * n_events, mean_x100). */
  def changepoints(s: SparkSession, d: String): DataFrame =
    segmentsFrom(Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c")))

  /** q280's tail over a (event_type, day, x) grid snapshot — the
    * streaming-replay face: the shared (type, day) state
    * ([[Quality.typeDayCounts]], the q240/q251/q264/q283 builder) sums
    * over types to the daily series, so the retrospective segmentation
    * runs as a LIVE alarm off the one grid state without re-touching
    * the events (StreamingFraudSpec pins replay parity with the
    * registered batch query). */
  def changepointsFromCounts(grid: DataFrame): DataFrame =
    segmentsFrom(grid.groupBy("day").agg(sum("x").as("c")))

  /** The segmentation over an arbitrary (day, c) grid — the testable core. */
  def segmentsFrom(grid: DataFrame): DataFrame = {
    val byDay = Window.orderBy("day") // |days|-bounded grid window
    val i = grid.select(col("day"), col("c"),
      row_number().over(byDay).cast("long").as("i"),
      sum("c").over(byDay).as("cum"))
      .localCheckpoint(true) // tiny grid, five consumers
    val t = i.agg(max("i").as("n"), max("cum").as("s"))
      // OVERFLOW GUARD, explicit at runtime: past MaxSeriesTotal the
      // S²·ScoreScale products wrap BIGINT silently in BOTH engines
      // (matching-but-wrong splits). assert_true returns null when the
      // bound holds, so `s` is numerically unchanged on valid input.
      .select(col("n"),
        (col("s") + coalesce(
          assert_true(col("s") <= lit(MaxSeriesTotal),
            lit(s"q280: series total exceeds $MaxSeriesTotal events — " +
              "the S^2 x 10^4 quantization would overflow BIGINT; " +
              "drop ScoreScale or pre-aggregate counts")).cast("long"),
          lit(0L))).as("s"))
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

  // ------------------------------------------------ Mann–Kendall trend

  /** q283 — MANN–KENDALL TREND TEST per event type on the shared
    * (type, day) count grid ([[Quality.typeDayCounts]], the q240/q251/
    * q264 builder): the nonparametric SIGNIFICANCE dual of q251's
    * Theil–Sen SLOPE — Theil–Sen says how steep, Mann–Kendall says
    * whether the monotone trend is real at all. S = Σ_{i<j}
    * sign(x_j − x_i) over day pairs; the tie-corrected variance
    * 18·Var = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (tie groups t over the
    * count VALUES); z = (S ∓ 1)/√Var with the continuity correction,
    * 0 at S = 0.
    *
    * FLOAT RULE: S and 18·Var are exact BIGINTs (grid-pair sums); z is
    * ONE correctly-rounded IEEE tree (divide, sqrt) over those exact
    * integers — the q242 discipline — shipped at 6dp. Scale shape: one
    * corpus contraction to the calendar grid, then |types|·C(|days|,2)
    * pair algebra (435 pairs per type at a month — constant at ANY
    * corpus size) and a |values|-bounded tie table. */
  def mannKendall(s: SparkSession, d: String): DataFrame =
    mannKendallFrom(Quality.typeDayCounts(Tables.events(s, d)))

  def mannKendallFrom(grid0: DataFrame): DataFrame = {
    val grid = grid0.localCheckpoint(true) // calendar grid, three consumers
    val a = grid.select(col("event_type"), col("day").as("da"), col("x").as("xa"))
    val b = grid.select(col("event_type"), col("day").as("db"), col("x").as("xb"))
    val sTab = a.join(b, Seq("event_type")).filter(col("da") < col("db"))
      .groupBy("event_type")
      .agg(sum(signum(col("xb") - col("xa")).cast("long")).as("s_stat"))
    val nTab = grid.groupBy("event_type").agg(count(lit(1)).as("n"))
    val ties = grid.groupBy("event_type", "x").agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
    sTab.join(nTab, "event_type").join(ties, "event_type")
      .withColumn("var_x18",
        expr("n * (n - 1) * (2 * n + 5) - tie_term"))
      .withColumn("z", round(
        when(col("s_stat") > 0,
          (col("s_stat") - 1).cast("double") / sqrt(col("var_x18").cast("double") / 18.0))
          .when(col("s_stat") < 0,
            (col("s_stat") + 1).cast("double") / sqrt(col("var_x18").cast("double") / 18.0))
          .otherwise(lit(0.0)), 6))
      .select(col("event_type"), col("n").as("n_days"), col("s_stat"),
        col("var_x18"), col("z"),
        when(col("z") >= 1.96, "increasing")
          .when(col("z") <= -1.96, "decreasing")
          .otherwise("no_trend").as("trend"))
  }

  val mannKendallSql: String =
    """WITH g AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
      |    FROM events GROUP BY 1, 2),
      |st AS (SELECT a.event_type,
      |    CAST(sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM g a JOIN g b ON a.event_type = b.event_type AND a.day < b.day
      |  GROUP BY 1),
      |nt AS (SELECT event_type, count(*) AS n FROM g GROUP BY 1),
      |tt AS (SELECT event_type, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT event_type, x, count(*) AS t FROM g GROUP BY 1, 2) GROUP BY 1),
      |v AS (SELECT st.event_type, st.s_stat, nt.n,
      |    CAST(nt.n * (nt.n - 1) * (2 * nt.n + 5) - tt.tie_term AS BIGINT) AS var_x18
      |  FROM st JOIN nt ON nt.event_type = st.event_type
      |  JOIN tt ON tt.event_type = st.event_type),
      |z AS (SELECT event_type, n, s_stat, var_x18,
      |    round(CASE WHEN s_stat > 0
      |          THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(CAST(var_x18 AS DOUBLE) / 18.0)
      |          WHEN s_stat < 0
      |          THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(CAST(var_x18 AS DOUBLE) / 18.0)
      |          ELSE 0.0 END, 6) AS z FROM v)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days, s_stat, var_x18, z,
      |  CASE WHEN z >= 1.96 THEN 'increasing'
      |       WHEN z <= -1.96 THEN 'decreasing'
      |       ELSE 'no_trend' END AS trend
      |FROM z""".stripMargin.replace("\n", " ")

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
