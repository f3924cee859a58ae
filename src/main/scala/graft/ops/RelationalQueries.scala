package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational operator inventory (SURVEY.md §2.1-§2.5)
  * re-expressed as Spark-first declarative plans over the driver corpus.
  *
  * Scale notes (100 TB):
  *  - Scalar thresholds (p99, mean+2σ) are computed by a separate tiny
  *    one-row action and injected as literals. That keeps the main plan a
  *    single pass and lets Catalyst fold the literal into the pushed filter.
  *  - Per-key flags use window aggregates over a single hash-partitioning
  *    of the fact table instead of collecting key lists to the driver and
  *    shipping an `isin` (the reference's approach, run_pipeline.py:24-31,
  *    which is O(keys) on the driver and un-distributable).
  *  - Small dimensions (nation/region) are broadcast; the big fact joins
  *    shuffle on their join keys once and reuse the exchange.
  */
object RelationalQueries {
  import Tables._

  /** S1+P1: parquet scan with predicate pushdown + column pruning.
    * `.explain` must show PushedFilters + a 3-column ReadSchema. */
  def scanFilterProject(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 1000.0)
      .select("c_custkey", "c_name", "c_acctbal")

  val scanFilterProjectSql: String =
    "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0"

  /** A1/A2: hash aggregate with a distinct sub-aggregate (map-side partial
    * agg, then one shuffle on the group key). */
  def groupAgg(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupBy("c_nationkey")
      .agg(
        countDistinct("c_mktsegment").as("n_seg"),
        count(lit(1)).as("n_cust"),
        round(sum("c_acctbal"), 2).as("sum_bal"))

  val groupAggSql: String =
    "SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_seg, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal FROM customer GROUP BY c_nationkey"

  /** A3: HAVING against a scale-free scalar (avg customers per nation) —
    * the scalar is a one-row action, not a per-row subquery. */
  def havingFilter(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val thr = c.agg((count(lit(1)) / countDistinct("c_nationkey")).as("t"))
      .head().getDouble(0)
    c.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"))
      .filter(col("n_cust") > lit(thr))
  }

  val havingFilterSql: String =
    "SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey HAVING count(*) > (SELECT CAST(count(*) AS DOUBLE) / count(DISTINCT c_nationkey) FROM customer)"

  /** A1+J1 fused: the reference's `nunique→isin` flag pattern
    * (run_pipeline.py:24-26), distributed with no driver collect.
    * Shape (r9): a count-distinct AGGREGATE at the key grain plus a
    * broadcast join-back — NOT the collect_set window this shipped
    * with through r8. The partition key has FIXED cardinality
    * (25 nations), so the window funneled the whole customer table
    * through 25 tasks however large the data — the one remaining
    * bounded-key window outside the reference's golden path. The
    * aggregate takes map-side partials (tiny exchange of partial
    * rows), its 25-row result broadcasts, and the fact side never
    * shuffles at all; each scan reads only its two columns. */
  def windowFlag(s: SparkSession, d: String): DataFrame = {
    val nseg = customer(s, d)
      .groupBy("c_nationkey")
      .agg(countDistinct("c_mktsegment").as("n_seg"))
    customer(s, d)
      .join(broadcast(nseg), "c_nationkey")
      .select(
        col("c_custkey"),
        when(col("n_seg") > 1, "MultiSegment").otherwise("Normal").as("flag"))
  }

  val windowFlagSql: String =
    "SELECT c.c_custkey, CASE WHEN n.n_seg > 1 THEN 'MultiSegment' ELSE 'Normal' END AS flag FROM customer c JOIN (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_seg FROM customer GROUP BY c_nationkey) n ON c.c_nationkey = n.c_nationkey"

  /** A4: exact p99 (linear interpolation — pandas `quantile` semantics,
    * run_pipeline.py:34) + strict `>` filter. The scalar comes from
    * [[Quantiles.exactPercentile]] — the approx-bracket two-pass plan
    * with bounded aggregation state — NOT the single-buffer exact
    * `percentile` aggregate that r1-r4 shipped (every value of the
    * column in one buffer; the identified q05 scale-killer). Value is
    * identical (QuantilesSpec asserts bit-equality), so the strict-`>`
    * filter and the oracle are unchanged. */
  def quantileP99(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val p99 = Quantiles.exactPercentile(li, "l_extendedprice", 0.99)
    li.filter(col("l_extendedprice") > lit(p99))
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
  }

  val quantileP99Sql: String =
    "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem WHERE l_extendedprice > (SELECT quantile_cont(l_extendedprice, 0.99) FROM lineitem)"

  /** W1+W2+P6: sort-free lag — the reference's global sort_values
    * (run_pipeline.py:38) is subsumed by the window's per-partition sort.
    * Tie-break on o_orderkey for determinism (pandas relies on stable
    * sort + file order; SURVEY §2.5 W2). */
  def lagDatediff(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders(s, d)
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .select(
        col("o_orderkey"),
        datediff(col("o_orderdate"), col("prev")).as("days_since_prev"),
        when(datediff(col("o_orderdate"), col("prev")) <= 7, 1).otherwise(0).as("frequent"))
  }

  val lagDatediffSql: String =
    "SELECT o_orderkey, date_diff('day', CAST(prev AS DATE), CAST(o_orderdate AS DATE)) AS days_since_prev, CASE WHEN date_diff('day', CAST(prev AS DATE), CAST(o_orderdate AS DATE)) <= 7 THEN 1 ELSE 0 END AS frequent FROM (SELECT o_orderkey, o_orderdate, lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev FROM orders) t"

  /** A5+P11: mean + k·stddev_pop threshold (ddof=0, matching NumPy —
    * run_pipeline.py:66; k=1 here so the filter is non-vacuous on the
    * near-uniform corpus — the fraud pipeline itself uses k=2).
    * Scalar action, then a pushable filter. */
  def anomalyThreshold(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val r: Row = o.agg(avg("o_totalprice"), stddev_pop("o_totalprice")).head()
    val thr = r.getDouble(0) + 1.0 * r.getDouble(1)
    o.filter(col("o_totalprice") > lit(thr)).select("o_orderkey", "o_totalprice")
  }

  val anomalyThresholdSql: String =
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) + 1 * stddev_pop(o_totalprice) FROM orders)"

  /** P8+P9+P10: the reference's full rule-tag composition
    * (run_pipeline.py:22-43) on the orders table: fixed-order `;`-suffixed
    * tag concat, empty→'Normal'. Both windows share the o_custkey hash
    * partitioning, so the exchange is reused (one shuffle total). */
  def ruleTags(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    // bracket-exact scalar (bit-identical to the single-buffer
    // `percentile` aggregate — see Quantiles / QuantilesSpec)
    val p99 = Quantiles.exactPercentile(o, "o_totalprice", 0.99)
    val wKey  = Window.partitionBy("o_custkey")
    val wLag  = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val days  = datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(wLag))
    val tags = concat(
      when(size(collect_set(col("o_orderstatus")).over(wKey)) > 1, "MultiStatus;").otherwise(""),
      when(col("o_totalprice") > lit(p99), "HighValue;").otherwise(""),
      when(days <= 7, "FrequentBuyer;").otherwise(""))
    o.withColumn("tag_raw", tags)
      .select(
        col("o_orderkey"),
        when(col("tag_raw") === "", "Normal").otherwise(col("tag_raw")).as("tag"))
  }

  val ruleTagsSql: String =
    "WITH ms AS (SELECT o_custkey, count(DISTINCT o_orderstatus) AS n_st FROM orders GROUP BY o_custkey), lagd AS (SELECT o_orderkey, o_custkey, o_totalprice, date_diff('day', CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE), CAST(o_orderdate AS DATE)) AS days FROM orders), tagged AS (SELECT l.o_orderkey, concat(CASE WHEN m.n_st > 1 THEN 'MultiStatus;' ELSE '' END, CASE WHEN l.o_totalprice > (SELECT quantile_cont(o_totalprice, 0.99) FROM orders) THEN 'HighValue;' ELSE '' END, CASE WHEN l.days <= 7 THEN 'FrequentBuyer;' ELSE '' END) AS tag_raw FROM lagd l JOIN ms m ON l.o_custkey = m.o_custkey) SELECT o_orderkey, CASE WHEN tag_raw = '' THEN 'Normal' ELSE tag_raw END AS tag FROM tagged"

  /** A7+W3+W4: value_counts → count-desc with deterministic tie-break +
    * limit (app.py:41, app.py:20). */
  def valueCountsTop(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"))
      .limit(10)

  val valueCountsTopSql: String =
    "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 10"

  /** P4+P7: string formatting / casting of dates (run_pipeline.py:18,85). */
  def dateFormat(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
      to_date(col("o_orderdate")).as("d_date"))

  val dateFormatSql: String =
    "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d_str, CAST(o_orderdate AS DATE) AS d_date FROM orders"

  /** Beyond-reference: star join. lineitem⋈orders shuffles on the join
    * key (sort-merge at 100 TB, AQE may pick broadcast at small SF);
    * customer⋈nation are broadcast — no shuffle for the dimensions. */
  def joinRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  val joinRevenueSql: String =
    "SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"

  /** The q13 revenue join with NO hint anywhere — the input
    * [[sketchJoinRevenue]] hands the sketch-driven advisor. */
  def unhintedRevenueJoin(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  /** q157 — q13's revenue join DRIVEN BY THE SKETCH-JOIN ADVISOR
    * (VERDICT r13 next-round #7: the rule existed but no registered
    * query ran it end-to-end). The join carries no `broadcast()` hint
    * and size-based auto-broadcast is disabled for the run — the only
    * way the dims can broadcast is [[graft.plans.SketchJoinRule]]
    * reading the catalog entries this query `analyze`s first (one
    * scan per dim: exact rows + KMV distinct keys). Same oracle as
    * q13; PlanSpec pins that customer AND nation broadcast under the
    * rule and revert to shuffle joins without it — while
    * lineitem ⋈ orders (uncataloged fact-fact) stays a sort-merge
    * join, the defer-to-ignorance branch.
    *
    * The conf flip runs in an ISOLATED child session (`newSession()` —
    * same SparkContext, injected rules, and cache, but its own
    * SQLConf), so queries planned concurrently on the caller's session
    * never see auto-broadcast disabled; the result materializes
    * eagerly (localCheckpoint — the output is |nations| rows) before
    * returning. At 100 TB the conf is simply on for the session and
    * the catalog maintained by the table owner's analyze job. */
  def sketchJoinRevenue(s: SparkSession, d: String): DataFrame = {
    graft.plans.SketchCatalog.analyze(s, s"$d/nation.parquet", "n_nationkey")
    graft.plans.SketchCatalog.analyze(s, s"$d/customer.parquet", "c_custkey")
    val iso = s.newSession()
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    iso.conf.set("spark.graft.sketchJoin.broadcastRows", "1000000")
    unhintedRevenueJoin(iso, d).localCheckpoint(true)
  }

  /** Beyond-reference: top-1-per-group via ranking window (deterministic
    * tie-break), the scalable replacement for per-group sort+head. */
  def windowTopN(s: SparkSession, d: String): DataFrame =
    // argmax-per-key as a lexicographic struct-max AGGREGATE, not a
    // row_number window: per-customer order counts grow with the data,
    // and the window sorts every partition for a 1-row answer while the
    // codegen'd HashAggregate reduces map-side to one struct per key
    // before the exchange (unlike the r4 ivfAssign case — bounded
    // nlist-sized partitions, ObjectHashAggregate array buffers — this
    // is a plain declarative max over (price, -orderkey): rank-1 over
    // an UNBOUNDED per-key stream, the regime where the aggregate wins;
    // see PERF_NOTES §q20-family). Ties: highest price, then smallest
    // orderkey — the negated key makes lexicographic max reproduce the
    // oracle's ORDER BY price DESC, orderkey ASC exactly.
    orders(s, d)
      .groupBy("o_custkey")
      .agg(max(struct(col("o_totalprice").as("p"),
        (-col("o_orderkey")).as("no"))).as("m"))
      .select(col("o_custkey"), (-col("m.no")).as("top_orderkey"),
        col("m.p").as("o_totalprice"))

  val windowTopNSql: String =
    "SELECT o_custkey, o_orderkey AS top_orderkey, o_totalprice FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t WHERE rn = 1"

  /** Beyond-reference: anti join (left_anti broadcasts the build side when
    * small; shuffled-hash otherwise). Customers with no 'P'-status order. */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(
        orders(s, d).filter(col("o_orderstatus") === "P").select("o_custkey"),
        col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select("c_custkey")

  val antiJoinSql: String =
    "SELECT c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')"

  /** Beyond-reference: sessionization — gap>30min starts a new session.
    * Two stacked windows on the same (user_id) partitioning (exchange
    * reused), then one hash aggregate. The streaming twin lives in
    * graft.streaming. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wCum = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapMs = unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w))
    events(s, d)
      .withColumn("is_new", when(gapMs.isNull || gapMs > 1800000L, 1).otherwise(0))
      .withColumn("session_idx", sum(col("is_new")).over(wCum))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
  }

  val sessionizeSql: String =
    "WITH g AS (SELECT user_id, event_id, value, ts, CASE WHEN lag(ts) OVER w IS NULL OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS is_new FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), se AS (SELECT user_id, value, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM g) SELECT user_id, session_idx, count(*) AS n_events, round(sum(value), 2) AS total_value FROM se GROUP BY user_id, session_idx"

  /** Depth bucket cap for q142: sessions of 10+ events share one row. */
  final val SessionDepthCap = 10L

  /** Beyond-reference: SESSION CONVERSION BY DEPTH — q27's sessions
    * rolled up to the product question they exist for: of sessions
    * with k events, what fraction contained a purchase? Same two
    * stacked (user_id) windows as q27 (exchange reused), the session
    * aggregate gains a purchase flag, then ONE tiny depth-bucketed
    * aggregate (≤ [[SessionDepthCap]]+1 rows out). Conversion is
    * integer fixed-point (FLOAT RULE: `div` / `//`). */
  def sessionConversion(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wCum = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapMs = unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w))
    val sessions = events(s, d)
      .withColumn("is_new", when(gapMs.isNull || gapMs > 1800000L, 1).otherwise(0))
      .withColumn("session_idx", sum(col("is_new")).over(wCum))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
    sessions
      .groupBy(least(col("n_events"), lit(SessionDepthCap)).as("depth"))
      .agg(count(lit(1)).as("n_sessions"),
        sum("converted").cast("long").as("n_converted"))
      .withColumn("conv_x10k",
        expr("CAST(n_converted * 10000 div n_sessions AS BIGINT)"))
  }

  val sessionConversionSql: String =
    s"""WITH g AS (SELECT user_id, event_id, event_type, ts,
       |  CASE WHEN lag(ts) OVER w IS NULL OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
       |    THEN 1 ELSE 0 END AS is_new
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |se AS (SELECT user_id, event_type,
       |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM g),
       |sess AS (SELECT user_id, session_idx, count(*) AS n_events,
       |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
       |  FROM se GROUP BY user_id, session_idx)
       |SELECT least(n_events, $SessionDepthCap) AS depth, count(*) AS n_sessions,
       |  CAST(sum(converted) AS BIGINT) AS n_converted,
       |  CAST(sum(converted) * 10000 // count(*) AS BIGINT) AS conv_x10k
       |FROM sess GROUP BY 1""".stripMargin.replace("\n", " ")

  /** Beyond-reference: AS-OF join — for every event, the user's most
    * recent STRICTLY-EARLIER purchase event. Spark has no asof operator;
    * the scale-correct formulation is a single range-frame window over
    * one (user_id) exchange — `last(purchase, ignoreNulls)` over
    * range (-∞, -1 µs] — never a per-row range probe or a time-key
    * explosion. (DuckDB's native ASOF JOIN is the oracle twin; strict
    * `>` matches the -1 µs range bound, and the corpus has no equal
    * (user, ts) pairs so both tiebreaks agree.) */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(Window.unboundedPreceding, -1)
    val purchase = when(col("event_type") === "purchase",
      struct(col("event_id"), col("value")))
    events(s, d)
      .withColumn("prev_purchase", last(purchase, ignoreNulls = true).over(w))
      .select(
        col("event_id"), col("user_id"),
        col("prev_purchase")("event_id").as("purchase_id"),
        round(col("prev_purchase")("value"), 2).as("purchase_value"))
  }

  val asofJoinSql: String =
    "WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') " +
      "SELECT e.event_id, e.user_id, p.event_id AS purchase_id, round(p.value, 2) AS purchase_value " +
      "FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts > p.ts"

  /** Beyond-reference: FORWARD as-of — for every event, the user's
    * EARLIEST strictly-later purchase and the wait until it (the
    * conversion-latency grain behind time-to-purchase funnels). Same
    * scale shape as the backward q32: ONE (user_id) exchange feeding a
    * range-frame window — `first(purchase, ignoreNulls)` over
    * [+1 µs, ∞) — never a per-row probe. Wait is integer micros
    * (FLOAT RULE: epoch arithmetic is exact in both engines). */
  def asofForward(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(1, Window.unboundedFollowing)
    val purchase = when(col("event_type") === "purchase",
      struct(unix_micros(col("ts")).as("p_us"), col("event_id")))
    events(s, d)
      .withColumn("next_purchase", first(purchase, ignoreNulls = true).over(w))
      .select(
        col("event_id"), col("user_id"),
        col("next_purchase")("event_id").as("purchase_id"),
        (col("next_purchase")("p_us") - unix_micros(col("ts"))).as("wait_us"))
  }

  val asofForwardSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
      |n AS (SELECT event_id, user_id, us,
      |  first_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
      |    OVER w AS purchase_id,
      |  first_value(CASE WHEN event_type = 'purchase' THEN us END IGNORE NULLS)
      |    OVER w AS p_us
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
      |    RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |SELECT event_id, user_id, purchase_id, p_us - us AS wait_us FROM n""".stripMargin.replace("\n", " ")

  /** Beyond-reference: CONVERSION-LATENCY quantiles — per event type,
    * the p25/p50/p75/p95 wait from an event to the user's next purchase
    * ("median time-to-purchase after a view", repurchase interval for
    * purchase rows) — the funnel deliverable [[asofForward]] feeds.
    * One (user_id) window computes the wait (q139's frame carrying only
    * the purchase time), then the q51 exact-bracket grouped-percentile
    * machinery over (event_type, wait): approx sketch brackets + ONE
    * bounded re-scan — never a per-group sort. Tail events (no later
    * purchase) are excluded — the latency of a conversion that never
    * happened is not a number, and at 100 TB the open-ended tail is
    * censored data for a survival model, not a quantile input. */
  def conversionLatency(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(1, Window.unboundedFollowing)
    val pUs = when(col("event_type") === "purchase", unix_micros(col("ts")))
    val waits = events(s, d)
      .withColumn("p_us", first(pUs, ignoreNulls = true).over(w))
      .filter(col("p_us").isNotNull)
      .select(col("event_type"),
        (col("p_us") - unix_micros(col("ts"))).as("wait_us"))
    graft.ops.Quantiles
      .exactGroupPercentiles(waits, "event_type", "wait_us", QuantilePoints)
      .select(col("event_type"), col("q"), round(col("qval"), 4).as("qval"))
  }

  // lazy: QuantilePoints is declared LATER in this object — a strict
  // val here reads null mid-init (the r10 init-order class of bug;
  // rule: constants final, compositions lazy)
  lazy val conversionLatencySql: String = {
    val pts = QuantilePoints.mkString("[", ", ", "]")
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
       |n AS (SELECT event_type, us,
       |  first_value(CASE WHEN event_type = 'purchase' THEN us END IGNORE NULLS)
       |    OVER (PARTITION BY user_id ORDER BY us
       |      RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS p_us
       |  FROM e)
       |SELECT event_type, CAST(unnest($pts) AS DOUBLE) AS q,
       |  round(unnest(quantile_cont(CAST(p_us - us AS DOUBLE), $pts)), 4) AS qval
       |FROM n WHERE p_us IS NOT NULL GROUP BY event_type""".stripMargin.replace("\n", " ")
  }

  /** The NATIVE-OPERATOR twin of [[asofForward]]: same
    * earliest-strictly-later semantics through graft.plans.AsOfJoin's
    * forward mode — the streaming merge needs NO candidate register in
    * this direction (the stop row is the match), so it is the cheapest
    * path of the whole as-of family. Same oracle as q139; AsOfJoinSpec
    * pins window ≡ native row-for-row. */
  def asofForwardNative(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("asof_user"),
        unix_micros(col("ts")).as("asof_us"), col("event_id").as("purchase_id"))
    graft.plans.AsOfJoin.forward(
      ev.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ev_us")),
      purchases, "user_id", "asof_user", "ev_us", "asof_us")
      .select(col("event_id"), col("user_id"), col("purchase_id"),
        (col("asof_us") - col("ev_us")).as("wait_us"))
  }

  val asofForwardNativeSql: String = asofForwardSql

  /** The NATIVE-OPERATOR twin of [[asofJoin]]: same backward as-of
    * semantics through graft.plans.AsOfJoin — a custom LogicalPlan +
    * SparkStrategy + streaming merge SparkPlan registered via
    * SparkSessionExtensions — instead of the last-over-range window
    * rewrite. Same oracle as q32; PlansSpec asserts row-for-row
    * equality between the two and that AsOfJoinExec is in the plan. */
  def asofJoinNative(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    // alias right side: fresh names (no output collision) and fresh
    // attribute ids (self-as-of) in one stroke
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("asof_user"), col("ts").as("asof_ts"),
        col("event_id").as("purchase_id"), col("value").as("asof_value"))
    graft.plans.AsOfJoin.backward(
      ev.select("event_id", "user_id", "ts"), purchases,
      "user_id", "asof_user", "ts", "asof_ts")
      .select(col("event_id"), col("user_id"), col("purchase_id"),
        round(col("asof_value"), 2).as("purchase_value"))
  }

  val asofJoinNativeSql: String = asofJoinSql

  /** Beyond-reference: INTERVAL ATTRIBUTION JOIN — every (view,
    * purchase) pair of the same user with the purchase inside
    * (view.ts, view.ts + 1 h]: the ad-attribution / exposure-outcome
    * join, and the ONLY member of the event-join family whose streaming
    * twin is Spark's NATIVE watermarked stream-stream join (as-of needs
    * fMGWS; this is the built-in operator's exact sweet spot —
    * [[graft.streaming.StreamingFraud.attributionStream]] runs the SAME
    * condition and the bound makes both sides' state provably
    * droppable). Batch shape: equi-join on user_id (ONE exchange per
    * side, both pre-filtered scans push event_type down) with the time
    * band as a residual predicate — never a time-bucket explosion;
    * pair-grain output is bounded by purchase fan-in per hour, not
    * |views|·|purchases|. Wait is exact integer millis (FLOAT RULE). */
  def intervalAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    views.join(purchases, Seq("user_id"))
      .filter(col("p_ts") > col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        (unix_millis(col("p_ts")) - unix_millis(col("v_ts"))).as("wait_ms"))
  }

  val intervalAttributionSql: String =
    "SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id, " +
      "epoch_ms(p.ts) - epoch_ms(v.ts) AS wait_ms " +
      "FROM events v JOIN events p ON v.user_id = p.user_id " +
      "AND v.event_type = 'view' AND p.event_type = 'purchase' " +
      "AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR"

  /** Beyond-reference: tumbling event-time window — the batch twin of a
    * streaming windowed aggregation (same `window()` expression runs
    * under readStream + watermark). One hash aggregate on the derived
    * window key. */
  def tumblingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  val tumblingWindowSql: String =
    "SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type, " +
      "count(*) AS n_events, round(sum(value), 2) AS total_value " +
      "FROM events GROUP BY 1, 2"

  /** q144 — HOPPING (sliding) window aggregate: 2-hour windows every
    * hour, so each event lands in exactly two overlapping windows —
    * the smoothed-rate view dashboards want where q33's tumbling
    * windows jump. Spark's `window(ts, "2 hours", "1 hour")` plans
    * this as a generate (one row per covering window) + ONE hash
    * aggregate — no self-join, no second exchange; at 100 TB cost is
    * window/slide × the tumbling cost, linear in events. The oracle
    * reconstructs the same two covering starts arithmetically
    * (trunc-to-hour and one hour earlier — epoch-aligned, exactly
    * Spark's alignment for these durations). */
  def hoppingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  val hoppingWindowSql: String =
    "WITH covers AS (SELECT unnest([time_bucket(INTERVAL 1 HOUR, ts), " +
      "time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR]) AS window_start, " +
      "event_type, value FROM events) " +
      "SELECT window_start, event_type, count(*) AS n_events, " +
      "round(sum(value), 2) AS total_value FROM covers GROUP BY 1, 2"

  /** Beyond-reference: the full ranking-function family — rank,
    * dense_rank, percent_rank, ntile, lead — over one (o_custkey)
    * window, so all five share a single exchange + sort. Deterministic
    * under ties via the (o_orderdate, o_orderkey) ordering. */
  def windowRanks(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders(s, d)
      .filter(col("o_custkey") % 10 === 0)
      .select(
        col("o_orderkey"), col("o_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        count(lit(1)).over(Window.partitionBy("o_custkey")).as("np"),
        ntile(4).over(w).as("quartile"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
      // percent_rank = (rnk−1)/(np−1) is an int ratio → rebuilt as
      // k/10⁶ half-up integer arithmetic (FLOAT RULE); the built-in's
      // round(…,6) lands on exact decimal ties whenever np−1 divides a
      // power of 10. greatest(,1) reproduces the single-row-partition
      // prnk = 0 definition.
      .select(
        col("o_orderkey"), col("o_custkey"), col("rnk"), col("drnk"),
        (expr("(CAST(rnk - 1 AS BIGINT) * 1000000 + greatest(np - 1, 1) div 2) div greatest(np - 1, 1)")
          .cast("double") / 1000000.0).as("prnk"),
        col("quartile"), col("next_order"))
  }

  val windowRanksSql: String =
    "WITH r AS (SELECT o_orderkey, o_custkey, " +
      "CAST(rank() OVER w AS INT) AS rnk, CAST(dense_rank() OVER w AS INT) AS drnk, " +
      "count(*) OVER (PARTITION BY o_custkey) AS np, CAST(ntile(4) OVER w AS INT) AS quartile, " +
      "lead(o_orderkey, 1) OVER w AS next_order " +
      "FROM orders WHERE o_custkey % 10 = 0 " +
      "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) " +
      "SELECT o_orderkey, o_custkey, rnk, drnk, " +
      "CAST((CAST(rnk - 1 AS BIGINT) * 1000000 + greatest(np - 1, 1) // 2) // greatest(np - 1, 1) AS DOUBLE) / 1000000.0 AS prnk, " +
      "quartile, next_order FROM r"

  /** Beyond-reference: ROLLUP over (lang, source) — hierarchical
    * subtotals in one pass (Expand + single hash aggregate; no
    * re-reads per grouping level). */
  def rollupStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .rollup("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("chars_sum"))
      // mean chars as k/10⁴ half-up integer arithmetic — round(avg(int))
      // is the q108 cross-engine tie shape (FLOAT RULE)
      .select(col("lang"), col("source"), col("n_docs"),
        (expr("(chars_sum * 10000 + n_docs div 2) div n_docs")
          .cast("double") / 10000.0).as("avg_chars"))

  val rollupStatsSql: String =
    "WITH c AS (SELECT lang, source, count(*) AS n_docs, " +
      "CAST(sum(n_chars) AS BIGINT) AS chars_sum " +
      "FROM documents GROUP BY ROLLUP (lang, source)) " +
      "SELECT lang, source, n_docs, " +
      "CAST((chars_sum * 10000 + n_docs // 2) // n_docs AS DOUBLE) / 10000.0 AS avg_chars FROM c"

  /** Beyond-reference: PIVOT — language counts per source as columns.
    * The pivot value list is EXPLICIT (en/de/es/fr/zh), so the schema
    * is static and Catalyst plans one aggregate — never the
    * collect-distinct-then-replan implicit form, which is a driver
    * round-trip at 100 TB. */
  def pivotLangCounts(s: SparkSession, d: String): DataFrame = {
    val langs = Seq("en", "de", "es", "fr", "zh")
    documents(s, d)
      .groupBy("source")
      .pivot("lang", langs)
      .count()
      .na.fill(0L, langs)
  }

  val pivotLangCountsSql: String = {
    val cols = Seq("en", "de", "es", "fr", "zh")
      .map(l => s"CAST(sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS $l")
      .mkString(", ")
    s"SELECT source, $cols FROM documents GROUP BY source"
  }

  /** q151: UNPIVOT/melt — q35's inverse, completing the reshape pair.
    * The wide per-source language-count table (explicit static value
    * list, like the pivot) melts back to (source, lang, n_docs) long
    * form with Spark's native `unpivot` (one Expand over the wide
    * frame — |value-cols|× the WIDE row count, which is
    * group-grain-small here and always ≤ the long form it produces;
    * never a corpus-scan multiplier). Zero cells survive the
    * round-trip (pivot's na.fill), so melt(pivot(x)) covers the full
    * source×lang grid — the spec pins the round-trip against the
    * direct groupBy count. */
  def unpivotLangCounts(s: SparkSession, d: String): DataFrame = {
    val langs = Seq("en", "de", "es", "fr", "zh")
    pivotLangCounts(s, d)
      .unpivot(Array(col("source")), langs.map(col).toArray, "lang", "n_docs")
  }

  val unpivotLangCountsSql: String =
    s"WITH p AS ($pivotLangCountsSql) " +
      "SELECT source, lang, n_docs FROM p " +
      "UNPIVOT INCLUDE NULLS (n_docs FOR lang IN (en, de, es, fr, zh))"

  /** Beyond-reference: JSON field extraction from the event props
    * payload — per-row get_json_object (codegen'd Jackson path eval,
    * no UDF), the standard semi-structured access pattern. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      // integer division on BOTH sides: Spark's double→int cast
      // truncates while DuckDB's rounds, so `/ 10` would diverge
      .withColumn("k_bucket", expr("CAST(k div 10 AS INT)"))

  val jsonExtractSql: String =
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k, " +
      "CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10 AS INT) AS k_bucket FROM events"

  /** Beyond-reference: set operations — customers with open-status
    * orders EXCEPT those with fulfilled orders, UNION customers with
    * no orders at all (an "at-risk" cohort). Exercises except/union
    * distinct semantics; each leg is a semi/anti join on the same
    * (o_custkey) shuffle key so AQE can reuse exchange layouts. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select("c_custkey")
    val o = orders(s, d)
    def withStatus(st: String) =
      c.join(o.filter(col("o_orderstatus") === st).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
    val never = c.except(c.join(o.select("o_custkey"),
      col("c_custkey") === col("o_custkey"), "left_semi"))
    withStatus("O").except(withStatus("F")).union(never).distinct()
  }

  val setOpsSql: String =
    "WITH open_c AS (SELECT DISTINCT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')), " +
      "full_c AS (SELECT DISTINCT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')), " +
      "never_c AS (SELECT c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) " +
      "SELECT DISTINCT c_custkey FROM ((SELECT c_custkey FROM open_c EXCEPT SELECT c_custkey FROM full_c) UNION SELECT c_custkey FROM never_c)"

  // --------------------------------------------- time-range moving average

  val MovingAvgWindowSec = 3600L

  /** Trailing 1-hour moving average per user over event time — a RANGE
    * frame (value-based, not row-count-based), the shape rolling feature
    * stores compute. One window over one hash-partitioning of events by
    * user_id; the frame is evaluated incrementally per partition, so
    * cost is O(rows), not O(rows × frame width). Ordering key is epoch
    * seconds (Spark range frames need a numeric sort key); same-second
    * peers enter the frame together in both engines. */
  def movingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
      .rangeBetween(-MovingAvgWindowSec, 0)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        unix_timestamp(col("ts")).as("ts_sec"))
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        round(avg("value").over(w), 4).as("avg_1h"),
        count(lit(1)).over(w).as("n_1h"))
  }

  // Integer math only: epoch_ns // 1000 // 1000000 reproduces Spark's
  // nanos→micros→seconds truncation exactly, with no double rounding
  // (epoch() returns a double whose ~190 ns resolution can round a ts
  // just below a whole second upward).
  val movingAvgSql: String =
    "SELECT event_id, user_id, (epoch_ns(ts) // 1000) // 1000000 AS ts_sec, " +
      s"round(avg(value) OVER (PARTITION BY user_id ORDER BY (epoch_ns(ts) // 1000) // 1000000 RANGE BETWEEN $MovingAvgWindowSec PRECEDING AND CURRENT ROW), 4) AS avg_1h, " +
      s"count(*) OVER (PARTITION BY user_id ORDER BY (epoch_ns(ts) // 1000) // 1000000 RANGE BETWEEN $MovingAvgWindowSec PRECEDING AND CURRENT ROW) AS n_1h " +
      "FROM events"

  // -------------------------------------------------- multi-quantile agg

  val QuantilePoints: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)

  /** Exact multi-quantile per group via the GROUPED two-pass bracket
    * plan ([[graft.ops.Quantiles.exactGroupPercentiles]]): a grouped
    * approx_percentile sketch brackets every (group, p) rank, then one
    * grouped bounded aggregate collects only the in-bracket slices.
    * Exact output (interpolation matches DuckDB's quantile_cont
    * bit-for-bit) with per-group state ∝ n/accuracy — unlike the
    * single-buffer `percentile` aggregate this replaces, which held
    * every value of a group in one buffer (l_returnflag has 3 values,
    * so ~⅓ of lineitem per buffer at scale — the q05 pathology,
    * grouped). */
  def groupQuantiles(s: SparkSession, d: String): DataFrame =
    graft.ops.Quantiles
      .exactGroupPercentiles(lineitem(s, d), "l_returnflag", "l_extendedprice",
        QuantilePoints)
      .select(col("l_returnflag"), col("q"), round(col("qval"), 4).as("qval"))

  val groupQuantilesSql: String = {
    val pts = QuantilePoints.mkString("[", ", ", "]")
    // parallel unnests of equal-length lists zip positionally in DuckDB;
    // the label cast matters — a bare [0.25, …] list is DECIMAL(3,2) and
    // stringifies as '0.50' where Spark's double gives '0.5'
    s"SELECT l_returnflag, CAST(unnest($pts) AS DOUBLE) AS q, " +
      s"round(unnest(quantile_cont(l_extendedprice, $pts)), 4) AS qval " +
      "FROM lineitem GROUP BY l_returnflag"
  }

  // ------------------------------------------------------------ histogram

  val HistBinWidth = 25000.0

  /** Fixed-width histogram of order totals: bin assignment is a pure
    * projection (floor division — no data-dependent bounds, so no extra
    * pass to find min/max), then one hash aggregate with map-side
    * partials. The classic first-look profiling op; at 100 TB it's a
    * single shuffle of (bin → partial counts), ~dozens of groups. */
  def histogram(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(floor(col("o_totalprice") / HistBinWidth).cast("long").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"),
        round(avg("o_totalprice"), 4).as("mean"))

  val histogramSql: String =
    s"SELECT CAST(floor(o_totalprice / $HistBinWidth) AS BIGINT) AS bin, count(*) AS n, " +
      "round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi, " +
      "round(avg(o_totalprice), 4) AS mean " +
      "FROM orders GROUP BY 1"

  // ------------------------------------------------------ interval/range join

  /** 25 deterministic audit windows derived from the nation table: window
    * k opens at 2024-01-01T00:00Z + k·28h and lasts 10h — they tile the
    * events table's January span with gaps and overlaps, which is what
    * makes the range predicate non-trivial. */
  val RangeT0Sec    = 1704067200L // 2024-01-01 00:00:00 UTC
  val RangeStepSec  = 28L * 3600
  val RangeWidthSec = 10L * 3600
  val RangeBucketSec = 3600L

  /** Interval (range) join: events × audit windows on
    * `start ≤ ts < end`, aggregated per window. Spark has no native
    * range-join operator, and the naive formulation is a
    * BroadcastNestedLoopJoin that compares every event against every
    * window — O(n·m). This is the BANDED rewrite: both sides map to
    * hour buckets (each window explodes to the ~10 buckets it covers),
    * the join becomes an EQUI-join on the bucket plus a residual range
    * filter, and the pair space shrinks from (events × windows) to
    * (events × windows-overlapping-their-hour).
    *
    * Scale: the bucket width trades replication (windows appear in
    * width/bucket rows — here 10) against candidate precision; at
    * 100 TB pick bucket ≈ median window width, broadcast the exploded
    * window table when small, and the event side streams map-side with
    * NO shuffle. Completely generic: as-of joins (q32/q47) handle the
    * "latest before" flavor, this handles full interval containment. */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val windows = nation(s, d).select(
      col("n_nationkey").as("window_id"),
      (lit(RangeT0Sec) + col("n_nationkey") * RangeStepSec).as("start_sec"))
      .withColumn("end_sec", col("start_sec") + RangeWidthSec)
    val exploded = windows.select(col("window_id"), col("start_sec"), col("end_sec"),
      explode(sequence(
        (col("start_sec") / RangeBucketSec).cast("long"),
        ((col("end_sec") - 1) / RangeBucketSec).cast("long"))).as("hb"))
    val ev = events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        unix_timestamp(col("ts")).as("es"))
      .withColumn("hb", (col("es") / RangeBucketSec).cast("long"))
    ev.join(broadcast(exploded), "hb")
      .filter(col("es") >= col("start_sec") && col("es") < col("end_sec"))
      .groupBy("window_id")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        round(avg("value"), 4).as("avg_value"))
  }

  /** The oracle states the range join the way a user would write it —
    * a plain inequality join — and DuckDB executes its own IEJoin. */
  val rangeJoinSql: String =
    s"WITH w AS (SELECT n_nationkey AS window_id, $RangeT0Sec + n_nationkey * $RangeStepSec AS start_sec FROM nation), " +
      "e AS (SELECT event_id, user_id, value, (epoch_ns(ts) // 1000) // 1000000 AS es FROM events) " +
      "SELECT w.window_id, count(*) AS n_events, count(DISTINCT e.user_id) AS n_users, " +
      "round(avg(e.value), 4) AS avg_value " +
      s"FROM e JOIN w ON e.es >= w.start_sec AND e.es < w.start_sec + $RangeWidthSec " +
      "GROUP BY w.window_id"

  /** q68: CUBE over (returnflag, linestatus) — all four grouping sets
    * (flag×status, flag, status, grand total) in one pass. Spark plans
    * this as a single Expand + hash aggregate: each input row fans out
    * once per grouping set and partial aggregation still happens
    * map-side, so the shuffle carries pre-reduced cells (≤ |groups|·4
    * rows per task), not the fact table — the right shape at 100 TB.
    * Quantities are integral doubles, so the sums are exact across
    * engines. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum("l_quantity").as("sum_qty"),
        round(avg("l_discount"), 4).as("avg_disc"))

  val cubeAggSql: String =
    "SELECT l_returnflag, l_linestatus, count(*) AS n_rows, " +
      "sum(l_quantity) AS sum_qty, round(avg(l_discount), 4) AS avg_disc " +
      "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"

  /** q147: arbitrary GROUPING SETS — {(lang,source), (lang), (source)},
    * a set list neither ROLLUP (q34) nor CUBE (q68) can express (no
    * grand-total set; both single-column marginals). Completes the
    * multi-grain aggregation trio with the general form, plus the
    * `grouping_id` bitmask consumers use to tell the grains apart
    * (bit per column, first column = high bit — the Spark and DuckDB
    * convention agree).
    *
    * Scale shape — pre-aggregate, THEN expand: the naive plan expands
    * every fact row once per set (3× scan-side CPU at 100 TB) before
    * the partial aggregate. Here the fact scan first collapses to the
    * finest grain the sets need (lang × source — the distributive
    * partial every other set re-aggregates), and `groupingSets` runs
    * over THAT base-grain frame, so the 3× expand touches ~|lang|·
    * |source| rows instead of the corpus, in the same single-pass plan
    * (scan → agg → expand → agg; no recompute, no cache). This is the
    * classic distributive-measure cube optimization (count/sum roll up
    * from partials; a count-distinct would NOT and must take the
    * expand-on-scan form). */
  def groupingSetsAgg(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("pn"), sum(col("n_chars").cast("long")).as("pc"))
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")), Seq(col("source"))),
        col("lang"), col("source"))
      .agg(grouping_id().as("gid"),
        sum("pn").as("n_docs"), sum("pc").as("chars_sum"))
      .select(col("lang"), col("source"), col("gid").cast("long").as("gid"),
        col("n_docs"), col("chars_sum"))

  val groupingSetsAggSql: String =
    "SELECT lang, source, CAST(GROUPING(lang, source) AS BIGINT) AS gid, " +
      "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars_sum " +
      "FROM documents GROUP BY GROUPING SETS ((lang, source), (lang), (source))"

  /** q69: the salted-join component ([[Skew.saltedJoin]]) as an
    * oracle-checked query: lineitem ⋈ supplier with the supplier side
    * exploded 16× and the fact side salted on l_orderkey, then revenue
    * per supplier nation. The oracle is the PLAIN join — salting must
    * be invisible in the result. Locally supplier would broadcast;
    * the registered shape is the one you reach for at 100 TB when the
    * dim outgrows broadcast AND a handful of hot keys would otherwise
    * pin the shuffle join's reducers (AQE's skew split handles sorted
    * shuffle joins, but not a hot key inside one reducer of a
    * hash-partitioned agg-after-join pipeline). Revenue rounds an
    * integral-cents computation, so cross-engine sums stay exact. */
  def saltedJoinRevenue(s: SparkSession, d: String): DataFrame = {
    val fact = lineitem(s, d).select(
      col("l_suppkey"),
      // exact cents: price has 2 decimals, so price*100 is integral
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val dim = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    Skew.saltedJoin(fact, dim,
        col("l_suppkey"), col("s_suppkey"), col("l_suppkey") + col("cents"))
      .groupBy("s_nationkey")
      .agg(
        count(lit(1)).as("n_items"),
        sum("cents").as("revenue_cents"))
  }

  val saltedJoinRevenueSql: String =
    "SELECT s_nationkey, count(*) AS n_items, " +
      "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents " +
      "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
      "GROUP BY s_nationkey"

  /** q70: ordered event FUNNEL — per user, how far through
    * view → click → purchase they progressed, each step strictly AFTER
    * the previous one (the sequential-pattern query every product
    * analytics stack ships). The three conditional stage-minima are
    * CHAINED WINDOW aggregates over one `user_id` partitioning
    * (click-min is masked by the view-min window column, purchase-min
    * by the click-min — each window value is constant per partition,
    * so the mask is well-defined per row), and the final per-user
    * reduction groups on the SAME key, which already satisfies the
    * aggregate's required distribution — the whole funnel costs ONE
    * shuffle of the events table. The first cut computed each stage as
    * its own aggregate + join back; three event-sized exchanges
    * (verified in the plan) against this plan's one. */
  def eventFunnel(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"),
          col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
          col("ts"))).over(w))
      .groupBy("user_id")
      .agg(max(
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0)).as("funnel_stage"))
  }

  val eventFunnelSql: String =
    """WITH t1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view FROM events GROUP BY user_id),
      |t2 AS (SELECT e.user_id, any_value(t1.t_view) AS t_view,
      |  min(CASE WHEN e.event_type = 'click' AND e.ts > t1.t_view THEN e.ts END) AS t_click
      |  FROM events e JOIN t1 USING (user_id) GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, any_value(t2.t_view) AS t_view, any_value(t2.t_click) AS t_click,
      |  min(CASE WHEN e.event_type = 'purchase' AND e.ts > t2.t_click THEN e.ts END) AS t_purchase
      |  FROM events e JOIN t2 USING (user_id) GROUP BY e.user_id)
      |SELECT user_id, CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
      |  WHEN t_click IS NOT NULL THEN 2
      |  WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS INT) AS funnel_stage FROM t3""".stripMargin.replace("\n", " ")

  // ------------------------------------------- time-decayed aggregation

  val DecayTauDays = 30.0

  /** q92 — exponentially time-decayed activity score per user: recency
    * weighting as one weighted sum, `Σ value·e^{−Δdays/τ}`, anchored at
    * the corpus max timestamp. The feature-store staple (recency-
    * weighted engagement) — and the cheap alternative to "recompute a
    * window over the last N days nightly": the decay anchor moves, but
    * the score is a plain aggregate of per-row terms, so it
    * recomputes in one scan with map-side partials — no window, no
    * per-user state, no sessionization.
    *
    * Scale: the anchor is a one-row broadcast (same scalar-threshold
    * pattern as q05/q07); everything else is a single hash aggregate on
    * user_id. Decay math is on integer micros (identical truncation in
    * both engines) and the expression tree mirrors the oracle's
    * term-for-term so IEEE rounding matches; round(…,4) on top. */
  def decayedActivity(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val anchor = ev.agg(max(unix_micros(col("ts"))).as("anchor_us"))
    ev.crossJoin(broadcast(anchor))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value") * exp(
          -((col("anchor_us") - unix_micros(col("ts"))).cast("double")
            / 86400000000.0) / DecayTauDays)), 4).as("activity"))
  }

  val decayedActivitySql: String =
    s"""WITH a AS (SELECT max(epoch_us(ts)) AS anchor_us FROM events)
       |SELECT user_id, count(*) AS n_events,
       |  round(sum(value * exp(-(CAST(a.anchor_us - epoch_us(ts) AS DOUBLE)
       |    / 86400000000.0) / $DecayTauDays)), 4) AS activity
       |FROM events, a GROUP BY user_id""".stripMargin.replace("\n", " ")

  // ------------------------------------------- robust (median/MAD) outliers

  /** q93 — robust z-score outliers per event_type: |x − median| >
    * 3·1.4826·MAD, the median/MAD twin of q07's mean+2σ. Unlike the
    * moment-based rule, one colossal outlier cannot drag the threshold
    * up and mask the others (the breakdown point is 50%, not 0) — which
    * is why data-quality monitors prefer it at corpus scale.
    *
    * Both medians come from the GROUPED two-pass bracket
    * ([[Quantiles.exactGroupPercentiles]], the q51 plan): bounded
    * per-group state, bit-identical linear interpolation to the
    * oracle's quantile_cont. The per-group medians/MADs are COLLECTED
    * (bounded by |event_type| — the q05/q07 scalar-threshold pattern)
    * and folded back as CASE literals rather than joined: joining
    * keeps the first bracket's whole lineage under the second
    * bracket's passes, and the plan audit measured NINE fact scans
    * for what literals do in five (med pass1+2, mad pass1+2 over the
    * literal-derived deviations, one output pass — the bracket's two
    * passes per statistic are irreducible). The filter literal 4.4478
    * (= 3·1.4826) is spelled identically in both engines — computing
    * it as 3*1.4826 here and 4.4478 there would differ in the last
    * ulp and flip boundary rows. */
  def robustOutliers(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_id"), col("event_type"), col("value"))
    def caseFor(m: Map[String, Double]): Column =
      m.toSeq.sortBy(_._1).foldLeft(lit(Double.NaN)) { case (acc, (g, x)) =>
        when(col("event_type") === g, lit(x)).otherwise(acc)
      }
    val med = Quantiles.exactGroupPercentiles(ev, "event_type", "value", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val dev = ev
      .withColumn("med", caseFor(med))
      .withColumn("delta", col("value") - col("med"))
      .withColumn("dev", abs(col("delta")))
    val mad = Quantiles.exactGroupPercentiles(dev, "event_type", "dev", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    dev.withColumn("mad", caseFor(mad))
      .filter(col("mad") > 0.0 && col("dev") > lit(4.4478) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("delta") / (lit(1.4826) * col("mad")), 4).as("rz"))
  }

  // ------------------------------------------------- equi-depth binning

  val BinCount = 10

  /** q98 — EQUI-DEPTH feature binning (quantile discretization): the
    * GBDT/feature-store preprocessing step that replaces a skewed
    * numeric with its decile index. Cut points are the exact interior
    * percentiles from the bounded two-pass bracket
    * ([[Quantiles.exactPercentiles]] — 2 jobs total), folded back as
    * LITERALS so the binning itself is a pure map over the scan:
    * Catalyst folds the 9 comparisons into codegen, nothing shuffles.
    * bin = #{cuts < x} (strict >, so a value equal to a cut belongs to
    * the bin below — the same convention in the oracle, and since both
    * engines' interpolated percentiles are bit-identical, boundary
    * rows cannot flip). NOT ntile: rank-based deciles break ties by
    * row position (engine-dependent); value-based cuts are
    * deterministic and broadcastable. */
  def equiDepthBins(s: SparkSession, d: String): DataFrame = {
    val ps = (1 until BinCount).map(_.toDouble / BinCount)
    val cuts = Quantiles.exactPercentiles(lineitem(s, d), "l_extendedprice", ps)
    val bin = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("l_extendedprice") > lit(c), 1).otherwise(0)
    }
    lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
      bin.cast("int").as("bin"))
  }

  val equiDepthBinsSql: String = {
    val pts = (1 until BinCount).map(_.toDouble / BinCount).mkString("[", ", ", "]")
    s"""WITH q AS (SELECT quantile_cont(l_extendedprice, $pts) AS qs FROM lineitem)
       |SELECT l_orderkey, l_linenumber, l_extendedprice,
       |  CAST(len(list_filter(q.qs, c -> l_extendedprice > c)) AS INT) AS bin
       |FROM lineitem, q""".stripMargin.replace("\n", " ")
  }

  // ---------------------------------------------- co-moment aggregates

  /** q99 — grouped CO-MOMENT statistics: Pearson correlation and
    * population covariance between a metric and an engineered feature
    * (hour-of-day), per event type — the "is this feature worth
    * anything" triage every feature pipeline runs before training.
    * Both engines implement corr/covar as single-pass streaming
    * co-moments (no materialized centered vectors), so the plan is ONE
    * hash aggregate with map-side partials — the same shuffle as a
    * plain count. round(…,4) absorbs the partial-merge order ulps. */
  def comomentStats(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), col("value"),
        hour(col("ts")).cast("double").as("hr"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg("value"), 4).as("mean_value"),
        round(corr("value", "hr"), 4).as("corr_value_hour"),
        round(covar_pop("value", "hr"), 4).as("covar_value_hour"))

  val comomentStatsSql: String =
    """SELECT event_type, count(*) AS n,
      |  round(avg(value), 4) AS mean_value,
      |  round(corr(value, CAST(hour(ts) AS DOUBLE)), 4) AS corr_value_hour,
      |  round(covar_pop(value, CAST(hour(ts) AS DOUBLE)), 4) AS covar_value_hour
      |FROM events GROUP BY event_type""".stripMargin.replace("\n", " ")

  val robustOutliersSql: String =
    """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type),
      |dev AS (SELECT e.event_id, e.event_type, e.value, e.value - med.med AS delta,
      |  abs(e.value - med.med) AS dev FROM events e JOIN med USING (event_type)),
      |mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY event_type)
      |SELECT d.event_id, d.event_type, d.value,
      |  round(d.delta / (1.4826 * mad.mad), 4) AS rz
      |FROM dev d JOIN mad USING (event_type)
      |WHERE mad.mad > 0 AND d.dev > 4.4478 * mad.mad""".stripMargin.replace("\n", " ")

  // ------------------------------------------------- cohort retention

  /** q131 — COHORT RETENTION over the event stream, the classic
    * activation-analytics shape: users are cohorted by their FIRST
    * `signup` event's day, and each (cohort_day, day_offset) cell
    * counts the distinct cohort members with ANY activity that many
    * days later (pre-signup activity excluded). Users who never sign
    * up are outside every cohort. The reference has nothing like it;
    * a training-data platform runs the same query over ingest/
    * labeling activity.
    *
    * Plan shape: ONE user-keyed aggregate pins each user's cohort day
    * (map-side min partials over the filtered anchor events), joined
    * back onto the events — both sides partitioned by user_id, so the
    * join reuses the aggregate's exchange — then one distinct + count
    * keyed on the bounded (cohort, offset, user) triple. No windows;
    * the cohort table is |users|-sized. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), expr("CAST(day(ts) AS BIGINT)").as("day"),
        col("event_type"))
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(cohorts, "user_id")
      .filter(col("day") >= col("cohort_day"))
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  val cohortRetentionSql: String =
    """WITH ev AS (SELECT user_id, CAST(date_part('day', ts) AS BIGINT) AS day, event_type FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM ev WHERE event_type = 'signup' GROUP BY user_id),
      |a AS (SELECT DISTINCT c.cohort_day, ev.day - c.cohort_day AS day_offset, ev.user_id
      |  FROM ev JOIN c USING (user_id) WHERE ev.day >= c.cohort_day)
      |SELECT cohort_day, day_offset, count(*) AS n_users
      |FROM a GROUP BY 1, 2""".stripMargin.replace("\n", " ")

  // ------------------------------------------------- sequence analytics

  /** q158 — STRICT ORDERED FUNNEL (signup → view → click → purchase):
    * per user, step k counts only if it happens STRICTLY AFTER the
    * user's step-(k−1) completion time — the product-analytics funnel
    * where first occurrences alone overcount (a click before the
    * qualifying view must not complete step 3).
    *
    * The sequential dependency t_k = min{ts > t_(k−1)} looks like a
    * per-user driver loop, but cascades through STACKED RUNNING-MIN
    * WINDOWS over one (user_id, ts, event_id) sort: a step-k event
    * QUALIFIES iff the running min of qualified step-(k−1) times over
    * STRICTLY EARLIER rows is < its ts, and its own qualified time
    * feeds the next cascade. All three cascade windows plus the final
    * per-user aggregate ride ONE user_id exchange (the q153
    * gaps-and-islands discipline); output is 4 rows of exact integer
    * user counts. At 100 TB: one shuffle of the filtered funnel event
    * types, no joins, no per-user state beyond the sort. */
  def funnelSteps(s: SparkSession, d: String): DataFrame = {
    // strictly-earlier frame: ties in ts break by event_id, and the
    // < ts test keeps simultaneous events from chaining
    val wPrev = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val steps = ev
      .withColumn("t1", when(col("event_type") === "signup", col("ts")))
      .withColumn("q1", min("t1").over(wPrev))
      .withColumn("t2",
        when(col("event_type") === "view" && col("q1") < col("ts"), col("ts")))
      .withColumn("q2", min("t2").over(wPrev))
      .withColumn("t3",
        when(col("event_type") === "click" && col("q2") < col("ts"), col("ts")))
      .withColumn("q3", min("t3").over(wPrev))
      .withColumn("t4",
        when(col("event_type") === "purchase" && col("q3") < col("ts"), col("ts")))
      .groupBy("user_id")
      .agg(min("t1").as("s1"), min("t2").as("s2"),
        min("t3").as("s3"), min("t4").as("s4"))
    steps.agg(
      sum(when(col("s1").isNotNull, 1L).otherwise(0L)).as("u1"),
      sum(when(col("s2").isNotNull, 1L).otherwise(0L)).as("u2"),
      sum(when(col("s3").isNotNull, 1L).otherwise(0L)).as("u3"),
      sum(when(col("s4").isNotNull, 1L).otherwise(0L)).as("u4"))
      .select(explode(expr(
        "array(struct(1L AS step, 'signup' AS step_name, u1 AS n_users), " +
          "struct(2L AS step, 'view' AS step_name, u2 AS n_users), " +
          "struct(3L AS step, 'click' AS step_name, u3 AS n_users), " +
          "struct(4L AS step, 'purchase' AS step_name, u4 AS n_users))")).as("r"))
      .select(col("r.step"), col("r.step_name"), col("r.n_users"))
  }

  val funnelStepsSql: String =
    """WITH s AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN event_type = 'signup' THEN ts END AS t1
      |  FROM events),
      |c1 AS (SELECT *, min(t1) OVER w AS q1 FROM s
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |s2 AS (SELECT *, CASE WHEN event_type = 'view' AND q1 < ts THEN ts END AS t2 FROM c1),
      |c2 AS (SELECT *, min(t2) OVER w AS q2 FROM s2
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |s3 AS (SELECT *, CASE WHEN event_type = 'click' AND q2 < ts THEN ts END AS t3 FROM c2),
      |c3 AS (SELECT *, min(t3) OVER w AS q3 FROM s3
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |s4 AS (SELECT *, CASE WHEN event_type = 'purchase' AND q3 < ts THEN ts END AS t4 FROM c3),
      |u AS (SELECT user_id, min(t1) AS s1, min(t2) AS s2, min(t3) AS s3, min(t4) AS s4
      |  FROM s4 GROUP BY user_id),
      |agg AS (SELECT
      |  CAST(sum(CASE WHEN s1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS u1,
      |  CAST(sum(CASE WHEN s2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS u2,
      |  CAST(sum(CASE WHEN s3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS u3,
      |  CAST(sum(CASE WHEN s4 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS u4 FROM u)
      |SELECT x.step, x.step_name, x.n_users FROM agg, LATERAL (VALUES
      |  (CAST(1 AS BIGINT), 'signup', u1), (CAST(2 AS BIGINT), 'view', u2),
      |  (CAST(3 AS BIGINT), 'click', u3), (CAST(4 AS BIGINT), 'purchase', u4))
      |  AS x(step, step_name, n_users)""".stripMargin.replace("\n", " ")

  /** q159 — TIME-RANGE ROLLING AGGREGATE: per event, the same user's
    * trailing-7-day activity (event count + value sum) — the
    * feature-engineering window every fraud/abuse model consumes
    * ("activity in the last N days as of each event"). RANGE frame on
    * event-time seconds, not ROWS: the lookback is defined by the
    * CLOCK, so burst days weigh more — exactly what a rows-frame gets
    * wrong. ONE (user_id) exchange + one sort; the range frame is a
    * sliding two-pointer over each partition, O(n) per user, state =
    * the in-window slice. At 100 TB this is the q153/q158 discipline:
    * everything rides the one keyed sort, no self-join time-bucket
    * explosion. The frame orders by exact epoch MICROS in both
    * engines (ts carries µs precision — a seconds cast would put
    * same-second events in different frames than the interval
    * arithmetic). Sum rounds to 2dp (FLOAT RULE); count is exact. */
  def rollingUserActivity(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-7L * 86400L * 1000000L, 0L)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("n_7d", count(lit(1)).over(w))
      .withColumn("value_7d", round(sum("value").over(w), 2))
      .select("event_id", "user_id", "n_7d", "value_7d")
  }

  val rollingUserActivitySql: String =
    """SELECT event_id, user_id,
      |  CAST(count(*) OVER w AS BIGINT) AS n_7d,
      |  round(sum(value) OVER w, 2) AS value_7d
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)"""
      .stripMargin.replace("\n", " ")

  /** q162 — EXACT MULTI-QUANTILE BANDS per group: p25/p50/p75 of
    * `value` per event_type in ONE aggregate — `percentile(col,
    * array(…))` sorts each group's values once and reads all three
    * order statistics from it (vs 3× the work for three separate
    * quantile aggs; DuckDB's `quantile_cont(v, [..])` is the same
    * contract, linear interpolation included). Completes the quantile
    * family: q05 exact scalar, q125 mergeable sample sketch, this the
    * exact grouped form. Scale note: exact grouped percentiles buffer
    * each group's values (ObjectHashAggregate) — right when groups are
    * few and bounded (5 event types); the 100 TB many-group path is
    * q125's bounded sample sketch, documented there.
    *
    * FLOAT RULE, the sharp edge this op hit in testing: interpolated
    * quantiles of 2-dp values land on exact .xx5 ties (f ∈ {.25,.75}
    * over cent-grid neighbors), where Spark's HALF_UP `round`, JVM
    * `rint` and DuckDB disagree. So the percentile runs over INTEGER
    * CENTS and emits the interpolated cent value UN-rounded: with
    * integer endpoints and dyadic f, a + f·(b−a) is EXACT in IEEE
    * doubles (no rounding step exists on either engine to disagree
    * about) — quarter-cent granularity, bit-identical everywhere. */
  def quantileBands(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .groupBy("event_type")
      .agg(expr("percentile(vc, array(0.25D, 0.5D, 0.75D))").as("q"))
      .select(col("event_type"),
        col("q")(0).as("p25_cents"),
        col("q")(1).as("p50_cents"),
        col("q")(2).as("p75_cents"))

  val quantileBandsSql: String =
    """SELECT event_type,
      |  quantile_cont(vc, 0.25) AS p25_cents,
      |  quantile_cont(vc, 0.50) AS p50_cents,
      |  quantile_cont(vc, 0.75) AS p75_cents
      |FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
      |  FROM events) GROUP BY 1""".stripMargin.replace("\n", " ")

  /** q163 — DECORRELATED "above own group mean" filter: events whose
    * value exceeds their user's mean — the correlated-subquery shape
    * (`WHERE value > (SELECT avg … WHERE user_id = e.user_id)`) every
    * engine must decorrelate into aggregate + join-back. Spark's form
    * IS the decorrelation: one user-keyed aggregate, joined back on
    * the SAME key so the join reuses the aggregate's exchange (the
    * q131 discipline — fact side shuffles once, total).
    *
    * FLOAT RULE, load-bearing here: `value` is 2-dp, so the comparison
    * runs in ×100 integer fixed point (value_c · n > sum_c) — a float
    * mean's last-bit association differences could flip boundary rows
    * between engines, and a row-set query has no rounding to hide
    * behind. The emitted mean is integer fixed point too. */
  def aboveUserMean(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val stats = ev.groupBy("user_id")
      .agg(sum("vc").as("sum_c"), count(lit(1)).as("n"))
    ev.join(stats, "user_id")
      .filter(col("vc") * col("n") > col("sum_c"))
      .select(col("event_id"), col("user_id"), col("value"),
        expr("CAST(sum_c div n AS BIGINT)").as("user_mean_x100"))
  }

  val aboveUserMeanSql: String =
    """WITH ev AS (SELECT event_id, user_id, value,
      |  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
      |st AS (SELECT user_id, CAST(sum(vc) AS BIGINT) AS sum_c, count(*) AS n
      |  FROM ev GROUP BY 1)
      |SELECT event_id, ev.user_id, value, CAST(sum_c // n AS BIGINT) AS user_mean_x100
      |FROM ev JOIN st ON ev.user_id = st.user_id
      |WHERE vc * n > sum_c""".stripMargin.replace("\n", " ")

  /** q160 — EVENT-TRANSITION MATRIX (first-order Markov estimate):
    * counts of consecutive (from → to) event-type pairs inside each
    * user's (ts, event_id)-ordered stream, with the per-source
    * transition share as scaled integer ×10⁴ (FLOAT RULE: `div`/`//`
    * fixed-point, no float division to drift). The sequence-mining
    * staple behind "what do users do after an error?". Shape: lag
    * over ONE (user_id) exchange, then a |types|²-bounded aggregate;
    * the share window runs on that 25-row frame — noise. */
  def eventTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wFrom = Window.partitionBy("from_type")
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag("event_type", 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("share_x10k",
        expr("CAST(n_trans * 10000 div sum(n_trans) OVER " +
          "(PARTITION BY from_type) AS BIGINT)"))
      .select(col("from_type"), col("to_type"), col("n_trans"), col("share_x10k"))
  }

  val eventTransitionsSql: String =
    """WITH p AS (SELECT user_id, event_type AS to_type,
      |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      |  FROM events),
      |t AS (SELECT from_type, to_type, count(*) AS n_trans
      |  FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n_trans,
      |  CAST(n_trans * 10000 // sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS share_x10k
      |FROM t""".stripMargin.replace("\n", " ")

  /** q246 — FREQUENT LENGTH-3 SEQUENCES: q160's transition matrix
    * extended one step — counts of CONTIGUOUS (e1 → e2 → e3)
    * event-type triples inside each user's (ts, event_id)-ordered
    * stream, with occurrence count AND distinct-user support (the
    * sequential-pattern-mining measure: a triple one bot loops on
    * has high n_occ but support 1). The contiguous-window form is
    * the exact member of the PrefixSpan family that needs no
    * candidate growth: at a fixed event-type vocabulary the output
    * is ≤ |types|³ rows BY CONSTRUCTION.
    *
    * Scale shape: two leads over ONE (user_id) exchange (both windows
    * share the sort), then a types³-bounded hash aggregate with
    * map-side partials; count_distinct(user_id) re-shuffles only the
    * (triple, user) grain, itself bounded by users·types³. */
  def seq3Patterns(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("user_id")).as("n_users"))
  }

  val seq3PatternsSql: String =
    """WITH p AS (SELECT user_id, event_type AS e1,
      |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
      |  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      |  FROM events)
      |SELECT e1, e2, e3, count(*) AS n_occ,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM p WHERE e3 IS NOT NULL GROUP BY 1, 2, 3"""
      .stripMargin.replace("\n", " ")

  /** q270 — GROWTH ACCOUNTING: the per-day decomposition every DAU
    * chart hides — new (first-ever activity), retained (also active
    * the previous day), resurrected (returning after a gap), and
    * churned-from-yesterday (active d−1, silent d) — with the
    * identity dau(d) = new + retained + resurrected and
    * dau(d−1) = retained + churned(d) holding EXACTLY per row (the
    * spec pins both). q237 counts actives; this says WHY the count
    * moved, which is the number a growth review actually reads.
    *
    * Exact: (user, day) distinct activity, classification by ONE lag
    * (gap = 1 retained, > 1 resurrected, null new) and churn by the
    * matching lead on the same sort; day rollup is grid-bounded.
    *
    * Scale shape: one (user, day) distinct aggregate, one (user)
    * window carrying lag AND lead on one sort, one day-grain
    * aggregate. Output is |days| rows. */
  def growthAccounting(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    val act = events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
      .withColumn("prev_gap",
        datediff(col("day"), lag("day", 1).over(w)).cast("long"))
      .withColumn("next_gap",
        datediff(lead("day", 1).over(w), col("day")).cast("long"))
      .localCheckpoint(true) // (user, day) grain; feeds both rollups
    val byDay = act.groupBy("day").agg(
      count(lit(1)).as("dau"),
      sum(when(col("prev_gap").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("prev_gap") === 1L, 1L).otherwise(0L)).as("n_retained"),
      sum(when(col("prev_gap") > 1L, 1L).otherwise(0L)).as("n_resurrected"))
    // churned INTO day d+1: active at d with no activity at d+1
    val churn = act
      .filter(col("next_gap").isNull || col("next_gap") > 1L)
      .select(date_add(col("day"), 1).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_churned"))
    byDay.join(churn, Seq("day"), "left")
      .select(col("day"), col("dau"), col("n_new"), col("n_retained"),
        col("n_resurrected"), coalesce(col("n_churned"), lit(0L))
          .as("n_churned"))
  }

  val growthAccountingSql: String =
    """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |g AS (SELECT user_id, day,
      |  CAST(datediff('day', lag(day) OVER w, day) AS BIGINT) AS prev_gap,
      |  CAST(datediff('day', day, lead(day) OVER w) AS BIGINT) AS next_gap
      |  FROM act WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |byday AS (SELECT day, count(*) AS dau,
      |  CAST(sum(CASE WHEN prev_gap IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(sum(CASE WHEN prev_gap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |  CAST(sum(CASE WHEN prev_gap > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      |  FROM g GROUP BY 1),
      |ch AS (SELECT day + 1 AS day, count(*) AS n_churned
      |  FROM g WHERE next_gap IS NULL OR next_gap > 1 GROUP BY 1)
      |SELECT byday.day, byday.dau, byday.n_new, byday.n_retained,
      |  byday.n_resurrected,
      |  CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
      |FROM byday LEFT JOIN ch ON ch.day = byday.day"""
      .stripMargin.replace("\n", " ")

  /** q259 — RFM SEGMENTATION: per user, recency (days since last
    * event vs the corpus max day), frequency (event count) and
    * monetary mass (Σ value in exact cents), each cut into quintiles
    * (ntile(5) with deterministic user_id tiebreaks — identical
    * bucket arithmetic both engines), composed into the classic
    * 3-digit RFM segment code (5 = best on every axis). The
    * marketing-analytics staple — and for a data pipeline, the same
    * op segments crawl SOURCES by recency/volume/yield before budget
    * allocation (q211).
    *
    * Scale shape: ONE (user) aggregate over the events scan, then
    * three quintile assignments on the USER-grain table; the
    * max-day/count scalar pair broadcasts.
    *
    * r20 (guide §2.4, r19 verdict item 4): the three quintiles were
    * `ntile(5)` over `Window.orderBy(...)` with NO partition key —
    * three single-partition total sorts of the user-grain table (the
    * "WindowExec: No Partition Defined" trap; |users| grows with the
    * corpus, so at 100 TB one task sorts everything, three times).
    * Each is now the exact same integers computed scale-safe: the
    * 1-based global rank under the identical total order via
    * [[graft.ops.Distributed.globalRowNumber]] (range-partitioned
    * two-phase rank — the q167/q170 primitive, parallel end-to-end),
    * folded through NTile's own bucket arithmetic (n rows, k=5:
    * the first n%5 buckets hold n div 5 + 1 rows, the rest n div 5;
    * rank t's bucket follows by integer division — R20FixesSpec pins
    * rewritten ≡ naive-ntile-window row-for-row). DESC order becomes
    * ASC rank of the negated key (recency_days is a non-null
    * datediff, so no null-ordering divergence). */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    val perUser = events(s, d)
      .groupBy("user_id")
      .agg(max(col("ts").cast("date")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("monetary_cents"))
    val maxDay = perUser.agg(max("last_day").as("max_day"),
      count(lit(1)).as("n_users"))
    val g = perUser.crossJoin(broadcast(maxDay))
      .select(col("user_id"),
        datediff(col("max_day"), col("last_day")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary_cents"), col("n_users"))
    // 5 = best on every axis: recent (small recency), frequent, heavy
    val ranked = Seq(
      ("__rt", Seq("__rneg", "user_id")),
      ("__ft", Seq("frequency", "user_id")),
      ("__mt", Seq("monetary_cents", "user_id")))
      .foldLeft(g.withColumn("__rneg", -col("recency_days"))) {
        case (df, (out, cols)) => Distributed.globalRowNumber(df, cols, out)
      }
    // rank t (1-based) -> NTile(5) bucket, exactly Spark's arithmetic;
    // the ELSE divisor n div 5 is 0 only when n < 5, where t <= thr
    // always holds and CASE never evaluates the ELSE branch
    def quintile(t: String) = expr(
      s"CAST(CASE WHEN $t <= (n_users % 5) * (n_users div 5 + 1) " +
        s"THEN ($t - 1) div (n_users div 5 + 1) + 1 " +
        s"ELSE (n_users % 5) + " +
        s"($t - 1 - (n_users % 5) * (n_users div 5 + 1)) div (n_users div 5) + 1 " +
        "END AS BIGINT)")
    ranked.select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        quintile("__rt").as("r_q"), quintile("__ft").as("f_q"),
        quintile("__mt").as("m_q"))
      .withColumn("segment", expr("r_q * 100 + f_q * 10 + m_q"))
  }

  val rfmSegmentsSql: String =
    """WITH u AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
      |  count(*) AS frequency,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
      |  FROM events GROUP BY 1),
      |mx AS (SELECT max(last_day) AS max_day FROM u),
      |g AS (SELECT user_id,
      |  CAST(datediff('day', last_day, max_day) AS BIGINT) AS recency_days,
      |  CAST(frequency AS BIGINT) AS frequency, monetary_cents
      |  FROM u CROSS JOIN mx),
      |q AS (SELECT *,
      |  CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS BIGINT) AS r_q,
      |  CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f_q,
      |  CAST(ntile(5) OVER (ORDER BY monetary_cents, user_id) AS BIGINT) AS m_q
      |  FROM g)
      |SELECT user_id, recency_days, frequency, monetary_cents, r_q, f_q, m_q,
      |  r_q * 100 + f_q * 10 + m_q AS segment
      |FROM q""".stripMargin.replace("\n", " ")

  // ------------------------------------------- time-spine gap-fill

  /** q176 — DAILY GAP-FILL with LOCF: each user's event stream
    * resampled to a dense DAILY grain over [first active day, last
    * active day] — zero rows for silent days, plus a last-observation-
    * carried-forward column (the last ACTIVE day's total) — the
    * densification every downstream time-series feature (q159-style
    * trailing windows, forecasting inputs, "days since last activity")
    * assumes and that raw event logs never provide.
    *
    * Shape — the classic spine join REWRITTEN to dodge its own
    * shuffle: instead of building a spine table and LEFT JOINing the
    * daily aggregate back (a second exchange of the daily grain), the
    * per-user daily totals fold into ONE bounded map (`map_from_
    * entries` — entries = the user's ACTIVE days, bounded by the
    * calendar span, never by event count), the spine explodes from
    * min/max inside the same row, and `element_at` fills each day by
    * map lookup. Two user-keyed exchanges total ((user, day) partial
    * agg → (user) fold); the LOCF window runs on the (user)-hash
    * partitioning the fold just produced, so it adds a sort but NO
    * exchange — GapFillSpec pins exactly 2 exchanges and the
    * spine-join-free plan. Output rows ∝ user-days (calendar-bounded),
    * value sums round to 2dp (FLOAT RULE, the q27 contract). */
  def dailyGapFill(s: SparkSession, d: String): DataFrame = {
    val wLocf = Window.partitionBy("user_id").orderBy("day")
    events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("tot"))
      .groupBy("user_id")
      .agg(
        map_from_entries(collect_list(struct(col("day"),
          struct(col("n"), col("tot"))))).as("m"),
        min("day").as("d0"), max("day").as("d1"))
      .withColumn("day", explode(sequence(col("d0"), col("d1"))))
      .select(col("user_id"), col("day"),
        element_at(col("m"), col("day")).as("hit"))
      .select(col("user_id"), col("day"),
        coalesce(col("hit.n"), lit(0L)).as("n_events"),
        coalesce(col("hit.tot"), lit(0.0)).as("total_value"),
        last(col("hit.tot"), ignoreNulls = true).over(wLocf).as("carried_value"))
  }

  val dailyGapFillSql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, value FROM events),
      |d AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(value), 2) AS tot FROM ev GROUP BY 1, 2),
      |s AS (SELECT user_id,
      |  CAST(unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM d GROUP BY user_id),
      |j AS (SELECT s.user_id, s.day, coalesce(d.n, 0) AS n_events,
      |  coalesce(d.tot, 0) AS total_value, d.tot AS raw
      |  FROM s LEFT JOIN d ON s.user_id = d.user_id AND s.day = d.day)
      |SELECT user_id, day, n_events, total_value,
      |  last_value(raw IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value
      |FROM j""".stripMargin.replace("\n", " ")

  // ------------------------- DAU / WAU / MAU stickiness table

  /** q237 — ACTIVE-USER STICKINESS: per day, exact distinct users
    * that day (DAU), over the trailing 7 days (WAU) and 28 days
    * (MAU), plus the DAU/WAU and WAU/MAU ratios — the canonical
    * product-engagement table, and the denominator discipline
    * matters: these are EXACT windowed distincts (a user active 5×
    * this week counts once), not sums of daily counts. The sketch
    * alternative at extreme cardinality is q117's HLL; this is the
    * exact path.
    *
    * Implementation: `count(DISTINCT)` over a RANGE window is
    * unsupported, so the (user, day) activity grid fans out to the
    * days it supports — each activity row feeds ≤ 28 (grid_day, user)
    * rows via the broadcast day spine, and ONE aggregate takes the
    * three conditional distincts. Fan-out is user-days × 28, never
    * events × 28 (the activity grid dedupes first).
    *
    * FLOAT RULE: ratios in exact ppm.
    *
    * Scale shape: one (user, day) distinct aggregate over the scan;
    * the spine join is a broadcast range join (|days| rows); the
    * final (grid_day) aggregate carries the distinct expansion —
    * 3 distincts over ≤28× the activity grid. */
  def activeUserStickiness(s: SparkSession, d: String): DataFrame = {
    val act = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
      .localCheckpoint(true) // grid-sized; feeds the spine AND the join
    val spine = act.select(col("day").as("grid_day")).distinct()
    act.join(broadcast(spine),
        datediff(col("grid_day"), col("day")).between(0, 27))
      .select(col("grid_day"), col("user_id"),
        datediff(col("grid_day"), col("day")).as("age"))
      .groupBy("grid_day")
      .agg(
        countDistinct(when(col("age") === 0, col("user_id"))).as("dau"),
        countDistinct(when(col("age") <= 6, col("user_id"))).as("wau"),
        countDistinct(col("user_id")).as("mau"))
      .select(col("grid_day").as("day"), col("dau"), col("wau"), col("mau"),
        expr("dau * 1000000 div wau").as("dau_wau_ppm"),
        expr("wau * 1000000 div mau").as("wau_mau_ppm"))
  }

  val activeUserStickinessSql: String =
    """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |  FROM events),
      |spine AS (SELECT DISTINCT day AS grid_day FROM act),
      |j AS (SELECT s.grid_day, a.user_id,
      |  datediff('day', a.day, s.grid_day) AS age
      |  FROM act a JOIN spine s
      |  ON datediff('day', a.day, s.grid_day) BETWEEN 0 AND 27)
      |SELECT grid_day AS day,
      |  CAST(count(DISTINCT CASE WHEN age = 0 THEN user_id END) AS BIGINT) AS dau,
      |  CAST(count(DISTINCT CASE WHEN age <= 6 THEN user_id END) AS BIGINT) AS wau,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS mau,
      |  CAST(count(DISTINCT CASE WHEN age = 0 THEN user_id END) * 1000000
      |    // count(DISTINCT CASE WHEN age <= 6 THEN user_id END) AS BIGINT) AS dau_wau_ppm,
      |  CAST(count(DISTINCT CASE WHEN age <= 6 THEN user_id END) * 1000000
      |    // count(DISTINCT user_id) AS BIGINT) AS wau_mau_ppm
      |FROM j GROUP BY grid_day""".stripMargin.replace("\n", " ")

  // ----------------------- multi-touch conversion attribution

  /** q232 lookback window: touches inside this many hours before the
    * purchase participate in its journey. */
  val AttribLookbackHours = 24L

  /** q232 — MULTI-TOUCH ATTRIBUTION: distribute each purchase's
    * credit over the user's preceding touches (view/click/signup
    * within [[AttribLookbackHours]]) under the three standard models
    * at once — first-touch, last-touch, linear — summed per channel.
    * q155 answers "which view converted within the hour" (a range
    * join); this answers the marketing-mix question "which CHANNELS
    * earn the conversions", and running the models side by side in
    * one table is the point: first-vs-last disagreement IS the
    * funnel-position finding.
    *
    * FLOAT RULE: credit is integer ppm of a conversion — first/last
    * award 10⁶ to one touch; linear awards 10⁶ div n_touches to each
    * (the ≤ n_touches−1 ppm truncation per journey is the documented
    * quantization, identical on both engines).
    *
    * Scale shape: touches join purchases per user under the time
    * bound (the q155 range-join posture — per-user fan-out bounded by
    * activity within the lookback, never all-pairs); journey ranks
    * are ONE (purchase_id)-keyed window; the final per-channel
    * aggregate is channels-bounded. */
  def multiTouchAttribution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val touches = ev
      .filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("event_type").as("channel"),
        col("ts").as("t_ts"), col("event_id").as("t_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val j = touches.join(purchases, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr(s"INTERVAL $AttribLookbackHours HOURS"))
    val byJourney = Window.partitionBy("purchase_id")
    val asc = byJourney.orderBy(col("t_ts"), col("t_id"))
    val desc = byJourney.orderBy(col("t_ts").desc, col("t_id").desc)
    j
      .withColumn("rf", row_number().over(asc))
      .withColumn("rl", row_number().over(desc))
      .withColumn("nt", count(lit(1)).over(byJourney))
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_touches"),
        countDistinct(col("purchase_id")).as("n_journeys"),
        sum(when(col("rf") === 1, 1000000L).otherwise(0L)).as("first_ppm"),
        sum(when(col("rl") === 1, 1000000L).otherwise(0L)).as("last_ppm"),
        sum(expr("1000000 div nt")).as("linear_ppm"))
  }

  val multiTouchAttributionSql: String =
    s"""WITH t AS (SELECT user_id, event_type AS channel, ts AS t_ts,
       |  event_id AS t_id FROM events
       |  WHERE event_type IN ('view', 'click', 'signup')),
       |p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts
       |  FROM events WHERE event_type = 'purchase'),
       |j AS (SELECT t.channel, p.purchase_id, t.t_ts, t.t_id
       |  FROM t JOIN p ON t.user_id = p.user_id
       |  AND t.t_ts < p.p_ts
       |  AND t.t_ts >= p.p_ts - INTERVAL $AttribLookbackHours HOURS),
       |r AS (SELECT channel, purchase_id,
       |  row_number() OVER (PARTITION BY purchase_id ORDER BY t_ts, t_id) AS rf,
       |  row_number() OVER (PARTITION BY purchase_id ORDER BY t_ts DESC, t_id DESC) AS rl,
       |  count(*) OVER (PARTITION BY purchase_id) AS nt
       |  FROM j)
       |SELECT channel, count(*) AS n_touches,
       |  CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_journeys,
       |  CAST(sum(CASE WHEN rf = 1 THEN 1000000 ELSE 0 END) AS BIGINT) AS first_ppm,
       |  CAST(sum(CASE WHEN rl = 1 THEN 1000000 ELSE 0 END) AS BIGINT) AS last_ppm,
       |  CAST(sum(1000000 // nt) AS BIGINT) AS linear_ppm
       |FROM r GROUP BY channel""".stripMargin.replace("\n", " ")

  // ----------------------- discrete survival table (churn hazard)

  /** q233 censoring buffer: a user whose last event falls within this
    * many days of the horizon is censored (still alive), not churned. */
  val SurvCensorDays = 7L

  /** q233 — DISCRETE SURVIVAL TABLE over user lifetimes (the
    * Kaplan–Meier life table at day grain): for each account age t,
    * how many users were still at risk, and how many churned exactly
    * there. Lifespan = days between a user's first and last event;
    * users whose last event is within [[SurvCensorDays]] of the data
    * horizon are CENSORED — treating them as churned is the classic
    * retention-curve mistake this op exists to avoid (they count in
    * n_risk up to their observed age, then leave the denominator).
    * q131's cohort retention is calendar-grain marketing view; this
    * is the age-grain actuarial view models consume.
    *
    * FLOAT RULE: hazard ships as exact ppm div; the survival curve
    * S(t) = Π(1 − h) is the consumer's fold over this table.
    *
    * Scale shape: ONE (user) aggregate over the scan → a bounded
    * age-grain grid (≤ calendar days); the at-risk suffix sums are
    * two windows on that grid (the q217 bounded-grid posture). */
  def survivalTable(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
    val users = ev.groupBy("user_id")
      .agg(min("day").as("first_day"), max("day").as("last_day"))
    val horizon = ev.agg(max("day").as("horizon"))
    val lifes = users.crossJoin(broadcast(horizon))
      .select(datediff(col("last_day"), col("first_day")).cast("long").as("t"),
        (datediff(col("horizon"), col("last_day")) < SurvCensorDays)
          .as("censored"))
    val grid = lifes.groupBy("t")
      .agg(sum(when(col("censored"), 0L).otherwise(1L)).as("d_churn"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("d_censor"))
    val w = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("n_risk", sum(col("d_churn") + col("d_censor")).over(w))
      .select(col("t"), col("n_risk"), col("d_churn"), col("d_censor"),
        expr("d_churn * 1000000 div n_risk").as("hazard_ppm"))
  }

  // Window sums CAST BIGINT (the q167/q182 HUGEINT lesson).
  val survivalTableSql: String =
    s"""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
       |u AS (SELECT user_id, min(day) AS first_day, max(day) AS last_day
       |  FROM ev GROUP BY 1),
       |h AS (SELECT max(day) AS horizon FROM ev),
       |l AS (SELECT CAST(datediff('day', first_day, last_day) AS BIGINT) AS t,
       |  datediff('day', last_day, horizon) < $SurvCensorDays AS censored
       |  FROM u CROSS JOIN h),
       |g AS (SELECT t,
       |  CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d_churn,
       |  CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS d_censor
       |  FROM l GROUP BY 1),
       |r AS (SELECT t, d_churn, d_censor,
       |  CAST(sum(d_churn + d_censor) OVER (ORDER BY t DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
       |  FROM g)
       |SELECT t, n_risk, d_churn, d_censor,
       |  CAST(d_churn * 1000000 // n_risk AS BIGINT) AS hazard_ppm
       |FROM r""".stripMargin.replace("\n", " ")
}
