package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Co-engagement analytics: which items travel together across users.
  * The item-item co-occurrence + lift matrix is the classic implicit-
  * feedback recommender primitive (and, for a training-data pipeline,
  * the source-affinity signal behind mixture design: which sources the
  * same users/sessions co-consume).
  *
  * Scale shape — the naive formulation is a fact-table SELF-JOIN on
  * user_id whose fan-out is ∑ C(|items_u|, 2), unbounded in the tail
  * (one crawler "user" touching 10⁶ items yields 5·10¹¹ pairs). This
  * implementation bounds it structurally, the same way the q20 family
  * bounds top-k:
  *  1. one (user_id, item) hash aggregate (map-side partials) counts
  *     engagements;
  *  2. one (user_id) aggregate folds each user's items through the
  *     k-bounded [[TopKAggregator]] buffer (count desc, item asc — the
  *     exact `row_number` contract, shuffled pre-reduced), capping
  *     every user at [[ItemCap]] items — so pair fan-out is ≤
  *     C(cap, 2) per user BY CONSTRUCTION, not by hope;
  *  3. pair expansion is pure codegen arithmetic over the in-row
  *     sorted array (transform × slice — no explode-then-self-join,
  *     no shuffle between cap and pair count);
  *  4. the pair count is the only remaining exchange; item marginals
  *     and the user total broadcast onto it.
  * Lift stays in ×10⁴ integer fixed point (FLOAT RULE): n_ab·U·10⁴
  * div (n_a·n_b) — exact in both engines. The BIGINT product bounds
  * the op to n_ab·U·10⁴ < 2⁶³ (fine to ~10⁹ users·pairs); past that,
  * reorder to (n_ab·10⁴ div n_a)·U div n_b or lift the numerator to
  * DECIMAL like [[Quality.chiSquare]] does.
  */
object Affinity {

  /** Per-user item cap: bounds pair fan-out at C(64,2) ≈ 2k pairs per
    * user regardless of how degenerate the user's engagement tail is. */
  val ItemCap = 64

  /** Pairs seen by fewer users than this are noise, and dropping them
    * early keeps the result candidate-mass-shaped. */
  val MinSupport = 5

  /** q164 — item co-occurrence with lift, per-user capped. Output:
    * (item_a < item_b, n_ab users co-engaging both, lift ×10⁴). */
  /** The shared cap stage: per user, the [[ItemCap]] strongest items
    * as ONE sorted in-row array (see steps 1–2 of the plan above).
    * q164 and q241 both start here, so the cap semantics — and the
    * bounded fan-out guarantee — are one definition. */
  private def cappedItems(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
    ev.groupBy("user_id", "item")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(TopKAggregator.topK(ItemCap)(
        col("n").cast("double"), col("item")).as("top"))
      .select(col("user_id"),
        array_sort(expr("transform(top, t -> t._2)")).as("items"))
  }

  def itemCooccurrence(s: SparkSession, d: String): DataFrame = {
    val capped = cappedItems(s, d)
    val pairs = capped
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items)),
          |            y -> struct(x AS a, y AS b))))"""
          .stripMargin.replace("\n", " "))).as("p"))
      .groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= MinSupport)
    val itemUsers = capped
      .select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("ni"))
    val nUsers = capped.agg(count(lit(1)).as("nu"))
    pairs
      .join(broadcast(itemUsers.select(col("item").as("item_a"),
        col("ni").as("n_a"))), "item_a")
      .join(broadcast(itemUsers.select(col("item").as("item_b"),
        col("ni").as("n_b"))), "item_b")
      .crossJoin(broadcast(nUsers))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        expr("CAST(n_ab * nu * 10000 div (n_a * n_b) AS BIGINT)")
          .as("lift_x10k"))
  }

  /** DuckDB twin: row_number cap (same (n desc, item) order keys as the
    * TopK buffer), pair self-join — correct at oracle scale, and the
    * contrast with the bounded plan above IS the point. */
  val itemCooccurrenceSql: String =
    s"""WITH ui AS (
       |  SELECT user_id,
       |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
       |         count(*) AS n
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2),
       |capped AS (
       |  SELECT user_id, item FROM (
       |    SELECT user_id, item,
       |           row_number() OVER (PARTITION BY user_id
       |                              ORDER BY n DESC, item) AS rn
       |    FROM ui) WHERE rn <= $ItemCap),
       |u AS (SELECT count(DISTINCT user_id) AS nu FROM capped),
       |ic AS (SELECT item, count(*) AS ni FROM capped GROUP BY 1),
       |p AS (
       |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
       |  FROM capped a JOIN capped b
       |    ON a.user_id = b.user_id AND a.item < b.item
       |  GROUP BY 1, 2)
       |SELECT item_a, item_b, n_ab,
       |       CAST(n_ab * nu * 10000 // (ca.ni * cb.ni) AS BIGINT) AS lift_x10k
       |FROM p CROSS JOIN u
       |JOIN ic ca ON ca.item = p.item_a
       |JOIN ic cb ON cb.item = p.item_b
       |WHERE n_ab >= $MinSupport""".stripMargin.replace("\n", " ")

  // ------------------------------------ association rules (a → b)

  /** q241 keeps only rules at least this confident (×10⁴ fixed
    * point): conf = P(b | a) ≥ 20%. */
  val MinConf = 2000L

  /** q241 — ASSOCIATION RULES over the q164 co-engagement matrix:
    * the directional reading of co-occurrence. q164's lift is
    * symmetric ("these travel together"); a rule a→b adds the
    * direction a curator acts on — "users of a also take b with
    * confidence c" — the classic market-basket output (Agrawal &
    * Srikant's Apriori surface at itemset size 2), and for mixture
    * design "sources whose audience reliably co-consumes source b".
    *
    * Each undirected support pair emits BOTH directions; confidence
    * is conf_x10k = n_ab·10⁴ div n_antecedent (exact integer div,
    * FLOAT RULE), lift stays q164's symmetric n_ab·U·10⁴ div
    * (n_a·n_b); rules below [[MinConf]] drop. A rule can be
    * confident but lift-negative (b is just popular) — shipping both
    * lets the reader separate the two, the textbook confidence-vs-
    * lift caveat.
    *
    * Scale shape: inherits q164's structural bound (pair fan-out ≤
    * C(cap,2) per user); the direction expansion is a 2× in-row
    * union AFTER the pair aggregate, marginals broadcast — nothing
    * new shuffles, output is rule-grain. */
  def associationRules(s: SparkSession, d: String): DataFrame = {
    val capped = cappedItems(s, d)
    val pairs = capped
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items)),
          |            y -> struct(x AS a, y AS b))))"""
          .stripMargin.replace("\n", " "))).as("p"))
      .groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= MinSupport)
    val itemUsers = capped
      .select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("ni"))
    val nUsers = capped.agg(count(lit(1)).as("nu"))
    val directed = pairs
      .select(col("item_a").as("ante"), col("item_b").as("cons"), col("n_ab"))
      .unionAll(pairs
        .select(col("item_b").as("ante"), col("item_a").as("cons"), col("n_ab")))
    directed
      .join(broadcast(itemUsers.select(col("item").as("ante"),
        col("ni").as("n_ante"))), "ante")
      .join(broadcast(itemUsers.select(col("item").as("cons"),
        col("ni").as("n_cons"))), "cons")
      .crossJoin(broadcast(nUsers))
      .select(col("ante"), col("cons"), col("n_ante"), col("n_cons"),
        col("n_ab"),
        expr("CAST(n_ab * 10000 div n_ante AS BIGINT)").as("conf_x10k"),
        expr("CAST(n_ab * nu * 10000 div (n_ante * n_cons) AS BIGINT)")
          .as("lift_x10k"))
      .filter(col("conf_x10k") >= MinConf)
  }

  /** DuckDB twin: the q164 oracle's capped self-join, expanded to
    * both directions with the same integer confidence cut. */
  val associationRulesSql: String =
    s"""WITH ui AS (
       |  SELECT user_id,
       |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
       |         count(*) AS n
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2),
       |capped AS (
       |  SELECT user_id, item FROM (
       |    SELECT user_id, item,
       |           row_number() OVER (PARTITION BY user_id
       |                              ORDER BY n DESC, item) AS rn
       |    FROM ui) WHERE rn <= $ItemCap),
       |u AS (SELECT count(DISTINCT user_id) AS nu FROM capped),
       |ic AS (SELECT item, count(*) AS ni FROM capped GROUP BY 1),
       |p AS (
       |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
       |  FROM capped a JOIN capped b
       |    ON a.user_id = b.user_id AND a.item < b.item
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $MinSupport),
       |dir AS (SELECT item_a AS ante, item_b AS cons, n_ab FROM p
       |  UNION ALL SELECT item_b, item_a, n_ab FROM p)
       |SELECT ante, cons, ca.ni AS n_ante, cb.ni AS n_cons, n_ab,
       |       CAST(n_ab * 10000 // ca.ni AS BIGINT) AS conf_x10k,
       |       CAST(n_ab * nu * 10000 // (ca.ni * cb.ni) AS BIGINT) AS lift_x10k
       |FROM dir CROSS JOIN u
       |JOIN ic ca ON ca.item = dir.ante
       |JOIN ic cb ON cb.item = dir.cons
       |WHERE n_ab * 10000 // ca.ni >= $MinConf"""
      .stripMargin.replace("\n", " ")

  // ----------------------------- link prediction over the co-graph

  /** q222 emits the top-[[LinkPredTopN]] predicted links; the item
    * graph keeps each item's [[LinkPredDeg]] strongest partners. */
  val LinkPredTopN = 50
  val LinkPredDeg = 8

  /** q222 — LINK PREDICTION over the item k-NN graph: score every
    * NON-adjacent item pair that shares at least one neighbor by
    * (a) common-neighbor count and (b) the resource-allocation index
    * Σ_m 1/deg(m) (Zhou et al. 2009 — Adamic–Adar's integer-friendly
    * sibling: a shared neighbor linked to everything is weak
    * evidence, one with two links is strong), and emit the
    * top-[[LinkPredTopN]]. For a recommender this is "items that
    * SHOULD co-engage but don't yet"; for mixture design, source/
    * topic affinities one hop out from the observed matrix.
    *
    * The graph is each item's [[LinkPredDeg]] STRONGEST q164
    * partners (n_ab desc, partner asc), symmetrized — NOT the raw
    * support-threshold graph, which saturates: on a fixed item
    * vocabulary every pair eventually crosses any fixed support as
    * data grows (measured here: complete at sf0.01), leaving no
    * non-edges to predict. The k-NN graph's degree is bounded BY
    * CONSTRUCTION at any corpus size — the same reason ANN search
    * (q44) and hard-negative mining (q104) work over k-NN structure.
    *
    * FLOAT RULE: RA ships as Σ (10⁴ div deg(m)) — each wedge's term
    * an exact integer div both engines compute identically, summed
    * exactly (deg ≤ 2·[[LinkPredDeg]]·items/items keeps terms
    * nonzero at this scale; raise the scale with the degree cap).
    *
    * Scale shape: pair strengths come from q164's structurally-
    * bounded plan (≤ C(cap,2) fan-out per user); the k-NN cut is an
    * item-keyed window over the pair table (pair-mass input, item
    * output); wedge enumeration is one self-join of the bounded-
    * degree adjacency on the shared endpoint — ≤ |items|·deg² rows
    * by construction (the saturating graph's Σdeg² had no such
    * bound). Degrees broadcast onto the wedge stream; the anti-join
    * removes already-linked pairs; the top-N is TakeOrdered. */
  def linkPrediction(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairStrength = itemCooccurrence(s, d)
      .select(col("item_a"), col("item_b"), col("n_ab"))
    val directed = pairStrength
      .select(col("item_a").as("u"), col("item_b").as("v"), col("n_ab"))
      .union(pairStrength
        .select(col("item_b").as("u"), col("item_a").as("v"), col("n_ab")))
    val knn = directed
      .withColumn("rn", row_number().over(Window.partitionBy("u")
        .orderBy(col("n_ab").desc, col("v"))))
      .filter(col("rn") <= LinkPredDeg)
    val edges = knn
      .select(least(col("u"), col("v")).as("item_a"),
        greatest(col("u"), col("v")).as("item_b"))
      .distinct()
      .localCheckpoint(true) // feeds adjacency twice + the anti-join
    val adj = edges.select(col("item_a").as("u"), col("item_b").as("v"))
      .union(edges.select(col("item_b").as("u"), col("item_a").as("v")))
    val deg = adj.groupBy(col("u").as("m")).agg(count(lit(1)).as("deg"))
    val wedges = adj.select(col("v").as("a"), col("u").as("m"))
      .join(adj.select(col("u").as("m2"), col("v").as("b")),
        col("m") === col("m2") && col("a") < col("b"))
      .join(broadcast(deg), "m")
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"),
        sum(expr("10000 div deg")).as("ra_x10k"))
    wedges
      .join(edges, col("a") === col("item_a") && col("b") === col("item_b"),
        "left_anti")
      // TakeOrderedAndProject: per-partition top-N, merged on the
      // driver — no global window ever sees the full candidate stream
      .orderBy(col("cn").desc, col("ra_x10k").desc, col("a"), col("b"))
      .limit(LinkPredTopN)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("cn").desc, col("ra_x10k").desc, col("a"), col("b"))))
      .select(col("rank"), col("a").as("item_a"), col("b").as("item_b"),
        col("cn"), col("ra_x10k"))
  }

  val linkPredictionSql: String =
    s"""WITH co AS ($itemCooccurrenceSql),
       |dir AS (SELECT item_a AS u, item_b AS v, n_ab FROM co
       |  UNION ALL SELECT item_b, item_a, n_ab FROM co),
       |knn AS (SELECT u, v FROM (SELECT u, v,
       |    row_number() OVER (PARTITION BY u ORDER BY n_ab DESC, v) AS rn
       |  FROM dir) WHERE rn <= $LinkPredDeg),
       |e AS (SELECT DISTINCT least(u, v) AS item_a, greatest(u, v) AS item_b
       |  FROM knn),
       |adj AS (SELECT item_a AS u, item_b AS v FROM e
       |  UNION ALL SELECT item_b, item_a FROM e),
       |dg AS (SELECT u AS m, count(*) AS deg FROM adj GROUP BY 1),
       |w AS (SELECT x.v AS a, y.v AS b, x.u AS m
       |  FROM adj x JOIN adj y ON x.u = y.u AND x.v < y.v),
       |cand AS (SELECT w.a, w.b, count(*) AS cn,
       |  CAST(sum(10000 // dg.deg) AS BIGINT) AS ra_x10k
       |  FROM w JOIN dg ON dg.m = w.m
       |  GROUP BY 1, 2),
       |nonadj AS (SELECT c.* FROM cand c
       |  LEFT JOIN e ON e.item_a = c.a AND e.item_b = c.b
       |  WHERE e.item_a IS NULL)
       |SELECT rank, item_a, item_b, cn, ra_x10k FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY cn DESC, ra_x10k DESC, a, b)
       |    AS INT) AS rank, a AS item_a, b AS item_b, cn, ra_x10k
       |  FROM nonadj)
       |WHERE rank <= $LinkPredTopN""".stripMargin.replace("\n", " ")
}
