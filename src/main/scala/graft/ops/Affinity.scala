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
  def itemCooccurrence(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
    val perUserItem = ev.groupBy("user_id", "item")
      .agg(count(lit(1)).as("n"))
    val capped = perUserItem
      .groupBy("user_id")
      .agg(TopKAggregator.topK(ItemCap)(
        col("n").cast("double"), col("item")).as("top"))
      .select(col("user_id"),
        array_sort(expr("transform(top, t -> t._2)")).as("items"))
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
}
