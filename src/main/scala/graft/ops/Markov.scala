package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2014) — the
  * model-based answer to the question q232's heuristics approximate:
  * build the first-order Markov chain over touch channels from
  * observed journeys (START → c₁ → … → CONV/NULL), then credit each
  * channel by how much total conversion probability DISAPPEARS when
  * that channel's node is removed (its inbound transitions redirect
  * to NULL — the standard convention, no renormalization). Unlike
  * first/last/linear, the removal effect accounts for path structure:
  * a channel that only ever appears after another earns less than its
  * touch count suggests.
  *
  * DETERMINISM CONTRACT (the FLOAT RULE under iteration): transition
  * probabilities are ×2²⁰ fixed point by exact div (duplicate edges
  * created by the redirect are COUNT-merged before scaling — div is
  * non-linear, so the merge order is part of the contract); the
  * absorption run is exactly [[MarkovRounds]] synchronous rounds of
  * mass · p div 2²⁰, with CONV/NULL as explicit self-loop-at-one
  * absorbing states. What ships is "mass absorbed in CONV after R
  * rounds" — a DEFINED integer both engines compute bit-identically,
  * not an asymptotic limit approximated differently by each.
  *
  * Scale shape: journey assembly and transition counting are
  * data-sized (one (user, day) window chain sharing one exchange +
  * one (from, to) count aggregate, states-bounded output ≤ ~20 rows);
  * the 4-variant × R-round iteration runs on that bounded grid — on
  * the driver here (the q94-priors precedent: a collect of ≤ 20
  * rows), as 4·R chained joins over 20-row CTEs in the oracle. */
object Markov {

  val MarkovScale = 1L << 20
  val MarkovRounds = 40
  val Channels = Seq("view", "click", "signup")

  /** The (from, to, cnt) transition counts over per-(user, day)
    * journeys: START → first touch → … → last touch → CONV/NULL
    * (CONV iff the user-day had a purchase). */
  def transitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"),
        col("event_type"), col("ts"), col("event_id"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("day")).distinct()
      .withColumn("conv", lit(true))
    val w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    val touches = ev
      .filter(col("event_type").isin(Channels: _*))
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .join(conv, Seq("user_id", "day"), "left")
      .na.fill(false, Seq("conv"))
    val mids = touches.select(col("event_type").as("from"),
      coalesce(col("nxt"), when(col("conv"), "conv").otherwise("null"))
        .as("to"))
    val starts = touches.filter(col("rn") === 1)
      .select(lit("start").as("from"), col("event_type").as("to"))
    starts.unionAll(mids)
      .groupBy("from", "to").agg(count(lit(1)).as("cnt"))
  }

  /** q234 — per channel: conversion mass (×2²⁰) of the full chain and
    * of the chain with the channel removed, and the removal effect in
    * ppm of the full-chain conversion. */
  /** Absorbed CONV mass (×2²⁰) after [[MarkovRounds]] rounds over
    * `trans`, with `removed`'s inbound edges redirected to NULL —
    * redirect, COUNT-merge, scale, iterate, in that order (contract). */
  private[graft] def convMassFrom(trans: Seq[(String, String, Long)],
                                  removed: Option[String]): Long = {
    val redirected = trans
      .filter { case (f, _, _) => !removed.contains(f) }
      .map { case (f, t, c) =>
        (f, if (removed.contains(t)) "null" else t, c) }
      .groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toSeq
      .map { case ((f, t), c) => (f, t, c) }
    val rowSum = redirected.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val p20 = redirected.map { case (f, t, c) =>
      (f, t, c * MarkovScale / rowSum(f)) } ++
      Seq(("conv", "conv", MarkovScale), ("null", "null", MarkovScale))
    val byFrom = p20.groupBy(_._1)
    var mass = Map("start" -> MarkovScale)
    for (_ <- 1 to MarkovRounds) {
      mass = mass.toSeq
        .flatMap { case (st, m) =>
          byFrom.getOrElse(st, Seq.empty).map { case (_, t, p) =>
            t -> m * p / MarkovScale } }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    mass.getOrElse("conv", 0L)
  }

  def markovRemoval(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val trans = transitions(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    def convMass(removed: Option[String]): Long = convMassFrom(trans, removed)

    val full = convMass(None)
    Channels.map { c =>
      val wo = convMass(Some(c))
      (c, full, wo, (full - wo) * 1000000L / full)
    }.toDF("channel", "conv_full_x2p20", "conv_removed_x2p20", "removal_ppm")
  }

  /** The oracle unrolls the same journey assembly, redirect, merge,
    * scale, and [[MarkovRounds]] synchronous rounds as chained CTEs —
    * every arithmetic step integer-identical to the driver loop. */
  val markovRemovalSql: String = {
    val chans = Channels.map(c => s"('$c')").mkString(", ")
    // AS MATERIALIZED: DuckDB inlines single-use CTEs, and 40 nested
    // round expansions blow up its planner — materializing each round
    // keeps the chain linear (measured: hang vs milliseconds).
    val rounds = (1 to MarkovRounds).map { i =>
      s"""m$i AS MATERIALIZED (SELECT v, t.to2 AS state,
         |  CAST(sum(m.mass * t.p20 // $MarkovScale) AS BIGINT) AS mass
         |  FROM m${i - 1} m JOIN tv t USING (v)
         |  WHERE t.from2 = m.state GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH conv AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
       |  true AS conv FROM events WHERE event_type = 'purchase'),
       |tch AS (SELECT e.user_id, CAST(e.ts AS DATE) AS day, e.event_type,
       |  row_number() OVER (PARTITION BY e.user_id, CAST(e.ts AS DATE)
       |    ORDER BY e.ts, e.event_id) AS rn,
       |  lead(e.event_type) OVER (PARTITION BY e.user_id, CAST(e.ts AS DATE)
       |    ORDER BY e.ts, e.event_id) AS nxt
       |  FROM events e WHERE e.event_type IN ('view', 'click', 'signup')),
       |tc AS (SELECT t.*, coalesce(c.conv, false) AS conv FROM tch t
       |  LEFT JOIN conv c ON c.user_id = t.user_id AND c.day = t.day),
       |tr AS (SELECT "from", "to", CAST(count(*) AS BIGINT) AS cnt FROM (
       |  SELECT event_type AS "from",
       |    coalesce(nxt, CASE WHEN conv THEN 'conv' ELSE 'null' END) AS "to"
       |  FROM tc
       |  UNION ALL
       |  SELECT 'start', event_type FROM tc WHERE rn = 1)
       |  GROUP BY 1, 2),
       |vrt(v) AS (VALUES ('none'), $chans),
       |red AS (SELECT v, "from" AS from2,
       |  CASE WHEN "to" = v THEN 'null' ELSE "to" END AS to2,
       |  CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM vrt CROSS JOIN tr WHERE "from" <> v GROUP BY 1, 2, 3),
       |rs AS (SELECT v, from2, CAST(sum(cnt) AS BIGINT) AS total
       |  FROM red GROUP BY 1, 2),
       |tv AS (SELECT red.v, red.from2, red.to2,
       |  CAST(red.cnt * $MarkovScale // rs.total AS BIGINT) AS p20
       |  FROM red JOIN rs ON rs.v = red.v AND rs.from2 = red.from2
       |  UNION ALL SELECT v, 'conv', 'conv', $MarkovScale FROM vrt
       |  UNION ALL SELECT v, 'null', 'null', $MarkovScale FROM vrt),
       |m0 AS (SELECT v, 'start' AS state, CAST($MarkovScale AS BIGINT) AS mass
       |  FROM vrt),
       |$rounds,
       |res AS (SELECT v, CAST(coalesce(sum(mass) FILTER (WHERE state = 'conv'), 0)
       |  AS BIGINT) AS cv FROM m$MarkovRounds GROUP BY 1)
       |SELECT c.v AS channel,
       |  f.cv AS conv_full_x2p20, c.cv AS conv_removed_x2p20,
       |  CAST((f.cv - c.cv) * 1000000 // f.cv AS BIGINT) AS removal_ppm
       |FROM res c CROSS JOIN (SELECT cv FROM res WHERE v = 'none') f
       |WHERE c.v <> 'none'""".stripMargin.replace("\n", " ")
  }
}
