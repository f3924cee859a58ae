package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation (the Great-Expectations /
  * dbt-test discipline, engine-side): a fixed suite of expectations —
  * NOT NULL, uniqueness, cross-column consistency, enum membership,
  * referential integrity, value ranges, freshness windows — evaluated
  * in bulk and reported as one (expectation, n_checked, n_violations,
  * pass) row each. A 100 TB ingest gate needs exactly this shape: the
  * judgment happens on a |suite|-bounded summary, never on row-level
  * violation dumps (those are a debugging query you run AFTER the
  * gate trips, scoped to the one failing expectation).
  *
  * Scale shape: every per-table expectation family is fused into ONE
  * aggregate pass over that table (a single scan computing all of its
  * sum(CASE…) counters with map-side partials — adding an expectation
  * adds a counter, not a scan). The one cross-table expectation
  * (orders.o_custkey → customer) rides the same orders scan as a
  * broadcast left join on the dimension's key column, so the whole
  * suite costs three scans + three 1-row aggregates regardless of
  * suite size. Output is |suite|-bounded (9 rows). The freshness
  * expectation is deliberately one that FAILS on this corpus (order
  * dates are 1995–2001): a contract engine must prove its violation
  * path on real data, not only its green path.
  */
object Contracts {

  private val Langs = Seq("en", "zh", "fr", "es", "de")

  private val one = lit(1L)
  private def viol(c: org.apache.spark.sql.Column) =
    sum(when(c, 1L).otherwise(0L))

  // The documents table's ROW-LOCAL violation predicates — shared by
  // the batch suite and the streaming gate so both count identically.
  private def docNullPred = col("doc_id").isNull
  private def docLenPred  = col("n_chars") =!= length(col("text"))
  private def docLangPred = !col("lang").isin(Langs: _*)

  /** The streaming-gate subset of q273: per-expectation additive
    * (checked, violations) counters over a documents frame. Only the
    * ROW-LOCAL families live here — NOT NULL, cross-column
    * consistency, enum — because counters add across micro-batches
    * and retries; the set-level families (UNIQUE, referential) need
    * distinct/join STATE, not counters, and stay audit-side BY
    * DESIGN. [[graft.streaming.StreamingFraud.contractsGateStream]]
    * is this builder over the stream; a full-table replay equals the
    * registered q273 rows (ContractsSpec pins it). */
  def docRowLocalCounts(docs: DataFrame): DataFrame =
    docs.agg(
      count(one).as("n"),
      viol(docNullPred).as("v_null"),
      viol(docLenPred).as("v_len"),
      viol(docLangPred).as("v_lang"))
      .selectExpr(
        """stack(3,
          |'documents.doc_id NOT NULL',                  n, v_null,
          |'documents.n_chars = length(text)',           n, v_len,
          |'documents.lang IN (en,zh,fr,es,de)',         n, v_lang
          |) AS (expectation, n_checked, n_violations)""".stripMargin)

  /** q273 — run the contract suite; one row per expectation. */
  def dataContracts(s: SparkSession, d: String): DataFrame = {

    val docs = Tables.documents(s, d).agg(
      count(one).as("n"),
      viol(docNullPred).as("v_null"),
      // duplicate mass among NON-NULL keys only (count(col) skips
      // nulls, countDistinct always has): a NULL id is the NOT NULL
      // expectation's violation, not a uniqueness one — counting it
      // twice would double-report a single defect.
      (count(col("doc_id")) - countDistinct(col("doc_id"))).as("v_uniq"),
      viol(docLenPred).as("v_len"),
      viol(docLangPred).as("v_lang"))
      .selectExpr(
        """stack(4,
          |'documents.doc_id NOT NULL',                  n, v_null,
          |'documents.doc_id UNIQUE',                    n, v_uniq,
          |'documents.n_chars = length(text)',           n, v_len,
          |'documents.lang IN (en,zh,fr,es,de)',         n, v_lang
          |) AS (expectation, n_checked, n_violations)""".stripMargin)

    // The FK probe rides the fact scan: broadcast the dimension's key
    // column (distinct because the check is set membership, and so a
    // duplicated key could never double-count fact rows).
    val custKeys = broadcast(
      Tables.customer(s, d).select(col("c_custkey")).distinct())
    val ords = Tables.orders(s, d)
      .join(custKeys, col("o_custkey") === col("c_custkey"), "left")
      .agg(
        count(one).as("n"),
        viol(col("c_custkey").isNull).as("v_fk"),
        viol(col("o_totalprice") <= 0.0).as("v_price"),
        viol(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .as("v_fresh"))
      .selectExpr(
        """stack(3,
          |'orders.o_custkey REFERENCES customer.c_custkey', n, v_fk,
          |'orders.o_totalprice > 0',                        n, v_price,
          |'orders.o_orderdate >= 2000-01-01',               n, v_fresh
          |) AS (expectation, n_checked, n_violations)""".stripMargin)

    val evs = Tables.events(s, d).agg(
      count(one).as("n"),
      viol(col("value") < 0.0).as("v_neg"),
      viol(col("ts") < lit("2024-01-01").cast("timestamp") ||
           col("ts") >= lit("2024-02-01").cast("timestamp")).as("v_win"))
      .selectExpr(
        """stack(2,
          |'events.value >= 0',                         n, v_neg,
          |'events.ts IN [2024-01-01, 2024-02-01)',     n, v_win
          |) AS (expectation, n_checked, n_violations)""".stripMargin)

    docs.unionAll(ords).unionAll(evs)
      .withColumn("pass", col("n_violations") === 0L)
  }

  val dataContractsSql: String =
    """WITH docs AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS v_null,
      |    count(doc_id) - count(DISTINCT doc_id) AS v_uniq,
      |    sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS v_len,
      |    sum(CASE WHEN lang NOT IN ('en','zh','fr','es','de') THEN 1 ELSE 0 END) AS v_lang
      |  FROM documents),
      |ords AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS v_fk,
      |    sum(CASE WHEN o.o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_price,
      |    sum(CASE WHEN o.o_orderdate < TIMESTAMP '2000-01-01' THEN 1 ELSE 0 END) AS v_fresh
      |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |    ON o.o_custkey = c.c_custkey),
      |evs AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS v_neg,
      |    sum(CASE WHEN ts < TIMESTAMP '2024-01-01' OR ts >= TIMESTAMP '2024-02-01' THEN 1 ELSE 0 END) AS v_win
      |  FROM events),
      |rows_all AS (
      |  SELECT 'documents.doc_id NOT NULL' AS expectation, n, v_null AS v FROM docs
      |  UNION ALL SELECT 'documents.doc_id UNIQUE', n, v_uniq FROM docs
      |  UNION ALL SELECT 'documents.n_chars = length(text)', n, v_len FROM docs
      |  UNION ALL SELECT 'documents.lang IN (en,zh,fr,es,de)', n, v_lang FROM docs
      |  UNION ALL SELECT 'orders.o_custkey REFERENCES customer.c_custkey', n, v_fk FROM ords
      |  UNION ALL SELECT 'orders.o_totalprice > 0', n, v_price FROM ords
      |  UNION ALL SELECT 'orders.o_orderdate >= 2000-01-01', n, v_fresh FROM ords
      |  UNION ALL SELECT 'events.value >= 0', n, v_neg FROM evs
      |  UNION ALL SELECT 'events.ts IN [2024-01-01, 2024-02-01)', n, v_win FROM evs)
      |SELECT expectation, CAST(n AS BIGINT) AS n_checked,
      |  CAST(v AS BIGINT) AS n_violations, v = 0 AS pass
      |FROM rows_all""".stripMargin.replace("\n", " ")
}
