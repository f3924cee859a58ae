package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality CONSTRAINT SUITE (the Deequ/"unit tests for
  * data" pattern): a fixed set of named constraints over a table —
  * completeness, key uniqueness, accepted values, numeric sign, string
  * pattern, date bounds, referential integrity, minimum size — evaluated
  * in bulk and emitted as one row per constraint with its violation
  * count and pass verdict. A training-data pipeline runs exactly this
  * gate before admitting a new snapshot of an upstream table; shipping
  * it as a first-class op (instead of ad-hoc asserts) is what makes the
  * gate auditable and diffable across snapshots (compose with q137's
  * snapshot diff to see WHICH rows broke a newly-failing constraint).
  *
  * Scale shape: the WHOLE suite is ONE pass over the fact scan —
  * referential integrity rides as a broadcast LEFT join against the
  * (deduplicated) dimension key column, so every conditional count,
  * the count-distinct, and the orphan count share a single aggregate
  * (the uniqueness check adds the count-distinct expand, ×2 scan-side
  * rows, still one exchange; at 100 TB with a non-broadcastable
  * dimension the join becomes a shuffle join on the key — the
  * aggregate above it is unchanged). The constraint rows are exploded
  * from a single struct array over the one-row result, so output is
  * constraint-count-bounded, never row-count-bounded. Uniqueness here
  * is EXACT (count-distinct); the approximate path at extreme
  * cardinality is the sketch family (q117's HLL — same one-pass
  * shape, no expand).
  *
  * FLOAT RULE: violation counts and the 0/1 pass flag are integers;
  * no ratios ship (completeness% = 1 − violations/total_rows is
  * derivable downstream).
  */
object Quality {

  /** q145 — the constraint suite over `orders` (referential target
    * `customer`). Constraint catalog:
    *
    *  - `completeness` ×6: NULL count per column;
    *  - `uniqueness(o_orderkey)`: rows − distinct (dupes);
    *  - `accepted_values(o_orderstatus)`: outside {F,O,P} (NULL counts);
    *  - `non_negative(o_totalprice)`: strictly negative values;
    *  - `pattern(o_orderpriority)`: not matching `^[1-5]-` (NULL counts);
    *  - `date_bounds(o_orderdate)`: outside the generator's [1995-01-01, 2002-01-01);
    *  - `referential(o_custkey)`: order rows with no customer row
    *    (NULL key counts — an unattributable row is a violation);
    *  - `min_size(*)`: table has at least one row.
    */
  def qualityChecks(s: SparkSession, d: String): DataFrame =
    qualityChecksFrom(Tables.orders(s, d),
      Tables.customer(s, d).select(col("c_custkey")))

  /** [[qualityChecks]] over explicit frames — QualitySpec drives this
    * with constructed violation tables to pin every counter. */
  def qualityChecksFrom(orders: DataFrame, custKeys: DataFrame): DataFrame = {
    def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"v_$c")
    // NULL predicates fall to the otherwise-branch, so wrap checks whose
    // NULL case must count as a violation in an explicit isNull OR.
    // The dim side is deduplicated so the left join cannot inflate row
    // counts if the dimension itself violates ITS key-uniqueness gate.
    val metrics = orders
      .join(broadcast(custKeys.distinct()),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(
      count(lit(1)).as("n_rows"),
      nulls("o_orderkey"), nulls("o_custkey"), nulls("o_orderstatus"),
      nulls("o_totalprice"), nulls("o_orderdate"), nulls("o_orderpriority"),
      count_distinct(col("o_orderkey")).as("n_distinct_key"),
      sum(when(col("o_orderstatus").isNull ||
        !col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L)).as("v_status"),
      sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("v_neg"),
      sum(when(col("o_orderpriority").isNull ||
        !col("o_orderpriority").rlike("^[1-5]-"), 1L).otherwise(0L)).as("v_prio"),
      sum(when(col("o_orderdate").isNull ||
        col("o_orderdate").cast("date") < lit("1995-01-01").cast("date") ||
        col("o_orderdate").cast("date") >= lit("2002-01-01").cast("date"),
        1L).otherwise(0L)).as("v_date"),
      sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("v_orph"))

    def row(check: String, colName: String, violations: Column) =
      struct(lit(check).as("check_name"), lit(colName).as("col_name"),
        coalesce(violations, lit(0L)).cast("long").as("violations"))
    metrics
      .select(col("n_rows"), explode(array(
        row("completeness", "o_orderkey", col("v_o_orderkey")),
        row("completeness", "o_custkey", col("v_o_custkey")),
        row("completeness", "o_orderstatus", col("v_o_orderstatus")),
        row("completeness", "o_totalprice", col("v_o_totalprice")),
        row("completeness", "o_orderdate", col("v_o_orderdate")),
        row("completeness", "o_orderpriority", col("v_o_orderpriority")),
        row("uniqueness", "o_orderkey", col("n_rows") - col("n_distinct_key") - col("v_o_orderkey")),
        row("accepted_values", "o_orderstatus", col("v_status")),
        row("non_negative", "o_totalprice", col("v_neg")),
        row("pattern", "o_orderpriority", col("v_prio")),
        row("date_bounds", "o_orderdate", col("v_date")),
        row("referential", "o_custkey", col("v_orph")),
        row("min_size", "*", when(col("n_rows") >= 1, 0L).otherwise(1L))
      )).as("c"))
      .select(col("c.check_name").as("check_name"), col("c.col_name").as("col_name"),
        col("c.violations").as("violations"), col("n_rows").as("total_rows"),
        when(col("c.violations") === 0, 1L).otherwise(0L).as("pass"))
  }

  /** PSI bin width for the `n_chars` length distribution (48..553 in
    * the generator → 9 occupied bins). */
  val PsiCharBin = 64L

  /** q148 — POPULATION STABILITY INDEX drift between two snapshots of
    * the documents table, per bin: the distribution-level drift
    * measurement that completes the snapshot-monitoring family (q137
    * tells you WHICH rows changed; q145 whether constraints still
    * hold; this one whether the DISTRIBUTION a model was trained
    * against has shifted — the metric every feature store monitors,
    * PSI = Σ (p_cur − p_prev)·ln(p_cur/p_prev)). Two dimensions: the
    * binned `n_chars` length histogram and the `lang` marginal.
    * Snapshots reuse q137's bucket convention exactly (prev = minus
    * the added bucket, cur = minus the removed bucket), so the two
    * monitors describe the same pair of snapshots.
    *
    * Shares are Laplace-smoothed — p = (n+1)/(N+B) with B the dim's
    * observed bin count — so an emptied or newly-appearing bin
    * contributes a finite, defined term on both engines (the standard
    * PSI ε-floor, made deterministic). Per-bin contributions ship
    * (rounded to 6dp — the only non-integer column); the headline
    * per-dim PSI is their sum downstream.
    *
    * Scale shape: ONE scan — each row contributes to both snapshots
    * and both dims via a 2-row explode and conditional sums; the
    * (dim, bin) aggregate is bins-bounded, the per-dim totals join
    * back broadcast. Nothing after the first aggregate is data-sized.
    * At 100 TB with real separate snapshot tables, the shape is two
    * scans into the same bins-bounded aggregate — union the tagged
    * scans and keep everything else. */
  /** The q148 monitoring dimensions of a (doc_id, lang, n_chars) frame:
    * one row per (dim, bin) membership — the shared expression layer
    * under the batch PSI and the streaming drift monitor
    * ([[graft.streaming.StreamingFraud.distributionDriftStream]]). */
  def docBins(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        expr(s"CAST(n_chars div $PsiCharBin AS STRING)").as("chars_bin"))
      .select(col("doc_id"),
        explode(array(
          struct(lit("n_chars_bin").as("dim"), col("chars_bin").as("bin")),
          struct(lit("lang").as("dim"), col("lang").as("bin")))).as("e"))
      .select(col("doc_id"), col("e.dim").as("dim"), col("e.bin").as("bin"))

  def psiDrift(s: SparkSession, d: String): DataFrame = {
    import Sketches.{DiffMod, DiffAddBucket, DiffRemBucket}
    val binned = docBins(Tables.documents(s, d))
      .select(col("dim"), col("bin"),
        when(col("doc_id") % DiffMod =!= DiffRemBucket, 1L).otherwise(0L).as("in_cur"),
        when(col("doc_id") % DiffMod =!= DiffAddBucket, 1L).otherwise(0L).as("in_prev"))
    val bins = binned.groupBy("dim", "bin")
      .agg(sum("in_cur").as("n_cur"), sum("in_prev").as("n_prev"))
    val totals = bins.groupBy("dim")
      .agg(sum("n_cur").as("tot_cur"), sum("n_prev").as("tot_prev"),
        count(lit(1)).as("n_bins"))
    bins.join(broadcast(totals), "dim")
      .select(col("dim"), col("bin"), col("n_cur"), col("n_prev"),
        round(
          ((col("n_cur") + 1) / (col("tot_cur") + col("n_bins")) -
           (col("n_prev") + 1) / (col("tot_prev") + col("n_bins"))) *
          log(((col("n_cur") + 1) / (col("tot_cur") + col("n_bins"))) /
              ((col("n_prev") + 1) / (col("tot_prev") + col("n_bins")))),
          6).as("psi6"))
  }

  val psiDriftSql: String = {
    import Sketches.{DiffMod, DiffAddBucket, DiffRemBucket}
    s"""WITH binned AS (
       |  SELECT doc_id, e.dim, e.bin,
       |    CASE WHEN doc_id % $DiffMod != $DiffRemBucket THEN 1 ELSE 0 END AS in_cur,
       |    CASE WHEN doc_id % $DiffMod != $DiffAddBucket THEN 1 ELSE 0 END AS in_prev
       |  FROM documents,
       |    unnest([struct_pack(dim := 'n_chars_bin', bin := CAST(n_chars // $PsiCharBin AS VARCHAR)),
       |            struct_pack(dim := 'lang', bin := lang)]) AS t(e)),
       |bins AS (SELECT dim, bin, CAST(sum(in_cur) AS BIGINT) AS n_cur,
       |    CAST(sum(in_prev) AS BIGINT) AS n_prev
       |  FROM binned GROUP BY 1, 2),
       |tot AS (SELECT dim, sum(n_cur) AS tot_cur, sum(n_prev) AS tot_prev,
       |    count(*) AS n_bins FROM bins GROUP BY 1)
       |SELECT b.dim, b.bin, b.n_cur, b.n_prev,
       |  round(((b.n_cur + 1) / (t.tot_cur + t.n_bins) -
       |         (b.n_prev + 1) / (t.tot_prev + t.n_bins)) *
       |        ln(((b.n_cur + 1) / (t.tot_cur + t.n_bins)) /
       |           ((b.n_prev + 1) / (t.tot_prev + t.n_bins))), 6) AS psi6
       |FROM bins b JOIN tot t USING (dim)""".stripMargin.replace("\n", " ")
  }

  // ---------------------- two-sample KS drift between source pairs

  /** ks_ppm scale: the statistic ships as parts-per-million. */
  val KsScale = 1000000L

  /** q198 — two-sample KOLMOGOROV–SMIRNOV statistic between every PAIR
    * of sources over the document-length distribution: the
    * distribution-comparison primitive PSI (q148) does not give you.
    * PSI is binned and snapshot-vs-snapshot; KS is binless (supremum
    * gap between the two empirical CDFs), detects location/shape
    * shifts PSI's coarse bins smear out, and here runs source-vs-
    * source — the "is corpus B length-distributed like corpus A?"
    * check run before admitting a new source into a training mixture.
    *
    * EXACT INTEGER fixed point, no floats anywhere: for pair (a,b)
    * with sizes n_a, n_b, at every distinct length v,
    * |F_a(v) − F_b(v)| = |cum_a(v)·n_b − cum_b(v)·n_a| / (n_a·n_b),
    * so ks_num = max_v |cum_a(v)·n_b − cum_b(v)·n_a| is a BIGINT both
    * engines compute bit-identically, and ks_ppm = ks_num·1e6 div
    * (n_a·n_b) its portable headline. (Headroom: n_a·n_b·1e6 < 2^63
    * up to ~3·10^6 docs per source; past that, ship ks_num and the
    * sizes and let the consumer take the ratio in wide arithmetic.)
    *
    * Scale shape: ONE (source, length)-grain count aggregate over the
    * scan — the only corpus-sized exchange; everything after is
    * VALUE-grain. Each grid row fans out to its (|S|−1) pairs against
    * the broadcast pair table; the per-pair CDF-gap window partitions
    * by pair and orders by length, so its input is bounded by
    * |pairs|·|distinct lengths| — document-length support, not corpus
    * size. At 100 TB the grid is ~|S|·max_len rows: trivially small. */
  /** The (source, length)-grain count grid under q198 — shared with
    * the streaming drift twin ([[graft.streaming.StreamingFraud
    * .ksCountsStream]]): counts are ADDITIVE, so micro-batch partials
    * fold into the same cells partition partials do, and
    * [[ksFromCounts]] over a state snapshot reproduces the full q198
    * pair matrix without re-touching the corpus. */
  def ksCounts(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))

  def ksDrift(s: SparkSession, d: String): DataFrame =
    ksFromCounts(ksCounts(Tables.documents(s, d))
      .localCheckpoint(true)) // grid-sized; read for totals AND both fan-outs

  /** The value-grain KS tail over ANY (source, v, c) grid (batch scan
    * or streaming state snapshot). */
  def ksFromCounts(cnts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ns = cnts.groupBy("source").agg(sum("c").as("n"))
    val pairs = ns.select(col("source").as("sa"), col("n").as("na"))
      .join(ns.select(col("source").as("sb"), col("n").as("nb")),
        col("sa") < col("sb"))
      .localCheckpoint(true) // |S|² rows; frozen so both fan-outs agree
    val da = cnts.join(broadcast(pairs), col("source") === col("sa"))
      .select(col("sa"), col("sb"), col("v"), (col("c") * col("nb")).as("delta"))
    val db = cnts.join(broadcast(pairs), col("source") === col("sb"))
      .select(col("sa"), col("sb"), col("v"), (-col("c") * col("na")).as("delta"))
    da.union(db)
      .groupBy("sa", "sb", "v").agg(sum("delta").as("delta"))
      .withColumn("cum", sum(col("delta")).over(
        Window.partitionBy("sa", "sb").orderBy("v")))
      .groupBy("sa", "sb").agg(max(abs(col("cum"))).as("ks_num"))
      .join(broadcast(pairs), Seq("sa", "sb"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("na").as("n_a"), col("nb").as("n_b"), col("ks_num"),
        expr(s"ks_num * $KsScale div (na * nb)").as("ks_ppm"))
  }

  // Every running/window SUM is CAST BIGINT — DuckDB window sums
  // produce HUGEINT (the q167 lesson, ADVICE r14).
  val ksDriftSql: String =
    s"""WITH c AS (SELECT source, n_chars AS v, count(*) AS c
       |  FROM documents GROUP BY 1, 2),
       |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
       |p AS (SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
       |  FROM n a JOIN n b ON a.source < b.source),
       |d AS (SELECT p.sa, p.sb, c.v, c.c * p.nb AS delta
       |    FROM c JOIN p ON c.source = p.sa
       |  UNION ALL
       |  SELECT p.sa, p.sb, c.v, -(c.c * p.na)
       |    FROM c JOIN p ON c.source = p.sb),
       |g AS (SELECT sa, sb, v, CAST(sum(delta) AS BIGINT) AS delta
       |  FROM d GROUP BY 1, 2, 3),
       |w AS (SELECT sa, sb,
       |  CAST(sum(delta) OVER (PARTITION BY sa, sb ORDER BY v) AS BIGINT) AS cum
       |  FROM g),
       |m AS (SELECT sa, sb, CAST(max(abs(cum)) AS BIGINT) AS ks_num
       |  FROM w GROUP BY 1, 2)
       |SELECT m.sa AS source_a, m.sb AS source_b, p.na AS n_a, p.nb AS n_b,
       |  m.ks_num, CAST(m.ks_num * $KsScale // (p.na * p.nb) AS BIGINT) AS ks_ppm
       |FROM m JOIN p ON m.sa = p.sa AND m.sb = p.sb""".stripMargin
      .replace("\n", " ")

  // ----------------------- Spearman rank correlation (tie-corrected)

  /** q208 — SPEARMAN RANK CORRELATION per language between document
    * length and the stopword-density quality proxy: "are longer docs
    * systematically lower-quality?" as a MONOTONE-association audit.
    * q99 ships Pearson, which only sees LINEAR association and is
    * wrecked by the heavy right tail every length distribution has;
    * Spearman is Pearson on RANKS — outlier-proof, capturing any
    * monotone relation, and the standard correlation for curation
    * signals that live on arbitrary monotone scales.
    *
    * Tie-corrected and integer-exact up to the final expression:
    * average ranks for ties are half-integers, so rows carry DOUBLED
    * ranks r2 = 2·|{v' < v}| + |{v'' = v}| + 1 = rank() + count()
    * under ONE ordered window (the count's default RANGE frame
    * includes peers, so it is |v' ≤ v|). The five comoment sums over
    * are exact BIGINTs (≤ ~5·10¹⁴ at sf1; headroom to ~10⁷ rows per
    * group, past which this op scales its ranks), and rho is ONE
    * fixed double expression tree over them (the q148/q206 ±0-ULP
    * discipline), shipped at 6dp.
    *
    * Scale shape: one scan → ONE (lang) exchange carrying both rank
    * windows and the final per-language aggregate (same partitioning,
    * same sort — Catalyst plans one Sort under both Windows); output
    * is |langs| rows. Languages parallelize; no global window. */
  def spearmanQuality(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stopPred = Seq("the", "a", "of", "and", "is", "to")
      .map(w => s"t = '$w'").mkString(" OR ")
    val sig = Tables.documents(s, d)
      .select(col("lang"), col("n_chars").as("x"),
        expr(s"size(filter(split(text, ' '), t -> $stopPred))").cast("long")
          .as("nstop"),
        expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").cast("long")
          .as("ntok"))
      .select(col("lang"), col("x"),
        expr("nstop * 10000 div greatest(ntok, 1)").as("y"))
    // doubled tie-average rank, one ordered window per signal:
    // r2 = (1+|less|) + (|less|+|eq|) = rank() + count() — the count's
    // default RANGE frame includes peers, so it IS |v' ≤ v|; both
    // functions share the (lang, c) sort, no (lang, c)-keyed exchange
    def rank2(c: String) = {
      val byV = Window.partitionBy("lang").orderBy(col(c))
      (rank().over(byV) + count(lit(1)).over(byV)).cast("long")
    }
    sig
      .withColumn("rx", rank2("x"))
      .withColumn("ry", rank2("y"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum("rx").as("sx"), sum("ry").as("sy"),
        sum(expr("rx * rx")).as("sxx"), sum(expr("ry * ry")).as("syy"),
        sum(expr("rx * ry")).as("sxy"))
      .select(col("lang"), col("n"),
        expr("""round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
          (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
           sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)"""
          .replace("\n", " ")).as("rho6"))
  }

  val spearmanQualitySql: String = {
    val stopPred = Seq("the", "a", "of", "and", "is", "to")
      .map(w => s"t = '$w'").mkString(" OR ")
    s"""WITH sig AS (SELECT lang, n_chars AS x,
       |  len(list_filter(string_split(text, ' '), t -> $stopPred)) * 10000
       |    // greatest(len(regexp_extract_all(text, '[a-z0-9]+')), 1) AS y
       |  FROM documents),
       |r AS (SELECT lang,
       |  CAST(rank() OVER (PARTITION BY lang ORDER BY x)
       |    + count(*) OVER (PARTITION BY lang ORDER BY x) AS BIGINT) AS rx,
       |  CAST(rank() OVER (PARTITION BY lang ORDER BY y)
       |    + count(*) OVER (PARTITION BY lang ORDER BY y) AS BIGINT) AS ry
       |  FROM sig),
       |m AS (SELECT lang, count(*) AS n,
       |  CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
       |  CAST(sum(rx * rx) AS BIGINT) AS sxx, CAST(sum(ry * ry) AS BIGINT) AS syy,
       |  CAST(sum(rx * ry) AS BIGINT) AS sxy FROM r GROUP BY 1)
       |SELECT lang, n,
       |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
       |    (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
       |     sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS rho6
       |FROM m""".stripMargin.replace("\n", " ")
  }

  // --------------------- chi-square independence test (lang × source)

  /** q210 — CHI-SQUARE INDEPENDENCE TEST over the lang × source
    * contingency table, cell-grain: is language composition
    * independent of source? The categorical-association audit that
    * completes the statistics trio (q198 KS: continuous two-sample;
    * q208 Spearman: monotone rank; this: categorical cross-tab) —
    * the mixture-design question behind per-source language quotas
    * (q89/q106) asked as a test instead of a target.
    *
    * Everything up to the final division is EXACT integers off ONE
    * (lang, source) count grid: with margins R (lang total), C
    * (source total), N, the cell statistic is
    * (O·N − R·C)² / (N·R·C) — the DIFFERENCE is an exact BIGINT
    * (headroom to ~10¹⁰ docs at this grid's margins); the square and
    * the division happen in doubles as ONE fixed expression tree per
    * cell (correctly-rounded IEEE ops over identical inputs — the
    * q148 discipline), 6dp ship. Σ contrib6 downstream is the
    * headline χ², and
    * |cells| − |langs| − |sources| + 1 its degrees of freedom.
    *
    * Scale shape: one count exchange, two margin rollups of the GRID
    * (bins-bounded), one broadcast scalar; output is grid-grain. */
  def chiSquareLangSource(s: SparkSession, d: String): DataFrame = {
    val grid = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // grid-sized; feeds margins and the join
    val rTot = grid.groupBy("lang").agg(sum("o").as("r"))
    val cTot = grid.groupBy("source").agg(sum("o").as("c"))
    val n = grid.agg(sum("o").as("n"))
    grid
      .join(broadcast(rTot), "lang")
      .join(broadcast(cTot), "source")
      .crossJoin(broadcast(n))
      .select(col("lang"), col("source"), col("o"),
        expr("r * c * 1000000 div n").as("expected_ppm"),
        expr("round((CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE)) " +
          "/ (CAST(n AS DOUBLE) * r * c), 6)").as("contrib6"))
  }

  val chiSquareLangSourceSql: String =
    s"""WITH grid AS (SELECT lang, source, count(*) AS o
       |  FROM documents GROUP BY 1, 2),
       |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM grid GROUP BY 1),
       |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM grid GROUP BY 1),
       |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM grid)
       |SELECT g.lang, g.source, g.o,
       |  CAST(rt.r * ct.c * 1000000 // nn.n AS BIGINT) AS expected_ppm,
       |  round((CAST(g.o * nn.n - rt.r * ct.c AS DOUBLE)
       |    * CAST(g.o * nn.n - rt.r * ct.c AS DOUBLE))
       |    / (CAST(nn.n AS DOUBLE) * rt.r * ct.c), 6) AS contrib6
       |FROM grid g JOIN rt USING (lang) JOIN ct USING (source)
       |CROSS JOIN nn""".stripMargin.replace("\n", " ")

  // --------------------------------- Benford first-digit audit

  /** log10(1 + 1/d) for d = 1..9, parts-per-million (integer literals
    * so neither engine computes a transcendental). */
  val BenfordPpm = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
    66947L, 57992L, 51153L, 45757L)

  /** q212 — BENFORD'S-LAW FIRST-DIGIT AUDIT over order amounts: the
    * classic forensic-accounting screen (fabricated amounts are
    * uniform-ish in the leading digit; organic multiplicative amounts
    * follow log10(1+1/d)) — squarely in the reference's fraud domain,
    * and the audit run on any numeric feed before trusting it. Per
    * digit d: observed count, Benford-expected count, and the
    * chi-square contribution against the EXACT expectation
    * (o·10⁶ − n·ppm_d)² / (10⁶·n·ppm_d) — difference exact BIGINT
    * (headroom ~10¹² rows), square+division one fixed double tree at
    * 6dp (the q210 cell shape). Leading digit extracted from
    * floor()'d amounts as STRING-OF-INTEGER — floor because
    * double→BIGINT CAST truncates in Spark but ROUNDS in DuckDB (a
    * real cross-engine trap), string because it needs no log10.
    *
    * Scale shape: one conditional-count aggregate over the scan into
    * a 9-row grid; everything after is digit-grain. All nine digits
    * ship (zero-observed included) so the audit can't silently lose a
    * band. */
  def benfordAudit(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val obs = Tables.orders(s, d)
      .filter(col("o_totalprice") >= 1)
      .select(substring(expr("CAST(floor(o_totalprice) AS BIGINT)")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("o"))
    val grid = BenfordPpm.zipWithIndex
      .map { case (p, i) => (i + 1, p) }.toDF("digit", "expected_ppm")
    grid
      .join(obs, Seq("digit"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(obs.agg(sum("o").as("n"))))
      .select(col("digit"), col("o"), col("n"), col("expected_ppm"),
        expr("n * expected_ppm div 1000000").as("expected"),
        expr("round((CAST(o * 1000000 - n * expected_ppm AS DOUBLE) " +
          "* CAST(o * 1000000 - n * expected_ppm AS DOUBLE)) " +
          "/ (1000000.0 * n * expected_ppm), 6)").as("contrib6"))
  }

  val benfordAuditSql: String = {
    val vals = BenfordPpm.zipWithIndex
      .map { case (p, i) => s"(${i + 1}, ${p})" }.mkString(", ")
    s"""WITH obs AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
       |    AS VARCHAR), 1, 1) AS INT) AS digit, count(*) AS o
       |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
       |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
       |grid(digit, expected_ppm) AS (VALUES $vals)
       |SELECT g.digit, CAST(coalesce(obs.o, 0) AS BIGINT) AS o, nn.n,
       |  CAST(g.expected_ppm AS BIGINT) AS expected_ppm,
       |  CAST(nn.n * g.expected_ppm // 1000000 AS BIGINT) AS expected,
       |  round((CAST(coalesce(obs.o, 0) * 1000000 - nn.n * g.expected_ppm AS DOUBLE)
       |    * CAST(coalesce(obs.o, 0) * 1000000 - nn.n * g.expected_ppm AS DOUBLE))
       |    / (1000000.0 * nn.n * g.expected_ppm), 6) AS contrib6
       |FROM grid g LEFT JOIN obs ON obs.digit = g.digit
       |CROSS JOIN nn""".stripMargin.replace("\n", " ")
  }

  /** Per-row constraint-violation flags for the EVENTS table — the
    * shared expression layer under the streaming quality gate
    * ([[graft.streaming.StreamingFraud.qualityGateStream]]) and its
    * batch parity check. One input row explodes to one row per
    * per-row-checkable constraint with a 0/1 violation flag; the
    * consumer aggregates to the constraint grid. Table-level
    * constraints that need cross-row state are deliberately ABSENT
    * here: uniqueness on a stream is unbounded per-key state (that is
    * the dedup family's job — `dropDuplicatesWithinWatermark`), and
    * referential needs the dimension join, both documented in the
    * stream's scaladoc rather than silently approximated. */
  def eventConstraintFlags(events: DataFrame): DataFrame = {
    def f(check: String, colName: String, viol: Column) =
      struct(lit(check).as("check_name"), lit(colName).as("col_name"),
        when(viol, 1L).otherwise(0L).as("v"))
    events.select(explode(array(
      f("completeness", "user_id", col("user_id").isNull),
      f("completeness", "event_type", col("event_type").isNull),
      f("completeness", "value", col("value").isNull),
      f("accepted_values", "event_type", col("event_type").isNull ||
        !col("event_type").isin("click", "error", "purchase", "signup", "view")),
      f("non_negative", "value", col("value") < 0),
      f("ts_bounds", "ts", col("ts").isNull ||
        col("ts") < lit("2024-01-01 00:00:00").cast("timestamp") ||
        col("ts") >= lit("2025-01-01 00:00:00").cast("timestamp"))
    )).as("c")).select(col("c.check_name"), col("c.col_name"), col("c.v"))
  }

  // Uniqueness convention: count(DISTINCT) ignores NULLs on both
  // engines, so dupes = rows − distinct − nulls; NULL keys are already
  // the completeness constraint's violation, not double-counted here.
  val qualityChecksSql: String =
    """WITH m AS (SELECT count(*) AS n_rows,
      |  count(*) FILTER (WHERE o_orderkey IS NULL) AS v_k,
      |  count(*) FILTER (WHERE o_custkey IS NULL) AS v_c,
      |  count(*) FILTER (WHERE o_orderstatus IS NULL) AS v_s,
      |  count(*) FILTER (WHERE o_totalprice IS NULL) AS v_t,
      |  count(*) FILTER (WHERE o_orderdate IS NULL) AS v_d,
      |  count(*) FILTER (WHERE o_orderpriority IS NULL) AS v_p,
      |  count(DISTINCT o_orderkey) AS n_dist,
      |  count(*) FILTER (WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('F','O','P')) AS v_status,
      |  count(*) FILTER (WHERE o_totalprice < 0) AS v_neg,
      |  count(*) FILTER (WHERE o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-')) AS v_prio,
      |  count(*) FILTER (WHERE o_orderdate IS NULL OR CAST(o_orderdate AS DATE) < DATE '1995-01-01' OR CAST(o_orderdate AS DATE) >= DATE '2002-01-01') AS v_date
      |  FROM orders),
      |orph AS (SELECT count(*) AS v_orph FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL),
      |rows_out(check_name, col_name, violations) AS (
      |  SELECT 'completeness', 'o_orderkey', v_k FROM m UNION ALL
      |  SELECT 'completeness', 'o_custkey', v_c FROM m UNION ALL
      |  SELECT 'completeness', 'o_orderstatus', v_s FROM m UNION ALL
      |  SELECT 'completeness', 'o_totalprice', v_t FROM m UNION ALL
      |  SELECT 'completeness', 'o_orderdate', v_d FROM m UNION ALL
      |  SELECT 'completeness', 'o_orderpriority', v_p FROM m UNION ALL
      |  SELECT 'uniqueness', 'o_orderkey', n_rows - n_dist - v_k FROM m UNION ALL
      |  SELECT 'accepted_values', 'o_orderstatus', v_status FROM m UNION ALL
      |  SELECT 'non_negative', 'o_totalprice', v_neg FROM m UNION ALL
      |  SELECT 'pattern', 'o_orderpriority', v_prio FROM m UNION ALL
      |  SELECT 'date_bounds', 'o_orderdate', v_date FROM m UNION ALL
      |  SELECT 'referential', 'o_custkey', v_orph FROM orph UNION ALL
      |  SELECT 'min_size', '*', CASE WHEN n_rows >= 1 THEN 0 ELSE 1 END FROM m)
      |SELECT r.check_name, r.col_name, CAST(r.violations AS BIGINT) AS violations,
      |  m.n_rows AS total_rows,
      |  CAST(CASE WHEN r.violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
      |FROM rows_out r, m""".stripMargin.replace("\n", " ")

  // ------------------- Cohen's kappa between two curation labelers

  /** The q215 stopword type list — the q208 list, reused so the two
    * quality signals describe the same lexicon. */
  val KappaStops = Seq("the", "a", "of", "and", "is", "to")
  val KappaMinStopTypes = 2
  val KappaMinTok = 20L
  val KappaLenLo = 150L
  val KappaLenHi = 450L

  /** q215 — COHEN'S KAPPA between two independent document screens:
    * the cheap length gate (A: `n_chars` in [[KappaLenLo]]..[[KappaLenHi]])
    * and the content gate (B: ≥ [[KappaMinStopTypes]] distinct stopword
    * TYPES present and ≥ [[KappaMinTok]] tokens). Raw agreement is the
    * wrong number when both screens pass most documents — kappa is
    * agreement BEYOND CHANCE, κ = (p_o − p_e)/(1 − p_e), the standard
    * inter-annotator statistic — and the audit run before replacing an
    * expensive filter with a cheap proxy (κ ≈ 1: proxy safe; κ ≈ 0:
    * the screens agree only as often as independent coins would).
    *
    * EXACT integers to the last step: the 2×2 confusion cells
    * (n11, n10, n01, n00) come from ONE conditional-count aggregate;
    * with N = Σcells, p_o·N = n11+n00 and p_e·N² =
    * (n11+n10)(n11+n01) + (n01+n00)(n10+n00) are BIGINTs (headroom
    * ~3·10⁹ docs), so κ = (N·po_num − pe_num)/(N² − pe_num) is one
    * fixed double division at 6dp (the q210 discipline), and
    * po_ppm/pe_ppm ship as exact integer div ratios alongside.
    *
    * Scale shape: one full scan into a single 1-row aggregate —
    * map-side partial counts, one scalar exchange; output is one row.
    * Stopword-type membership is six array_contains flags (no
    * distinct-intersection list op: the 6-term sum is codegen'd and
    * engine-portable). */
  def kappaLabelers(s: SparkSession, d: String): DataFrame = {
    // split ONCE into a projected column — six array_contains over the
    // same split would otherwise re-tokenize the text six times (no
    // CSE across when-branches; measured 17× for 10× data before this)
    val stopTypes = KappaStops
      .map(w => when(array_contains(col("toks"), w), 1L).otherwise(0L))
      .reduce(_ + _)
    val flags = Tables.documents(s, d)
      .select(col("n_chars"), split(col("text"), " ").as("toks"),
        expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").as("ntok"))
      .select(
        (col("n_chars") >= KappaLenLo && col("n_chars") <= KappaLenHi).as("pa"),
        (stopTypes >= KappaMinStopTypes && col("ntok") >= KappaMinTok)
          .as("pb"))
    def cell(a: Boolean, b: Boolean, n: String) =
      sum(when(col("pa") === a && col("pb") === b, 1L).otherwise(0L)).as(n)
    flags
      .agg(cell(true, true, "n11"), cell(true, false, "n10"),
        cell(false, true, "n01"), cell(false, false, "n00"))
      .select(col("n11"), col("n10"), col("n01"), col("n00"),
        (col("n11") + col("n10") + col("n01") + col("n00")).as("n"),
        ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
         (col("n01") + col("n00")) * (col("n10") + col("n00"))).as("pe_num"))
      .select(col("n11"), col("n10"), col("n01"), col("n00"), col("n"),
        expr("(n11 + n00) * 1000000 div n").as("po_ppm"),
        expr("pe_num * 1000000 div (n * n)").as("pe_ppm"),
        expr("round(CAST(n * (n11 + n00) - pe_num AS DOUBLE) " +
          "/ CAST(n * n - pe_num AS DOUBLE), 6)").as("kappa6"))
  }

  val kappaLabelersSql: String = {
    val stopTypes = KappaStops
      .map(w => s"CASE WHEN list_contains(string_split(text, ' '), '$w') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH f AS (SELECT
       |  n_chars >= $KappaLenLo AND n_chars <= $KappaLenHi AS pa,
       |  ($stopTypes) >= $KappaMinStopTypes
       |    AND len(regexp_extract_all(text, '[a-z0-9]+')) >= $KappaMinTok AS pb
       |  FROM documents),
       |c AS (SELECT
       |  CAST(count(*) FILTER (WHERE pa AND pb) AS BIGINT) AS n11,
       |  CAST(count(*) FILTER (WHERE pa AND NOT pb) AS BIGINT) AS n10,
       |  CAST(count(*) FILTER (WHERE NOT pa AND pb) AS BIGINT) AS n01,
       |  CAST(count(*) FILTER (WHERE NOT pa AND NOT pb) AS BIGINT) AS n00
       |  FROM f),
       |m AS (SELECT *, n11 + n10 + n01 + n00 AS n,
       |  (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS pe_num
       |  FROM c)
       |SELECT n11, n10, n01, n00, n,
       |  CAST((n11 + n00) * 1000000 // n AS BIGINT) AS po_ppm,
       |  CAST(pe_num * 1000000 // (n * n) AS BIGINT) AS pe_ppm,
       |  round(CAST(n * (n11 + n00) - pe_num AS DOUBLE)
       |    / CAST(n * n - pe_num AS DOUBLE), 6) AS kappa6
       |FROM m""".stripMargin.replace("\n", " ")
  }

  // -------------- Mann–Whitney U test between source pairs (lengths)

  /** q216 — MANN–WHITNEY U between every source pair over document
    * length: the rank-sum LOCATION test that completes q198's KS.
    * KS's supremum-gap statistic reacts to ANY distribution
    * difference (shape, variance, location) — this one asks the
    * sharper curation question "does source B run systematically
    * LONGER than A?", is distribution-free, and with the normal
    * approximation gives a comparable z across pairs of very
    * different sizes.
    *
    * EXACT integers off the SAME (source, length, count) grid as
    * q198 ([[ksCounts]]): for pair (a,b), the DOUBLED U of side a is
    * u2_a = Σ_v ca(v)·(2·cumb(v) − cb(v)) (cumb inclusive running sum
    * of b's counts in length order — ties contribute cb/2 each, hence
    * the doubling; the q208 doubled-rank discipline). The tie term
    * T = Σ_v (t³ − t) over combined counts t = ca+cb is BIGINT too
    * (headroom: T < n³ caps at ~2·10⁶ rows per pair; past that ship
    * the integers and divide in wide arithmetic downstream). The only
    * double is the final z6 = (u2_a − na·nb) / (2·σ) with the
    * tie-corrected σ² = na·nb/12·((n+1) − T/(n(n−1))) — ONE fixed
    * expression tree, 6dp (no continuity correction: a convention
    * choice made identically on both engines).
    *
    * Scale shape: inherits q198's — one corpus-grain count aggregate,
    * then everything is VALUE-grain (|pairs| × length-support rows);
    * the per-pair running sum partitions by pair. At 100 TB the grid
    * is ~|S|·max_len rows: trivially small. */
  def mannWhitneyDrift(s: SparkSession, d: String): DataFrame =
    mwuFromCounts(ksCounts(Tables.documents(s, d)).localCheckpoint(true))

  /** The value-grain MWU tail over ANY (source, v, c) grid — shares
    * [[ksCounts]] with q198 and the streaming drift twin, so one
    * state snapshot answers both "has it drifted?" (KS) and "which
    * way does it lean?" (U/z). */
  def mwuFromCounts(cnts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ns = cnts.groupBy("source").agg(sum("c").as("n"))
    val pairs = ns.select(col("source").as("sa"), col("n").as("na"))
      .join(ns.select(col("source").as("sb"), col("n").as("nb")),
        col("sa") < col("sb"))
      .localCheckpoint(true) // |S|² rows; frozen so both fan-outs agree
    val da = cnts.join(broadcast(pairs), col("source") === col("sa"))
      .select(col("sa"), col("sb"), col("v"), col("c").as("ca"), lit(0L).as("cb"))
    val db = cnts.join(broadcast(pairs), col("source") === col("sb"))
      .select(col("sa"), col("sb"), col("v"), lit(0L).as("ca"), col("c").as("cb"))
    da.union(db)
      .groupBy("sa", "sb", "v")
      .agg(sum("ca").as("ca"), sum("cb").as("cb"))
      .withColumn("cumb", sum(col("cb")).over(
        Window.partitionBy("sa", "sb").orderBy("v")))
      .groupBy("sa", "sb")
      .agg(
        sum(expr("ca * (2 * cumb - cb)")).as("u2_a"),
        sum(expr("(ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)")).as("tie_t"))
      .join(broadcast(pairs), Seq("sa", "sb"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("na").as("n_a"), col("nb").as("n_b"), col("u2_a"), col("tie_t"),
        expr(mwuZExpr("u2_a", "na", "nb", "tie_t")).as("z6"))
  }

  /** The shared z expression — identical operation tree on both
    * engines (doubles only, no integer division), column names passed
    * in so each engine's qualified references slot in. */
  private def mwuZExpr(u2: String, na: String, nb: String, t: String): String =
    s"round(CAST($u2 - $na * $nb AS DOUBLE) / " +
      s"(2.0 * sqrt(CAST($na AS DOUBLE) * CAST($nb AS DOUBLE) / 12.0 * " +
      s"((CAST($na + $nb AS DOUBLE) + 1.0) - CAST($t AS DOUBLE) / " +
      s"(CAST($na + $nb AS DOUBLE) * (CAST($na + $nb AS DOUBLE) - 1.0))))), 6)"

  val mannWhitneyDriftSql: String =
    s"""WITH c AS (SELECT source, n_chars AS v, count(*) AS c
       |  FROM documents GROUP BY 1, 2),
       |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
       |p AS (SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
       |  FROM n a JOIN n b ON a.source < b.source),
       |d AS (SELECT p.sa, p.sb, c.v, c.c AS ca, CAST(0 AS BIGINT) AS cb
       |    FROM c JOIN p ON c.source = p.sa
       |  UNION ALL
       |  SELECT p.sa, p.sb, c.v, CAST(0 AS BIGINT), c.c
       |    FROM c JOIN p ON c.source = p.sb),
       |g AS (SELECT sa, sb, v, CAST(sum(ca) AS BIGINT) AS ca,
       |  CAST(sum(cb) AS BIGINT) AS cb FROM d GROUP BY 1, 2, 3),
       |w AS (SELECT sa, sb, ca, cb,
       |  CAST(sum(cb) OVER (PARTITION BY sa, sb ORDER BY v) AS BIGINT) AS cumb
       |  FROM g),
       |u AS (SELECT sa, sb, CAST(sum(ca * (2 * cumb - cb)) AS BIGINT) AS u2_a,
       |  CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS BIGINT) AS tie_t
       |  FROM w GROUP BY 1, 2)
       |SELECT u.sa AS source_a, u.sb AS source_b, p.na AS n_a, p.nb AS n_b,
       |  u.u2_a, u.tie_t,
       |  ${mwuZExpr("u.u2_a", "p.na", "p.nb", "u.tie_t")} AS z6
       |FROM u JOIN p ON u.sa = p.sa AND u.sb = p.sb"""
      .stripMargin.replace("\n", " ")

  // -------------------- one-way ANOVA F over source length means

  /** q229 — ONE-WAY ANOVA F-statistic for document length across
    * sources: the parametric member of the drift quartet (q198 KS:
    * any-shape two-sample; q216 MWU: pairwise location; q210 χ²:
    * categorical; this: do the k source MEANS differ at all, in one
    * number?) — the omnibus test run before pairwise drilling, so a
    * fleet of sources is monitored with ONE statistic instead of
    * C(k,2) pair alarms.
    *
    * Integer discipline: per-source moments (n_g, Σx, Σx²) are exact
    * BIGINTs; the between/within sums of squares use the identity
    * SSB = Σ_g Sg²/n_g − S²/N and SSW = Σ_g (Qg − Sg²/n_g) with each
    * Sg²/n_g taken as EXACT INTEGER DIV — the truncation is < 1 char²
    * per group (< k total, documented), and critically the group SUM
    * is an integer sum, so no float accumulates in any order. F6 is
    * then ONE fixed double tree over (ssb_num, ssw_num, k, N).
    * Headroom: Sg² < 2⁶³ caps a source at ~3·10⁹ chars (~3 GB of
    * text); past that ship the per-group moments and divide in wide
    * arithmetic downstream (the q198 convention).
    *
    * Scale shape: ONE (source) moment aggregate over the scan;
    * everything after is k-row grid math. Output is one row. */
  def anovaLength(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_g"), sum("n_chars").as("s_g"),
        sum(expr("n_chars * n_chars")).as("q_g"))
      .agg(count(lit(1)).as("k"), sum("n_g").as("n"), sum("s_g").as("s"),
        sum(expr("s_g * s_g div n_g")).as("sb_part"),
        sum(expr("q_g - s_g * s_g div n_g")).as("ssw_num"))
      .select(col("k"), col("n"),
        (col("sb_part") - expr("s * s div n")).as("ssb_num"), col("ssw_num"))
      .select(col("k"), col("n"), col("ssb_num"), col("ssw_num"),
        expr(AnovaFExpr).as("f6"))
  }

  // Shared double tree — identical text on both engines.
  private val AnovaFExpr: String =
    "round((CAST(ssb_num AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0)) / " +
      "(CAST(ssw_num AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)"

  val anovaLengthSql: String =
    s"""WITH g AS (SELECT source, count(*) AS n_g,
       |  CAST(sum(n_chars) AS BIGINT) AS s_g,
       |  CAST(sum(n_chars * n_chars) AS BIGINT) AS q_g
       |  FROM documents GROUP BY 1),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
       |  CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(s_g) AS BIGINT) AS s,
       |  CAST(sum(s_g * s_g // n_g) AS BIGINT) AS sb_part,
       |  CAST(sum(q_g - s_g * s_g // n_g) AS BIGINT) AS ssw_num FROM g),
       |f AS (SELECT k, n, sb_part - s * s // n AS ssb_num, ssw_num FROM m)
       |SELECT k, n, ssb_num, ssw_num, $AnovaFExpr AS f6
       |FROM f""".stripMargin.replace("\n", " ")

  // ------------------------- trimmed mean per source (robust center)

  /** q230 trim fraction: drop the bottom and top [[TrimPct]]% by
    * rank. */
  val TrimPct = 5L

  /** q230 — TRIMMED MEAN of document length per source: the robust
    * center that pairs with q93's MAD outlier screen — a mean that a
    * few megadocs cannot drag (exactly the failure q224's Gini
    * measures the extent of). Per source, rows ranked by (length,
    * doc_id); the bottom and top [[TrimPct]]% by COUNT (lo = n·pct
    * div 100, exact integer — both engines truncate identically) are
    * excluded and the mean of the rest ships in exact milli-chars.
    *
    * Scale shape: the q224 posture — ONE (source) exchange carries
    * the rank window and the aggregate; output is |sources| rows. */
  def trimmedMeanLength(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLen = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    val whole = Window.partitionBy("source")
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("r", row_number().over(byLen).cast("long"))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("lo", expr(s"n * $TrimPct div 100"))
      .groupBy("source")
      .agg(max("n").as("n"), sum("n_chars").as("sum_all"),
        sum(when(col("r") > col("lo") && col("r") <= col("n") - col("lo"),
          col("n_chars")).otherwise(0L)).as("sum_kept"),
        sum(when(col("r") > col("lo") && col("r") <= col("n") - col("lo"), 1L)
          .otherwise(0L)).as("n_kept"))
      .select(col("source"), col("n"), col("n_kept"),
        expr("sum_all * 1000 div n").as("mean_milli"),
        expr("sum_kept * 1000 div n_kept").as("trimmed_mean_milli"))
  }

  val trimmedMeanLengthSql: String =
    s"""WITH r AS (SELECT source, n_chars,
       |  CAST(row_number() OVER (PARTITION BY source
       |    ORDER BY n_chars, doc_id) AS BIGINT) AS r,
       |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM documents),
       |t AS (SELECT source, n_chars, r, n, n * $TrimPct // 100 AS lo FROM r)
       |SELECT source, CAST(max(n) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN r > lo AND r <= n - lo THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_kept,
       |  CAST(sum(n_chars) * 1000 // max(n) AS BIGINT) AS mean_milli,
       |  CAST(sum(CASE WHEN r > lo AND r <= n - lo THEN n_chars ELSE 0 END)
       |    * 1000 // sum(CASE WHEN r > lo AND r <= n - lo THEN 1 ELSE 0 END)
       |    AS BIGINT) AS trimmed_mean_milli
       |FROM t GROUP BY source""".stripMargin.replace("\n", " ")

  // ----------------- seasonal-naive forecast backtest (model pick)

  /** q240 — SEASONAL-NAIVE BACKTEST over daily volume per event type:
    * compare the two zero-parameter forecasters every capacity model
    * must beat — naive (tomorrow = today) and seasonal-naive
    * (tomorrow = same weekday last week) — by exact sum of absolute
    * errors over the backtest days where BOTH have a forecast. The
    * winner column is the model-selection evidence: a weekly-seasonal
    * feed picks lag-7, a trending one picks lag-1, and "which baseline
    * wins" is the first question before fitting anything richer
    * (q226's OLS slope is the trend member of this family).
    *
    * Lags are POSITIONAL over observed days (documented: a gap day
    * shifts the season; compose with q176's gap-fill when calendar
    * lags must be exact). All integers: sae sums, n_eval, winner by
    * comparison; mae ships ×1000 by exact div.
    *
    * Scale shape: one (type, day) count aggregate, one (type)-keyed
    * double-lag window, one (type) aggregate sharing the exchange. */
  /** q264 MAD alarm factor: |residual| > [[SeasonalK]]·MAD flags. */
  val SeasonalK = 4L

  /** q264 — WEEKDAY-SEASONAL RESIDUAL OUTLIERS: flag the days whose
    * event volume is anomalous RELATIVE TO THEIR WEEKDAY, not to the
    * overall level — the decomposition q240's backtest justified
    * (seasonal-naive beats naive ⟹ weekday structure is real, so a
    * Monday must be judged against Mondays). Per (type, weekday):
    * exact lower-median of daily counts; residual = count − median;
    * robust scale = lower-median |residual| over the type (the q93
    * MAD move, seasonal-adjusted); alarm when |resid| > [[SeasonalK]]
    * ·MAD. Catches the holiday dip a global 3σ gate calls normal and
    * ignores the weekend trough a global gate calls an outage.
    *
    * All exact: medians are order statistics on the calendar-bounded
    * grid; residuals and the K·MAD compare are integer arithmetic.
    *
    * Scale shape: one (type, day) count aggregate; the weekday
    * medians, MAD, and flags are windows over the ≤ types·days grid
    * (calendar-bounded — constant work at any SF, the q251 read). */
  def seasonalOutliers(s: SparkSession, d: String): DataFrame =
    seasonalOutliersFromCounts(typeDayCounts(Tables.events(s, d)))

  /** The ADDITIVE (event_type, day) count grid shared by q240, q251
    * and q264 — and the whole state of the streaming twin
    * ([[graft.streaming.StreamingFraud.typeDayCountsStream]]): a
    * snapshot replays all three registered tables exactly without
    * re-touching the events (StreamingFraudSpec pins q264's). */
  def typeDayCounts(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))

  def seasonalOutliersFromCounts(dailyIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = dailyIn
      .withColumn("wd", dayofweek(col("day")).cast("long"))
      .localCheckpoint(true) // calendar grid; feeds 3 window passes
    val byWd = Window.partitionBy("event_type", "wd")
    val medWd = daily
      .withColumn("rk", row_number().over(byWd.orderBy(col("x"), col("day")))
        .cast("long"))
      .withColumn("n", count(lit(1)).over(byWd))
      .groupBy("event_type", "wd")
      .agg(min(when(col("rk") * 2 >= col("n"), col("x"))).as("wd_median"))
    val resid = daily.join(medWd, Seq("event_type", "wd"))
      .withColumn("resid", col("x") - col("wd_median"))
    val byType = Window.partitionBy("event_type")
    val mad = resid
      .withColumn("ark", row_number().over(byType.orderBy(abs(col("resid")),
        col("day"))).cast("long"))
      .withColumn("an", count(lit(1)).over(byType))
      .groupBy("event_type")
      .agg(min(when(col("ark") * 2 >= col("an"), abs(col("resid"))))
        .as("mad"))
    resid.join(mad, "event_type")
      .filter(abs(col("resid")) > lit(SeasonalK) * greatest(col("mad"), lit(1L)))
      .select(col("event_type"), col("day"), col("wd"), col("x"),
        col("wd_median"), col("resid"), col("mad"))
  }

  val seasonalOutliersSql: String =
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |  CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
       |wdd AS (SELECT *, CAST(dayofweek(day) + 1 AS BIGINT) AS wd FROM daily),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type, wd
       |    ORDER BY x, day) AS BIGINT) AS rk,
       |  CAST(count(*) OVER (PARTITION BY event_type, wd) AS BIGINT) AS n
       |  FROM wdd),
       |md AS (SELECT event_type, wd,
       |  min(CASE WHEN rk * 2 >= n THEN x END) AS wd_median
       |  FROM r GROUP BY 1, 2),
       |res AS (SELECT wdd.event_type, wdd.day, wdd.wd, wdd.x, md.wd_median,
       |  wdd.x - md.wd_median AS resid
       |  FROM wdd JOIN md ON md.event_type = wdd.event_type AND md.wd = wdd.wd),
       |ar AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
       |    ORDER BY abs(resid), day) AS BIGINT) AS ark,
       |  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS an
       |  FROM res),
       |mad AS (SELECT event_type,
       |  CAST(min(CASE WHEN ark * 2 >= an THEN abs(resid) END) AS BIGINT) AS mad
       |  FROM ar GROUP BY 1)
       |SELECT res.event_type, res.day, res.wd, res.x, res.wd_median,
       |  res.resid, mad.mad
       |FROM res JOIN mad ON mad.event_type = res.event_type
       |WHERE abs(res.resid) > $SeasonalK * greatest(mad.mad, 1)"""
      .stripMargin.replace("\n", " ")

  def seasonalBacktest(s: SparkSession, d: String): DataFrame =
    seasonalBacktestFromCounts(typeDayCounts(Tables.events(s, d)))

  def seasonalBacktestFromCounts(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("f1", lag(col("x"), 1).over(w))
      .withColumn("f7", lag(col("x"), 7).over(w))
      .filter(col("f7").isNotNull) // f1 exists wherever f7 does
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("x") - col("f1"))).as("sae_naive"),
        sum(abs(col("x") - col("f7"))).as("sae_seasonal"))
      .select(col("event_type"), col("n_eval"),
        col("sae_naive"), col("sae_seasonal"),
        expr("sae_naive * 1000 div n_eval").as("mae_naive_milli"),
        expr("sae_seasonal * 1000 div n_eval").as("mae_seasonal_milli"),
        when(col("sae_seasonal") < col("sae_naive"), "seasonal")
          .when(col("sae_seasonal") > col("sae_naive"), "naive")
          .otherwise("tie").as("winner"))
  }

  val seasonalBacktestSql: String =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |  CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
      |l AS (SELECT event_type, x,
      |  lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS f1,
      |  lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS f7
      |  FROM daily),
      |a AS (SELECT event_type, count(*) AS n_eval,
      |  CAST(sum(abs(x - f1)) AS BIGINT) AS sae_naive,
      |  CAST(sum(abs(x - f7)) AS BIGINT) AS sae_seasonal
      |  FROM l WHERE f7 IS NOT NULL GROUP BY 1)
      |SELECT event_type, n_eval, sae_naive, sae_seasonal,
      |  CAST(sae_naive * 1000 // n_eval AS BIGINT) AS mae_naive_milli,
      |  CAST(sae_seasonal * 1000 // n_eval AS BIGINT) AS mae_seasonal_milli,
      |  CASE WHEN sae_seasonal < sae_naive THEN 'seasonal'
      |       WHEN sae_seasonal > sae_naive THEN 'naive'
      |       ELSE 'tie' END AS winner
      |FROM a""".stripMargin.replace("\n", " ")

  // ------------------- functional-dependency audit (g3 violations)

  /** q228 — FUNCTIONAL-DEPENDENCY AUDIT over a fixed candidate
    * catalog: for each A → B candidate, the g₃ violation count —
    * the MINIMUM rows to delete so the FD holds, Σ_a (n_a −
    * max_b n_{a,b}) — plus the determinant cardinality and the holds
    * verdict. This is the data-profiling primitive (Metanome/
    * Papenbrock lineage) behind schema inference, normalization
    * advice, and "is this column derivable?" pruning decisions; as a
    * QUALITY gate it catches referential rot the q145 constraint
    * suite can't express (a dependency that held silently until an
    * upstream merge broke it).
    *
    * Catalog: documents lang→source and source→lang (both directions
    * of the same grid — association ≠ dependency, and the asymmetry
    * IS the finding), orders o_orderstatus→o_orderpriority and
    * o_custkey→o_orderstatus. All counts exact BIGINTs (FLOAT RULE).
    *
    * Scale shape: one (A,B) count grid per candidate pair — the
    * documents pair SHARES one grid for both directions; per-A max
    * and sum are grid-grain aggregates. Grids are value-space-
    * bounded except custkey's (|customers| rows — still one exchange,
    * map-side partials, never row-grain after it). */
  def fdAudit(s: SparkSession, d: String): DataFrame = {
    def g3(grid: DataFrame, tbl: String, det: String, dep: String,
           a: String, b: String): DataFrame =
      grid
        .groupBy(col(a))
        .agg(sum("c").as("n_a"), max("c").as("max_b"))
        .agg(count(lit(1)).as("n_det"), sum("n_a").as("n_rows"),
          sum(col("n_a") - col("max_b")).as("violations"))
        .select(lit(tbl).as("tbl"), lit(det).as("det"), lit(dep).as("dep"),
          col("n_rows"), col("n_det"), col("violations"),
          when(col("violations") === 0, 1L).otherwise(0L).as("holds"))
    val docGrid = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // grid-sized; feeds both directions
    val stGrid = Tables.orders(s, d)
      .groupBy("o_orderstatus", "o_orderpriority").agg(count(lit(1)).as("c"))
    val ckGrid = Tables.orders(s, d)
      .groupBy("o_custkey", "o_orderstatus").agg(count(lit(1)).as("c"))
    g3(docGrid, "documents", "lang", "source", "lang", "source")
      .unionAll(g3(docGrid.select(col("source"), col("lang"), col("c")),
        "documents", "source", "lang", "source", "lang"))
      .unionAll(g3(stGrid, "orders", "o_orderstatus", "o_orderpriority",
        "o_orderstatus", "o_orderpriority"))
      .unionAll(g3(ckGrid, "orders", "o_custkey", "o_orderstatus",
        "o_custkey", "o_orderstatus"))
  }

  val fdAuditSql: String = {
    def g3(src: String, a: String, b: String, tbl: String): String =
      s"""SELECT '$tbl' AS tbl, '$a' AS det, '$b' AS dep,
         |  CAST(sum(n_a) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_det,
         |  CAST(sum(n_a - max_b) AS BIGINT) AS violations,
         |  CAST(CASE WHEN sum(n_a - max_b) = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
         |FROM (SELECT $a, CAST(sum(c) AS BIGINT) AS n_a,
         |      CAST(max(c) AS BIGINT) AS max_b
         |  FROM (SELECT $a, $b, count(*) AS c FROM $src GROUP BY 1, 2)
         |  GROUP BY 1)""".stripMargin.replace("\n", " ")
    Seq(
      g3("documents", "lang", "source", "documents"),
      g3("documents", "source", "lang", "documents"),
      g3("orders", "o_orderstatus", "o_orderpriority", "orders"),
      g3("orders", "o_custkey", "o_orderstatus", "orders")
    ).mkString(" UNION ALL ")
  }

  // ------------------ jackknife source influence on the corpus mean

  /** q225 — JACKKNIFE (leave-one-source-out) influence of every
    * source on the corpus mean document length: how far does the
    * mean move if a source is dropped? The cheap data-valuation
    * screen that complements q207's full curation ablation — q207
    * re-runs the dedup pipeline per held-out source (expensive,
    * exact); this one answers the first-order question from ONE
    * grid of per-source sums, which is what you consult before
    * paying for the full ablation. The same table is the jackknife
    * variance estimate of the corpus mean — the error bar every
    * "mean doc length = X" report should carry.
    *
    * EXACT integers (FLOAT RULE): per source, the LOO mean ships as
    * milli-chars by exact div — loo_mean_milli = (ΣX − x_s)·10³ div
    * (N − n_s) — and influence_milli = loo_mean_milli −
    * full_mean_milli is the signed displacement. Headroom: Σchars·10³
    * < 2⁶³ to ~9·10¹⁵ chars (≈ 9 PB of text); past that divide in
    * wide arithmetic downstream.
    *
    * Scale shape: ONE (source) count/sum aggregate over the scan;
    * totals broadcast back onto the |sources|-row grid. Nothing
    * after the aggregate is data-sized. */
  def jackknifeSources(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_s"), sum("n_chars").as("chars_s"))
      .localCheckpoint(true) // grid-sized; feeds totals AND the output
    val tot = per.agg(sum("n_s").as("n"), sum("chars_s").as("chars"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"), col("chars_s"),
        expr("(chars - chars_s) * 1000 div (n - n_s)").as("loo_mean_milli"),
        expr("(chars - chars_s) * 1000 div (n - n_s) - chars * 1000 div n")
          .as("influence_milli"))
  }

  val jackknifeSourcesSql: String =
    """WITH per AS (SELECT source, count(*) AS n_s,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_s
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(n_s) AS BIGINT) AS n,
      |  CAST(sum(chars_s) AS BIGINT) AS chars FROM per)
      |SELECT source, n_s, chars_s,
      |  CAST((chars - chars_s) * 1000 // (n - n_s) AS BIGINT) AS loo_mean_milli,
      |  CAST((chars - chars_s) * 1000 // (n - n_s) - chars * 1000 // n
      |    AS BIGINT) AS influence_milli
      |FROM per CROSS JOIN t""".stripMargin.replace("\n", " ")

  // --------------------------- OLS trend over daily event volume

  /** q226 — ORDINARY-LEAST-SQUARES TREND of daily event volume: the
    * slope/intercept line through (day index, count) — the monotone
    * drift detector that pairs with q217's CUSUM (CUSUM says WHEN the
    * level shifted; the OLS slope says the sustained RATE of growth
    * or decay, the number capacity planning actually consumes).
    *
    * EXACT integers to the last step: day index t = days since the
    * first observed day (exact int on both engines), and the five
    * moments (n, Σt, Σx, Σt², Σtx) are BIGINTs, so slope_num =
    * n·Σtx − Σt·Σx and slope_den = n·Σt² − (Σt)² are exact — ships
    * with slope6/intercept6 as one fixed double tree each (6dp, the
    * q208 discipline). Headroom: t ≤ 10⁴ days, counts ≤ 10¹⁰/day
    * before Σtx presses 2⁶³.
    *
    * Scale shape: ONE day-grain count aggregate (the q217 grid,
    * map-side partials), min-day broadcast onto the bounded grid,
    * one scalar aggregate; output is ONE row. */
  def olsDailyTrend(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCounts(Tables.events(s, d))
      .localCheckpoint(true) // grid-sized; feeds min-day AND the moments
    val d0 = daily.agg(min("day").as("d0"))
    daily.crossJoin(broadcast(d0))
      .select(datediff(col("day"), col("d0")).cast("long").as("t"), col("x"))
      .agg(count(lit(1)).as("n"), sum("t").as("st"), sum("x").as("sx"),
        sum(expr("t * t")).as("stt"), sum(expr("t * x")).as("stx"))
      .select(col("n"), col("st"), col("sx"), col("stt"), col("stx"),
        (col("n") * col("stx") - col("st") * col("sx")).as("slope_num"),
        (col("n") * col("stt") - col("st") * col("st")).as("slope_den"))
      .select(col("n"), col("slope_num"), col("slope_den"),
        expr(OlsSlopeExpr).as("slope6"), expr(OlsInterceptExpr).as("intercept6"))
  }

  // Shared double trees — identical text on both engines.
  private val OlsSlopeExpr =
    "round(CAST(slope_num AS DOUBLE) / CAST(slope_den AS DOUBLE), 6)"
  private val OlsInterceptExpr =
    "round((CAST(sx AS DOUBLE) * CAST(slope_den AS DOUBLE) - " +
      "CAST(slope_num AS DOUBLE) * CAST(st AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(slope_den AS DOUBLE)), 6)"

  val olsDailyTrendSql: String =
    s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS x
       |  FROM events GROUP BY 1),
       |d0 AS (SELECT min(day) AS d0 FROM daily),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(t) AS BIGINT) AS st, CAST(sum(x) AS BIGINT) AS sx,
       |  CAST(sum(t * t) AS BIGINT) AS stt, CAST(sum(t * x) AS BIGINT) AS stx
       |  FROM (SELECT CAST(datediff('day', d0, day) AS BIGINT) AS t, x
       |        FROM daily CROSS JOIN d0)),
       |k AS (SELECT *, n * stx - st * sx AS slope_num,
       |  n * stt - st * st AS slope_den FROM m)
       |SELECT n, slope_num, slope_den,
       |  $OlsSlopeExpr AS slope6, $OlsInterceptExpr AS intercept6
       |FROM k""".stripMargin.replace("\n", " ")

  // ---------------- Simpson's-paradox screen over per-type slopes

  /** q248 — SIMPSON'S-PARADOX SCREEN: per event type, the OLS slope
    * of event VALUE on HOUR-OF-DAY, against the same slope POOLED
    * over all types — flagging types whose trend sign OPPOSES the
    * pooled trend. The pooled line is what a dashboard shows; when
    * event-type mix varies by hour (it does — that's the point of
    * the screen), the pooled slope can carry a sign NO subgroup has
    * (Simpson 1951), and every per-type flip this emits is a
    * subgroup the aggregate actively misrepresents. The q207/q225
    * lesson at the statistics layer: aggregates mislead; decompose
    * before acting.
    *
    * EXACT integers: y in deci-units (round(value·10) — one
    * correctly-rounded multiply+round both engines share), x = hour
    * ∈ [0,23]; the five moments per type are BIGINTs and the pooled
    * moments are their SUMS (moments are additive — the pooled line
    * needs no second scan). slope_num = n·Σxy − Σx·Σy exact; the
    * FLIP is sign arithmetic on the two exact numerators (slope_den
    * > 0 always), so the flag never touches a float. slope6/pooled6
    * are the q226 double tree. Headroom: deci-units keep n·Σxy under
    * 2⁶³ to ~10⁷ events of value ≤ 500; past that, DECIMAL moments.
    *
    * Scale shape: ONE scan → |types|-bounded moment aggregate
    * (map-side partials); pooling and flip logic are grid math on ≤
    * |types| rows. Output is |types| rows. */
  def simpsonSlopes(s: SparkSession, d: String): DataFrame = {
    val perType = Tables.events(s, d)
      .select(col("event_type"),
        hour(col("ts")).cast("long").as("x"),
        expr("CAST(round(value * 10) AS BIGINT)").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
      .localCheckpoint(true) // |types| rows; feeds the pooled fold too
    val pooled = perType
      .agg(sum("n").as("pn"), sum("sx").as("psx"), sum("sy").as("psy"),
        sum("sxx").as("psxx"), sum("sxy").as("psxy"))
      .select((col("pn") * col("psxy") - col("psx") * col("psy"))
        .as("pooled_num"),
        (col("pn") * col("psxx") - col("psx") * col("psx")).as("pooled_den"))
    perType.crossJoin(broadcast(pooled))
      .select(col("event_type"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
        col("pooled_num"), col("pooled_den"))
      .select(col("event_type"), col("n"), col("slope_num"),
        expr(OlsSlopeExpr).as("slope6"),
        expr("round(CAST(pooled_num AS DOUBLE) / CAST(pooled_den AS DOUBLE), 6)")
          .as("pooled_slope6"),
        expr("CAST(CASE WHEN sign(slope_num) * sign(pooled_num) < 0 " +
          "THEN 1 ELSE 0 END AS BIGINT)").as("flip"))
  }

  val simpsonSlopesSql: String =
    s"""WITH e AS (SELECT event_type,
       |  CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
       |  CAST(round(value * 10) AS BIGINT) AS y FROM events),
       |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |  CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
       |  FROM e GROUP BY 1),
       |p AS (SELECT CAST(sum(n) AS BIGINT) * CAST(sum(sxy) AS BIGINT)
       |    - CAST(sum(sx) AS BIGINT) * CAST(sum(sy) AS BIGINT) AS pooled_num,
       |  CAST(sum(n) AS BIGINT) * CAST(sum(sxx) AS BIGINT)
       |    - CAST(sum(sx) AS BIGINT) * CAST(sum(sx) AS BIGINT) AS pooled_den
       |  FROM t),
       |k AS (SELECT event_type, n, n * sxy - sx * sy AS slope_num,
       |  n * sxx - sx * sx AS slope_den, pooled_num, pooled_den
       |  FROM t CROSS JOIN p)
       |SELECT event_type, n, slope_num, $OlsSlopeExpr AS slope6,
       |  round(CAST(pooled_num AS DOUBLE) / CAST(pooled_den AS DOUBLE), 6)
       |    AS pooled_slope6,
       |  CAST(CASE WHEN sign(slope_num) * sign(pooled_num) < 0
       |    THEN 1 ELSE 0 END AS BIGINT) AS flip
       |FROM k""".stripMargin.replace("\n", " ")

  // ----------------------- Theil–Sen robust trend per event type

  /** q251 — THEIL–SEN ROBUST SLOPE of daily volume per event type:
    * the median of all pairwise (day, count) slopes (Theil 1950, Sen
    * 1968) next to the q226-style OLS slope on the same grid. OLS
    * has breakdown point 0 — one bad ingest day (a backfill dump, an
    * outage zero) swings it arbitrarily; Theil–Sen tolerates ~29%
    * corrupted days, which is why monitoring pipelines prefer it for
    * trend alarms. Types whose two slopes DISAGREE markedly are the
    * ones where a few anomalous days, not a trend, drive the OLS
    * number.
    *
    * Exactness: each pairwise slope is ONE correctly-rounded double
    * division rounded to 6dp (identical on both engines); the median
    * is the LOWER median by deterministic (slope6, t1, t2) order —
    * an order statistic, no averaging, so the emitted value is one
    * of the exact pair slopes. OLS ships as the exact-integer-moment
    * tree (the q226 discipline).
    *
    * Scale shape: the day grid is CALENDAR-bounded — |days| per type
    * never grows with corpus size, so the C(|days|,2) pair expansion
    * (435 pairs per type on a 30-day window) is constant work at any
    * SF; the only corpus-sized stage is the (type, day) count
    * aggregate with map-side partials. */
  def theilSenTrend(s: SparkSession, d: String): DataFrame =
    theilSenFromCounts(typeDayCounts(Tables.events(s, d)))

  def theilSenFromCounts(dailyIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = dailyIn
      .localCheckpoint(true) // calendar-bounded grid; feeds 3 consumers
    val d0 = daily.agg(min("day").as("d0"))
    val g = daily.crossJoin(broadcast(d0))
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("t"), col("x"))
    val a = g.select(col("event_type"), col("t").as("t1"), col("x").as("x1"))
    val b = g.select(col("event_type").as("et2"), col("t").as("t2"),
      col("x").as("x2"))
    val pairs = a.join(b,
        col("event_type") === col("et2") && col("t1") < col("t2"))
      .select(col("event_type"), col("t1"), col("t2"),
        expr("round((CAST(x2 AS DOUBLE) - CAST(x1 AS DOUBLE)) / " +
          "(CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE)), 6)").as("slope6"))
    val med = pairs
      .withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("slope6"), col("t1"), col("t2"))).cast("long"))
      .withColumn("np", count(lit(1))
        .over(Window.partitionBy("event_type")))
      .filter(col("rn") === expr("(np + 1) div 2"))
      .select(col("event_type"), col("np").as("n_pairs"),
        col("slope6").as("ts_slope6"))
    val mom = g.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("t").as("st"), sum("x").as("sx"),
        sum(expr("t * t")).as("stt"), sum(expr("t * x")).as("stx"))
      .select(col("event_type"), col("n_days"),
        (col("n_days") * col("stx") - col("st") * col("sx")).as("slope_num"),
        (col("n_days") * col("stt") - col("st") * col("st")).as("slope_den"))
      .select(col("event_type"), col("n_days"),
        expr(OlsSlopeExpr).as("ols_slope6"))
    med.join(mom, "event_type")
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("ts_slope6"), col("ols_slope6"))
  }

  val theilSenTrendSql: String =
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |  count(*) AS x FROM events GROUP BY 1, 2),
       |d0 AS (SELECT min(day) AS d0 FROM daily),
       |g AS (SELECT event_type,
       |  CAST(datediff('day', d0, day) AS BIGINT) AS t, x
       |  FROM daily CROSS JOIN d0),
       |p AS (SELECT a.event_type, a.t AS t1, b.t AS t2,
       |  round((CAST(b.x AS DOUBLE) - CAST(a.x AS DOUBLE)) /
       |    (CAST(b.t AS DOUBLE) - CAST(a.t AS DOUBLE)), 6) AS slope6
       |  FROM g a JOIN g b ON a.event_type = b.event_type AND a.t < b.t),
       |r AS (SELECT event_type, slope6,
       |  CAST(row_number() OVER (PARTITION BY event_type
       |    ORDER BY slope6, t1, t2) AS BIGINT) AS rn,
       |  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np FROM p),
       |med AS (SELECT event_type, np AS n_pairs, slope6 AS ts_slope6
       |  FROM r WHERE rn = (np + 1) // 2),
       |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |  CAST(sum(t) AS BIGINT) AS st, CAST(sum(x) AS BIGINT) AS sx,
       |  CAST(sum(t * t) AS BIGINT) AS stt, CAST(sum(t * x) AS BIGINT) AS stx
       |  FROM g GROUP BY 1),
       |k AS (SELECT event_type, n_days,
       |  n_days * stx - st * sx AS slope_num,
       |  n_days * stt - st * st AS slope_den FROM m),
       |ols AS (SELECT event_type, n_days, $OlsSlopeExpr AS ols_slope6 FROM k)
       |SELECT med.event_type, ols.n_days, med.n_pairs, med.ts_slope6,
       |  ols.ols_slope6
       |FROM med JOIN ols ON med.event_type = ols.event_type"""
      .stripMargin.replace("\n", " ")

  // -------------------- split-conformal coverage of the q219 score

  /** q252 nominal miscoverage: α = 10% (prediction sets target ≥ 90%
    * coverage). */
  val ConformalAlphaPct = 10L

  /** q252 — SPLIT-CONFORMAL PREDICTION SETS over the q219 confidence
    * score: the distribution-free calibration guarantee (Vovk et al.;
    * Papadopoulos et al. 2002). Odd doc_ids are the calibration
    * split; per class c the threshold is the ⌈(n_c+1)(1−α)⌉-th
    * smallest class-c nonconformity (class-conditional / Mondrian
    * form, so the guarantee holds PER CLASS), and every even doc's
    * prediction set contains class c iff its nonconformity ≤ thr_c.
    * q219 said the score is miscalibrated; q250 re-mapped it; this
    * op wraps it with the guarantee that needs NO calibration at
    * all — only exchangeability — and measures the empirical
    * coverage next to the nominal 90%.
    *
    * All integers: nonconformity for class 1 is 10⁴ − conf_b4, for
    * class 0 conf_b4 (both exact b4 fixed point); the threshold rank
    * k_c = (9·(n_c+1) + 9) div 10 is exact ceil arithmetic; coverage
    * and mean set size ship as exact div ppm/milli.
    *
    * Scale shape: ONE scan scores and splits; thresholds are one
    * per-class order statistic (a (class) window over the calibration
    * half — 2 partitions); the eval half folds against the 2-row
    * broadcast threshold table. Output: 2 rows. */
  def conformalCoverage(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = scoredDocs(s, d).localCheckpoint(true) // one corpus scan
    val cal = scored.filter(col("doc_id") % 2 === 1)
      .select(col("label").as("cls"),
        when(col("label") === 1L, lit(10000L) - col("conf_b4"))
          .otherwise(col("conf_b4")).as("alpha"),
        col("doc_id"))
    // When the ceil-rank k_c = ⌈(1−α)(n_c+1)⌉ exceeds n_c (tiny
    // calibration class), split-conformal semantics give an INFINITE
    // threshold — the class is ALWAYS in the prediction set. alpha is
    // bounded by 10⁴, so thr = 10000 realizes +∞ exactly; coalesce
    // keeps the class in the output instead of dropping it at the join.
    val thr = cal
      .withColumn("rn", row_number().over(Window.partitionBy("cls")
        .orderBy(col("alpha"), col("doc_id"))).cast("long"))
      .withColumn("n_cal", count(lit(1)).over(Window.partitionBy("cls")))
      .groupBy("cls")
      .agg(max(col("n_cal")).as("n_cal"),
        coalesce(
          max(when(col("rn") ===
            expr(s"(${100L - ConformalAlphaPct} * (n_cal + 1) + 90) div 100"),
            col("alpha"))),
          lit(10000L)).as("thr"))
    val thrRow = thr.groupBy()
      .agg(max(when(col("cls") === 0L, col("thr"))).as("thr0"),
        max(when(col("cls") === 1L, col("thr"))).as("thr1"))
    val eval = scored.filter(col("doc_id") % 2 === 0)
      .crossJoin(broadcast(thrRow))
      .select(col("label").as("cls"),
        when(col("conf_b4") <= col("thr0"), 1L).otherwise(0L).as("in0"),
        when(lit(10000L) - col("conf_b4") <= col("thr1"), 1L).otherwise(0L)
          .as("in1"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("cls") === 1L, col("in1")).otherwise(col("in0")))
          .as("n_covered"),
        sum(expr("in0 + in1")).as("set_mass"))
    thr.join(eval, "cls")
      .select(col("cls"), col("n_cal"), col("thr"), col("n_eval"),
        col("n_covered"),
        expr("n_covered * 1000000 div n_eval").as("coverage_ppm"),
        expr("set_mass * 1000 div n_eval").as("avg_set_milli"))
  }

  /** The per-doc (doc_id, conf_b4, label) frame under q219/q252 —
    * q219 aggregates it to bins; q252 keeps the doc grain. */
  private def scoredDocs(s: SparkSession, d: String): DataFrame = {
    val stopPred = KappaStops.map(w => s"t = '$w'").mkString(" OR ")
    val stopTypes = KappaStops
      .map(w => when(array_contains(col("toks"), w), 1L).otherwise(0L))
      .reduce(_ + _)
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"),
        expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").cast("long")
          .as("ntok"))
      .select(col("doc_id"),
        expr(s"size(filter(toks, t -> $stopPred))").cast("long").as("nstop"),
        col("ntok"),
        (stopTypes >= KappaMinStopTypes).as("btypes"))
      .select(col("doc_id"),
        least(expr("nstop * 40000 div greatest(ntok, 1)"), lit(10000L))
          .as("conf_b4"),
        when(col("btypes") && col("ntok") >= KappaMinTok, 1L).otherwise(0L)
          .as("label"))
  }

  val conformalCoverageSql: String = {
    val stopPred = KappaStops.map(w => s"t = '$w'").mkString(" OR ")
    val stopTypes = KappaStops
      .map(w => s"CASE WHEN list_contains(string_split(text, ' '), '$w') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH f AS (SELECT doc_id,
       |  CAST(len(list_filter(string_split(text, ' '), t -> $stopPred)) AS BIGINT) AS nstop,
       |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS ntok,
       |  ($stopTypes) >= $KappaMinStopTypes AS btypes
       |  FROM documents),
       |sc AS (SELECT doc_id,
       |  least(nstop * 40000 // greatest(ntok, 1), 10000) AS conf_b4,
       |  CAST(CASE WHEN btypes AND ntok >= $KappaMinTok THEN 1 ELSE 0 END AS BIGINT) AS label
       |  FROM f),
       |cal AS (SELECT label AS cls,
       |  CASE WHEN label = 1 THEN 10000 - conf_b4 ELSE conf_b4 END AS alpha,
       |  doc_id FROM sc WHERE doc_id % 2 = 1),
       |thr AS (SELECT cls, max(n_cal) AS n_cal,
       |  coalesce(max(CASE WHEN rn =
       |    (${100L - ConformalAlphaPct} * (n_cal + 1) + 90) // 100
       |    THEN alpha END), 10000) AS thr FROM (
       |  SELECT cls, alpha,
       |    CAST(row_number() OVER (PARTITION BY cls ORDER BY alpha, doc_id) AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY cls) AS BIGINT) AS n_cal FROM cal)
       |  GROUP BY cls),
       |tr AS (SELECT max(CASE WHEN cls = 0 THEN thr END) AS thr0,
       |  max(CASE WHEN cls = 1 THEN thr END) AS thr1 FROM thr),
       |ev AS (SELECT label AS cls,
       |  CASE WHEN conf_b4 <= thr0 THEN 1 ELSE 0 END AS in0,
       |  CASE WHEN 10000 - conf_b4 <= thr1 THEN 1 ELSE 0 END AS in1
       |  FROM sc CROSS JOIN tr WHERE doc_id % 2 = 0),
       |ag AS (SELECT cls, CAST(count(*) AS BIGINT) AS n_eval,
       |  CAST(sum(CASE WHEN cls = 1 THEN in1 ELSE in0 END) AS BIGINT) AS n_covered,
       |  CAST(sum(in0 + in1) AS BIGINT) AS set_mass FROM ev GROUP BY 1)
       |SELECT thr.cls, thr.n_cal, thr.thr, ag.n_eval, ag.n_covered,
       |  CAST(n_covered * 1000000 // n_eval AS BIGINT) AS coverage_ppm,
       |  CAST(set_mass * 1000 // n_eval AS BIGINT) AS avg_set_milli
       |FROM thr JOIN ag ON ag.cls = thr.cls"""
      .stripMargin.replace("\n", " ")
  }

  // ------------------- per-source Gini concentration of doc length

  /** q224 — GINI COEFFICIENT of document length per source: the
    * inequality audit behind "is this source a long tail of stubs
    * dominated by a few megadocs?" — the concentration question that
    * decides whether a per-DOC quota (q77) or a per-TOKEN budget
    * (q108/q211) is the right admission unit for a source (high Gini:
    * doc counts misrepresent token mass; low Gini: either works).
    *
    * EXACT integers via the sorted-rank identity: with lengths
    * ranked 1..n within the source (any fixed tiebreak — the sum is
    * invariant under permutation of equals), Gini's mean-absolute-
    * difference numerator is Σᵢ (2·rᵢ − n − 1)·xᵢ, an exact BIGINT
    * (headroom ~10⁹ rows·chars per source), and
    * gini_ppm = num·10⁶ div (n·Σx) ships by exact div (FLOAT RULE).
    *
    * Scale shape: ONE (source) exchange carrying the rank window and
    * the final per-source aggregate (same partitioning, same sort —
    * the q208 posture); output is |sources| rows. Sources
    * parallelize; no global window. */
  def lengthGini(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("r", row_number().over(w).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"),
        sum(expr("(2 * r - 1) * n_chars")).as("rsum"))
      .select(col("source"), col("n"), col("sum_chars"),
        (col("rsum") - col("n") * col("sum_chars")).as("gini_num"),
        expr("(rsum - n * sum_chars) * 1000000 div (n * sum_chars)")
          .as("gini_ppm"))
  }

  val lengthGiniSql: String =
    """WITH r AS (SELECT source, n_chars,
      |  CAST(row_number() OVER (PARTITION BY source
      |    ORDER BY n_chars, doc_id) AS BIGINT) AS r
      |  FROM documents),
      |g AS (SELECT source, count(*) AS n,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum((2 * r - 1) * n_chars) AS BIGINT) AS rsum
      |  FROM r GROUP BY 1)
      |SELECT source, n, sum_chars,
      |  rsum - n * sum_chars AS gini_num,
      |  CAST((rsum - n * sum_chars) * 1000000 // (n * sum_chars)
      |    AS BIGINT) AS gini_ppm
      |FROM g""".stripMargin.replace("\n", " ")

  // ------------------- inter-event burstiness screen (q269)

  /** q269 minimum gap count for a stable burstiness estimate. */
  val BurstMinGaps = 20L

  /** q269 — INTER-EVENT BURSTINESS per user (Goh & Barabási 2008:
    * B = (σ−μ)/(σ+μ) over the inter-event gaps): the temporal
    * signature that separates humans from machines — a Poisson-ish
    * human sits near B ≈ 0 (σ ≈ μ), a cron job or replayed log at
    * B → −1 (regular: σ ≪ μ), scripted burst-and-sleep traffic at
    * B → +1 — squarely the reference's fraud domain, on the axis
    * (timing) none of the value/volume rules look at. Ships the
    * exact integer gap moments (n, Σg, Σg² in ms) with B in 6dp and
    * a 3-way verdict at the conventional ±0.25 cuts.
    *
    * EXACT: gaps are integer SECOND differences off ONE (user)
    * window (ms² moments would press 2⁶³ at one 30-day gap; seconds
    * buy 10⁶× headroom and burstiness is scale-free — B is invariant
    * to the unit); moments are BIGINTs; σ enters only through the variance
    * identity n·Σg² − (Σg)², and B6's double tree uses
    * √(n·Σg²−(Σg)²)·… with correctly-rounded ops only. The verdict
    * compares in integer cross-multiplied space — no float at the
    * boundary (FLOAT RULE).
    *
    * Scale shape: one (user) exchange carries the lag window AND the
    * moment aggregate; output is |users with ≥ [[BurstMinGaps]]
    * gaps| rows. */
  def burstiness(s: SparkSession, d: String): DataFrame =
    burstinessFrom(Tables.events(s, d))

  /** [[burstiness]] over an explicit events frame (needs user_id, ts,
    * event_id) — the unit GridOpsSpec drives with constructed
    * regular/bursty streams. */
  def burstinessFrom(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_ms_",
        unix_millis(col("ts")) - unix_millis(lag("ts", 1).over(w)))
      .withColumn("gap_s", expr("gap_ms_ div 1000"))
      .filter(col("gap_s").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), sum("gap_s").as("sg"),
        sum(expr("gap_s * gap_s")).as("sgg"))
      .filter(col("n_gaps") >= BurstMinGaps)
      .select(col("user_id"), col("n_gaps"), col("sg"), col("sgg"),
        expr(BurstExpr).as("b6"),
        // B > 0.25 ⟺ (σ−μ)·4 > σ+μ ⟺ 3σ > 5μ ⟺ 9·σ²·n... integer:
        // 9·(n·Σg²−Σg²ᵤ)·... — cross-multiplied with σ² = (nΣg²−(Σg)²)/n²
        // and μ = Σg/n: 3σ > 5μ ⟺ 9(nΣg²−(Σg)²) > 25(Σg)² and
        // 5σ < 3μ ⟺ 25(nΣg²−(Σg)²) < 9(Σg)².
        expr("CASE WHEN 9 * (n_gaps * sgg - sg * sg) > 25 * sg * sg " +
          "THEN 'bursty' WHEN 25 * (n_gaps * sgg - sg * sg) < 9 * sg * sg " +
          "THEN 'regular' ELSE 'poisson_like' END").as("verdict"))
  }

  // B = (σ−μ)/(σ+μ) with σ = √(nΣg²−(Σg)²)/n, μ = Σg/n — the n's
  // cancel: B = (√(nΣg²−(Σg)²) − Σg) / (√(nΣg²−(Σg)²) + Σg).
  private val BurstExpr: String =
    "round((sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)) - CAST(sg AS DOUBLE))" +
      " / (sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)) + CAST(sg AS DOUBLE))" +
      ", 6)"

  val burstinessSql: String =
    s"""WITH g AS (SELECT user_id,
       |  (epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id))) // 1000 AS gap_s
       |  FROM events),
       |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       |  CAST(sum(gap_s) AS BIGINT) AS sg,
       |  CAST(sum(gap_s * gap_s) AS BIGINT) AS sgg
       |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1
       |  HAVING count(*) >= $BurstMinGaps)
       |SELECT user_id, n_gaps, sg, sgg, $BurstExpr AS b6,
       |  CASE WHEN 9 * (n_gaps * sgg - sg * sg) > 25 * sg * sg
       |    THEN 'bursty' WHEN 25 * (n_gaps * sgg - sg * sg) < 9 * sg * sg
       |    THEN 'regular' ELSE 'poisson_like' END AS verdict
       |FROM m""".stripMargin.replace("\n", " ")

  // ---------------- token-mass median document length (q263)

  /** q263 — TOKEN-MASS MEDIAN length per source: the smallest doc
    * length L such that documents of length ≤ L hold at least HALF
    * the source's TOKEN mass — the number that actually sizes chunk
    * and batch budgets. The count-median (q51's p50) answers "what
    * does a typical DOCUMENT look like"; a pretraining pipeline
    * consumes TOKENS, and on a heavy-tailed source the two diverge
    * wildly (high q224 Gini ⟹ mass-median ≫ count-median). Emits
    * both medians and the divergence ratio so the q77-vs-q108
    * admission-unit decision (per-doc quota vs per-token budget)
    * reads off one row.
    *
    * Exact: one (source) window carries the rank AND the running
    * token mass (same sort); both medians are order statistics
    * (2·cum ≥ total / 2·rank ≥ n — first row crossing, integer
    * compares); the ratio ships ×10⁴ by exact div.
    *
    * Scale shape: ONE (source) exchange (the q224/q230/q253
    * posture); output is |sources| rows. */
  def tokenMassMedian(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("ntok"), col("doc_id"))
    val whole = Window.partitionBy("source")
    val ranked = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        expr("CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT)")
          .as("ntok"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum("ntok").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("total", sum("ntok").over(whole))
    ranked
      .groupBy("source")
      .agg(max("n").as("n_docs"), max("total").as("total_tokens"),
        min(when(col("cum") * 2 >= col("total"), col("ntok")))
          .as("mass_median_ntok"),
        min(when(col("rk") * 2 >= col("n"), col("ntok")))
          .as("count_median_ntok"))
      .withColumn("mass_over_count_x10k",
        expr("mass_median_ntok * 10000 div greatest(count_median_ntok, 1)"))
  }

  val tokenMassMedianSql: String =
    """WITH r AS (SELECT source, doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS ntok
      |  FROM documents),
      |k AS (SELECT source, ntok,
      |  CAST(row_number() OVER w AS BIGINT) AS rk,
      |  CAST(sum(ntok) OVER (PARTITION BY source ORDER BY ntok, doc_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n,
      |  CAST(sum(ntok) OVER (PARTITION BY source) AS BIGINT) AS total
      |  FROM r WINDOW w AS (PARTITION BY source ORDER BY ntok, doc_id))
      |SELECT source, max(n) AS n_docs, max(total) AS total_tokens,
      |  min(CASE WHEN cum * 2 >= total THEN ntok END) AS mass_median_ntok,
      |  min(CASE WHEN rk * 2 >= n THEN ntok END) AS count_median_ntok,
      |  CAST(min(CASE WHEN cum * 2 >= total THEN ntok END) * 10000
      |    // greatest(min(CASE WHEN rk * 2 >= n THEN ntok END), 1) AS BIGINT)
      |    AS mass_over_count_x10k
      |FROM k GROUP BY source""".stripMargin.replace("\n", " ")

  // --------------------------------- per-source datacard (q255)

  /** q255 — SOURCE DATACARD: the one-scan "datasheet" row per ingest
    * feed (Gebru et al., Datasheets for Datasets) — the numbers a
    * mixture owner reads side by side before weighting sources:
    * volume (docs, tokens), quality rate (q23's cut), exact-dup rate
    * (q16's fingerprint), language concentration (Gini impurity —
    * the log-free diversity surrogate: 0 = monolingual, →1 −
    * 1/|langs| = uniform), and mean length. Every number exists
    * elsewhere as its own audit; the datacard's job is ONE scan, ONE
    * table, and the FLOAT RULE everywhere (×10⁴/milli exact div).
    *
    * Scale shape: the corpus scan carries the q16 fingerprint window
    * (fp exchange — the one unavoidable dedup shuffle), lands in a
    * (source, lang) aggregate (map-side partials), then a |sources|-
    * grain rollup computes Σc² for the impurity. Output: |sources|
    * rows. */
  def sourceDatacard(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stopPred = Seq("the", "a", "of", "and", "is", "to")
      .map(w => s"t = '$w'").mkString(" OR ")
    val cells = Tables.documents(s, d)
      .withColumn("fp",
        md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "")))
      .withColumn("keep_id", min("doc_id").over(Window.partitionBy("fp")))
      .select(col("source"), col("lang"), col("n_chars"),
        expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").cast("long")
          .as("ntok"),
        expr(s"size(filter(split(text, ' '), t -> $stopPred))").cast("long")
          .as("nstop"),
        when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L).as("dup"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("c"), sum("ntok").as("tok"),
        sum(when(expr("ntok >= 20 AND 5 * nstop < 3 * ntok"), 1L)
          .otherwise(0L)).as("good"),
        sum("dup").as("dups"), sum("n_chars").as("chars"))
    cells.groupBy("source")
      .agg(sum("c").as("n_docs"), sum("tok").as("n_tokens"),
        sum("good").as("n_good"), sum("dups").as("n_dups"),
        sum("chars").as("sum_chars"), sum(expr("c * c")).as("sum_c2"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_good * 10000 div n_docs").as("good_x10k"),
        expr("n_dups * 10000 div n_docs").as("dup_x10k"),
        expr("(n_docs * n_docs - sum_c2) * 10000 div (n_docs * n_docs)")
          .as("lang_gini_x10k"),
        expr("sum_chars * 1000 div n_docs").as("mean_chars_milli"))
  }

  val sourceDatacardSql: String = {
    val stopPred = Seq("the", "a", "of", "and", "is", "to")
      .map(w => s"t = '$w'").mkString(" OR ")
    s"""WITH f AS (SELECT source, lang, n_chars, doc_id,
       |  min(doc_id) OVER (PARTITION BY
       |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) AS keep_id,
       |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS ntok,
       |  CAST(len(list_filter(string_split(text, ' '), t -> $stopPred)) AS BIGINT) AS nstop
       |  FROM documents),
       |cells AS (SELECT source, lang, count(*) AS c,
       |  CAST(sum(ntok) AS BIGINT) AS tok,
       |  CAST(sum(CASE WHEN ntok >= 20 AND 5 * nstop < 3 * ntok
       |    THEN 1 ELSE 0 END) AS BIGINT) AS good,
       |  CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT) AS dups,
       |  CAST(sum(n_chars) AS BIGINT) AS chars
       |  FROM f GROUP BY 1, 2),
       |g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
       |  CAST(sum(tok) AS BIGINT) AS n_tokens,
       |  CAST(sum(good) AS BIGINT) AS n_good,
       |  CAST(sum(dups) AS BIGINT) AS n_dups,
       |  CAST(sum(chars) AS BIGINT) AS sum_chars,
       |  CAST(sum(c * c) AS BIGINT) AS sum_c2
       |  FROM cells GROUP BY 1)
       |SELECT source, n_docs, n_tokens,
       |  CAST(n_good * 10000 // n_docs AS BIGINT) AS good_x10k,
       |  CAST(n_dups * 10000 // n_docs AS BIGINT) AS dup_x10k,
       |  CAST((n_docs * n_docs - sum_c2) * 10000 // (n_docs * n_docs) AS BIGINT)
       |    AS lang_gini_x10k,
       |  CAST(sum_chars * 1000 // n_docs AS BIGINT) AS mean_chars_milli
       |FROM g""".stripMargin.replace("\n", " ")
  }

  // --------------------- Poisson-bootstrap CI for mean doc length

  /** q256 replica count. */
  val BootR = 100L
  /** floor(CDF_Poisson(1)(k) · 2⁵³) for k = 0..5 — integer thresholds
    * both engines compare the 53-bit md5 draw against, so the
    * replica weights are deterministic and identical everywhere
    * (weights ≥ 6 truncate to 6; P ≈ 6·10⁻⁴ tail, standard Poisson-
    * bootstrap practice). */
  val PoissonCdf53: Seq[Long] = Seq(
    3313563428353948L, 6627126856707896L, 8283908570884870L,
    8836169142277195L, 8974234285125276L, 9001847313694892L)

  /** q256 — POISSON-BOOTSTRAP CONFIDENCE INTERVAL for mean document
    * length per source (Chamandy et al. 2012, "Estimating uncertainty
    * for massive data streams" — the Google-scale bootstrap): every
    * (doc, replica r) pair draws a Poisson(1) weight from a
    * DETERMINISTIC hash of (doc_id, r), so the R resampled means need
    * ONE pass, no sampling-with-replacement shuffle, and any engine
    * replays the identical replicas. The per-source 90% CI is the
    * 5th/95th percentile of the R replica means — the error bar q230's
    * trimmed mean and q93's MAD screen don't provide.
    *
    * All integers: weights are threshold-compares of the md5-53 draw
    * against [[PoissonCdf53]]; replica means are exact milli divs;
    * the CI bounds are order statistics (ranks ⌈0.05R⌉ and ⌈0.95R⌉)
    * of those integers — no float crosses an engine boundary.
    *
    * Scale shape: the replica explosion is map-side (R in-row
    * structs per doc) feeding a (source, r) aggregate with map-side
    * partials — the shuffle carries |sources|·R cells, NEVER N·R
    * rows; the CI is a window over R-row groups. */
  def bootstrapCi(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wExpr = PoissonCdf53.zipWithIndex
      .map { case (t, k) => s"WHEN h < ${t}L THEN ${k}L" }
      .mkString("CASE ", " ", " ELSE 6L END")
    val reps = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      // the explode is map-side: explode → hash → weight → partial
      // aggregate fuse into one stage; only |sources|·R cells shuffle
      .select(col("source"), col("doc_id"), col("n_chars"),
        explode(expr(s"sequence(0L, ${BootR - 1}L)")).as("r"))
      .select(col("source"), col("n_chars"), col("r"),
        graft.functions.GraftFunctions.md5Lower53(
          concat(col("doc_id").cast("string"), lit(":"),
            col("r").cast("string"))).as("h"))
      .select(col("source"), col("n_chars"), col("r"), expr(wExpr).as("w"))
      .groupBy("source", "r")
      .agg(sum("w").as("nw"), sum(expr("w * n_chars")).as("sw"))
      .select(col("source"), col("r"),
        expr("sw * 1000 div greatest(nw, 1)").as("mean_milli"))
    val byMean = Window.partitionBy("source")
      .orderBy(col("mean_milli"), col("r"))
    reps
      .withColumn("rn", row_number().over(byMean).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_reps"),
        max(when(col("rn") === (BootR * 5 + 99) / 100, col("mean_milli")))
          .as("lo_milli"),
        max(when(col("rn") === (BootR * 95 + 99) / 100, col("mean_milli")))
          .as("hi_milli"),
        expr("sum(mean_milli) div count(1)").as("boot_mean_milli"))
  }

  val bootstrapCiSql: String = {
    val wExpr = PoissonCdf53.zipWithIndex
      .map { case (t, k) => s"WHEN h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 6 END")
    s"""WITH reps AS (SELECT source, n_chars, r,
       |  $wExpr AS w FROM (
       |  SELECT source, n_chars, r,
       |    md5_number_lower(CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)) >> 11 AS h
       |  FROM documents, range(0, $BootR) t(r))),
       |m AS (SELECT source, r,
       |  CAST(sum(w * n_chars) * 1000 // greatest(sum(w), 1) AS BIGINT) AS mean_milli
       |  FROM reps GROUP BY 1, 2),
       |rk AS (SELECT source, mean_milli,
       |  CAST(row_number() OVER (PARTITION BY source
       |    ORDER BY mean_milli, r) AS BIGINT) AS rn FROM m)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_reps,
       |  CAST(max(CASE WHEN rn = ${(BootR * 5 + 99) / 100} THEN mean_milli END) AS BIGINT) AS lo_milli,
       |  CAST(max(CASE WHEN rn = ${(BootR * 95 + 99) / 100} THEN mean_milli END) AS BIGINT) AS hi_milli,
       |  CAST(sum(mean_milli) // count(*) AS BIGINT) AS boot_mean_milli
       |FROM rk GROUP BY source""".stripMargin.replace("\n", " ")
  }

  // -------------------- calibration audit (reliability bins / ECE)

  /** q219 calibration bin count (confidence deciles). */
  val EceBins = 10L

  /** q219 — CALIBRATION AUDIT (reliability table / expected
    * calibration error) of the cheap stopword-DENSITY score against
    * the q215 content label: bin documents by the score's claimed
    * confidence, and per bin compare claimed confidence to observed
    * label rate. A screen can have good accuracy and terrible
    * calibration — and a pipeline that THRESHOLDS a score (q77's
    * quota admission, q120's selection) is implicitly trusting its
    * calibration, which is exactly what this table audits (the ML
    * counterpart is a reliability diagram over classifier
    * probabilities; the operator is identical).
    *
    * EXACT integers end to end (no floats at all): confidence is the
    * basis-10⁴ density score conf_b4 = min(nstop·4·10⁴ div ntok, 10⁴)
    * (×4: the corpus' density ceiling ~25% maps to full confidence);
    * bins are conf_b4 div 10³ capped to [[EceBins]]−1; per bin the
    * integers (n, Σlabel, Σconf_b4) make the observed rate, claimed
    * rate, and gap exact: gap_num = |Σlabel·10⁴ − Σconf_b4| — and
    * ECE = Σ_bins gap_num / (N·10⁴) derives downstream (FLOAT RULE:
    * ship the integers, not the ratio). acc/conf ship in ppm by
    * exact div for readability.
    *
    * Scale shape: ONE scan into a bins-bounded hash aggregate
    * (map-side partials); output ≤ [[EceBins]] rows. */
  def eceCalibration(s: SparkSession, d: String): DataFrame = {
    val stopPred = KappaStops.map(w => s"t = '$w'").mkString(" OR ")
    val stopTypes = KappaStops
      .map(w => when(array_contains(col("toks"), w), 1L).otherwise(0L))
      .reduce(_ + _)
    Tables.documents(s, d)
      .select(split(col("text"), " ").as("toks"), // tokenize ONCE (q215)
        expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").cast("long")
          .as("ntok"))
      .select(
        expr(s"size(filter(toks, t -> $stopPred))").cast("long").as("nstop"),
        col("ntok"),
        (stopTypes >= KappaMinStopTypes).as("btypes"))
      .select(
        least(expr("nstop * 40000 div greatest(ntok, 1)"), lit(10000L))
          .as("conf_b4"),
        when(col("btypes") && col("ntok") >= KappaMinTok, 1L).otherwise(0L)
          .as("label"))
      .groupBy(least(expr("conf_b4 div 1000"), lit(EceBins - 1)).as("bin"))
      .agg(count(lit(1)).as("n"), sum("label").as("sum_label"),
        sum("conf_b4").as("sum_conf_b4"))
      .select(col("bin"), col("n"), col("sum_label"), col("sum_conf_b4"),
        expr("sum_label * 1000000 div n").as("acc_ppm"),
        expr("sum_conf_b4 * 100 div n").as("conf_ppm"),
        abs(col("sum_label") * 10000 - col("sum_conf_b4")).as("gap_num"))
  }

  val eceCalibrationSql: String = {
    val stopPred = KappaStops.map(w => s"t = '$w'").mkString(" OR ")
    val stopTypes = KappaStops
      .map(w => s"CASE WHEN list_contains(string_split(text, ' '), '$w') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH f AS (SELECT
       |  CAST(len(list_filter(string_split(text, ' '), t -> $stopPred)) AS BIGINT) AS nstop,
       |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS ntok,
       |  ($stopTypes) >= $KappaMinStopTypes AS btypes
       |  FROM documents),
       |s AS (SELECT least(nstop * 40000 // greatest(ntok, 1), 10000) AS conf_b4,
       |  CASE WHEN btypes AND ntok >= $KappaMinTok THEN 1 ELSE 0 END AS label
       |  FROM f),
       |g AS (SELECT least(conf_b4 // 1000, ${EceBins - 1}) AS bin, count(*) AS n,
       |  CAST(sum(label) AS BIGINT) AS sum_label,
       |  CAST(sum(conf_b4) AS BIGINT) AS sum_conf_b4
       |  FROM s GROUP BY 1)
       |SELECT CAST(bin AS BIGINT) AS bin, n, sum_label, sum_conf_b4,
       |  CAST(sum_label * 1000000 // n AS BIGINT) AS acc_ppm,
       |  CAST(sum_conf_b4 * 100 // n AS BIGINT) AS conf_ppm,
       |  CAST(abs(sum_label * 10000 - sum_conf_b4) AS BIGINT) AS gap_num
       |FROM g""".stripMargin.replace("\n", " ")
  }

  // ----------------- isotonic (PAVA) recalibration of the q219 bins

  /** q250 — ISOTONIC RECALIBRATION of the q219 reliability table:
    * the monotone-regression fit (what sklearn's
    * IsotonicRegression / Zadrozny & Elkan's calibration method
    * computes with PAVA) over the binned (confidence → observed
    * rate) curve. q219 AUDITS miscalibration; this op emits the
    * CORRECTED mapping a pipeline applies before thresholding
    * (q77/q120) — the monotone step function closest (L2, n-weighted)
    * to the observed rates.
    *
    * Computed by the MINIMAX IDENTITY instead of the sequential
    * pool-adjacent-violators loop: iso_i = max_{j≤i} min_{k≥i}
    * mean(y_j..y_k) — PAVA's fixed point in closed form (Robertson
    * et al. 1988), which turns an inherently sequential driver-side
    * recurrence into grid math over interval means: with B ≤ 10
    * bins, all O(B²) interval means come off ONE prefix sum, and the
    * max-min is a B³-bounded fold. Means are exact milli integers
    * (1000·L div N — FLOAT RULE); minimax over them is monotone BY
    * STRUCTURE (the j-set grows and the k-set shrinks with i), and
    * the spec pins ≤1-milli agreement with an exact double PAVA.
    *
    * Scale shape: the corpus scan is q219's one bins-bounded
    * aggregate; everything after is ≤ B³ grid rows. At 100 TB the
    * bin grid is the same 10 rows — the fit costs the same. */
  def isotonicCalibration(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = eceCalibration(s, d).select("bin", "n", "sum_label")
      .localCheckpoint(true) // ≤ EceBins rows; feeds prefix + final join
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = g
      .withColumn("cn", sum("n").over(w))
      .withColumn("cl", sum("sum_label").over(w))
    val j = c.select(col("bin").as("jb"), (col("cn") - col("n")).as("n0"),
      (col("cl") - col("sum_label")).as("l0"))
    val k = c.select(col("bin").as("kb"), col("cn"), col("cl"))
    val intervals = j.join(k, col("jb") <= col("kb"))
      .select(col("jb"), col("kb"),
        expr("(cl - l0) * 1000 div (cn - n0)").as("mean_milli"))
    val iso = g.select(col("bin"))
      .join(intervals, col("jb") <= col("bin") && col("bin") <= col("kb"))
      .groupBy("bin", "jb").agg(min("mean_milli").as("inner_min"))
      .groupBy("bin").agg(max("inner_min").as("iso_milli"))
    g.join(iso, "bin")
      .select(col("bin"), col("n"), col("sum_label"),
        expr("sum_label * 1000 div n").as("raw_milli"), col("iso_milli"))
  }

  val isotonicCalibrationSql: String =
    s"""WITH e AS ($eceCalibrationSql),
       |g AS (SELECT bin, n, sum_label FROM e),
       |c AS (SELECT bin, n, sum_label,
       |  CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
       |  CAST(sum(sum_label) OVER (ORDER BY bin) AS BIGINT) AS cl FROM g),
       |iv AS (SELECT j.bin AS jb, k.bin AS kb,
       |  (k.cl - (j.cl - j.sum_label)) * 1000
       |    // (k.cn - (j.cn - j.n)) AS mean_milli
       |  FROM c j JOIN c k ON j.bin <= k.bin),
       |mm AS (SELECT g.bin, iv.jb, min(mean_milli) AS inner_min
       |  FROM g JOIN iv ON iv.jb <= g.bin AND g.bin <= iv.kb
       |  GROUP BY 1, 2),
       |iso AS (SELECT bin, CAST(max(inner_min) AS BIGINT) AS iso_milli
       |  FROM mm GROUP BY 1)
       |SELECT g.bin, g.n, g.sum_label,
       |  CAST(g.sum_label * 1000 // g.n AS BIGINT) AS raw_milli, iso.iso_milli
       |FROM g JOIN iso ON iso.bin = g.bin"""
      .stripMargin.replace("\n", " ")

  // --------------------- CUSUM change-point monitor over daily volume

  /** q217 alarm factor: alarm when the cumulative excess exceeds
    * [[CusumH]]× the global daily mean. */
  val CusumH = 2L

  /** The day-grain count grid under q217 — shared with the streaming
    * CUSUM twin ([[graft.streaming.StreamingFraud.cusumCountsStream]]):
    * daily counts are ADDITIVE state, and [[cusumFromCounts]] over a
    * snapshot reproduces the full alarm table without re-touching the
    * events. */
  def dailyCounts(events: DataFrame): DataFrame =
    events.groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))

  /** q217 — CUSUM CHANGE-POINT MONITOR over daily event volume: the
    * classic sequential drift detector (Page 1954) that catches the
    * SLOW leak every threshold alarm misses — a feed running 10% hot
    * for three weeks never crosses a 3σ daily gate, but its CUSUM
    * climbs linearly. Two one-sided statistics vs the global daily
    * mean m: S⁺_t = max(0, S⁺_{t−1} + x_t − m) (upshift) and
    * S⁻_t = max(0, S⁻_{t−1} + m − x_t) (downshift), alarming when
    * either exceeds [[CusumH]]·m.
    *
    * EXACT integers via two standard rewrites: (1) scale by D =
    * |days| so the mean never divides — D·(x_t − m) = D·x_t − total
    * is a BIGINT; (2) the reset-at-zero recurrence is a prefix
    * extremum, S⁺_t = P_t − min(0, min_{j≤t} P_j) with P the running
    * sum of D·x_j − total (and S⁻_t = max(0, max_{j≤t} P_j) − P_t) —
    * so two windows (running sum, running extremum) replace the
    * sequential loop and the whole op stays declarative. Alarm
    * compare is integer too: S·D > H·m·D ⟺ s_num > H·total.
    *
    * Scale shape: ONE day-grain count aggregate over the scan (the
    * only corpus-sized exchange, map-side partials); the ordered
    * windows run on the DAYS GRID — bounded by the calendar (365
    * rows/year), so the single-partition global window is a
    * deliberate non-issue (same posture as q198's value grid). Gap
    * days contribute nothing here (observed-days grain); compose
    * with q176's gap-fill first when zero-days must count as
    * violations. */
  def cusumDrift(s: SparkSession, d: String): DataFrame =
    cusumFromCounts(dailyCounts(Tables.events(s, d)).localCheckpoint(true))

  /** The day-grain CUSUM tail over ANY (day, x) grid (batch scan or
    * streaming state snapshot). */
  def cusumFromCounts(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = daily.agg(sum("x").as("total"), count(lit(1)).as("dd"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .crossJoin(broadcast(tot))
      .withColumn("p", sum(col("x") * col("dd") - col("total")).over(w))
      .withColumn("pmin", min(col("p")).over(w))
      .withColumn("pmax", max(col("p")).over(w))
      .select(col("day"), col("x"), col("total"), col("dd"),
        (col("p") - least(col("pmin"), lit(0L))).as("up_num"),
        (greatest(col("pmax"), lit(0L)) - col("p")).as("dn_num"),
        (col("p") - least(col("pmin"), lit(0L)) > lit(CusumH) * col("total"))
          .as("alarm_up"),
        (greatest(col("pmax"), lit(0L)) - col("p") > lit(CusumH) * col("total"))
          .as("alarm_dn"))
  }

  // Window sums CAST BIGINT (the q167/q182 HUGEINT lesson).
  val cusumDriftSql: String =
    s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS x
       |  FROM events GROUP BY 1),
       |t AS (SELECT CAST(sum(x) AS BIGINT) AS total,
       |  CAST(count(*) AS BIGINT) AS dd FROM daily),
       |w1 AS (SELECT day, x, total, dd,
       |  CAST(sum(x * dd - total) OVER (ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
       |  FROM daily CROSS JOIN t),
       |w AS (SELECT day, x, total, dd, p,
       |  CAST(min(p) OVER (ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pmin,
       |  CAST(max(p) OVER (ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pmax
       |  FROM w1)
       |SELECT day, CAST(x AS BIGINT) AS x, total, dd,
       |  p - least(pmin, 0) AS up_num,
       |  greatest(pmax, 0) - p AS dn_num,
       |  p - least(pmin, 0) > $CusumH * total AS alarm_up,
       |  greatest(pmax, 0) - p > $CusumH * total AS alarm_dn
       |FROM w""".stripMargin.replace("\n", " ")
}
