package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT percentiles at 100 TB shape: Spark's exact `percentile`
  * aggregate buffers every value of the column in ONE aggregation
  * buffer — the known single-reducer scale-killer q05 shipped through
  * r4 (VERDICT r4 item 3). This is the scale-out replacement:
  *
  *   pass 1 — `approx_percentile` (QuantileSummaries, mergeable
  *            sketches, bounded memory) brackets each target rank:
  *            the sketch's rank error is ≤ n/accuracy, so the values
  *            at percentiles p ± 2/accuracy are guaranteed to straddle
  *            the true order statistics.
  *   pass 2 — ONE bounded aggregate computes the exact rank of each
  *            bracket floor and collects ONLY the in-bracket values
  *            (≈ 4n/accuracy rows + duplicate mass — a few hundred at
  *            sf0.1; pick accuracy ≈ n/10⁴ at larger n to keep the
  *            collect bounded).
  *   driver — the two order statistics around rank p·(n−1) come out of
  *            the sorted bracket; linear interpolation matches pandas
  *            `quantile` / DuckDB `quantile_cont` / Spark `percentile`
  *            (QuantilesSpec asserts bit-equality against the latter).
  *
  * If a bracket ever misses its rank (cannot happen within the sketch's
  * error contract — defensive only), the code falls back to the exact
  * single-buffer aggregate rather than returning a wrong answer.
  */
object Quantiles {

  val DefaultAccuracy = 10000

  /** Exact value at each percentile in `ps` for `df.col(c)` (nulls
    * ignored, column cast to double), via the two-pass bracket plan. */
  def exactPercentiles(df: DataFrame, c: String, ps: Seq[Double],
                       accuracy: Int = DefaultAccuracy): Seq[Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val v = col(c).cast("double")
    val eps = 2.0 / accuracy
    val bounds = ps.map(p => (math.max(0.0, p - eps), math.min(1.0, p + eps)))
    val pcts = bounds.flatMap { case (lo, hi) => Seq(lo, hi) }
    val pass1 = df.agg(
      count(v).as("n"),
      expr(s"approx_percentile(CAST($c AS DOUBLE), " +
        s"array(${pcts.mkString(", ")}), $accuracy)").as("b")).head()
    val n = pass1.getLong(0)
    if (n == 0L) return ps.map(_ => Double.NaN)
    val bracketVals = pass1.getSeq[Double](1)
    val brackets = ps.indices.map(i => (bracketVals(2 * i), bracketVals(2 * i + 1)))
    // pass 2: per target, exact count below the bracket + the bracket's
    // values, all in one scan. Aggregates are bounded: each collect_list
    // holds only the bracket slice.
    val aggs = brackets.zipWithIndex.flatMap { case ((lo, hi), i) =>
      Seq(
        sum(when(v < lo, 1L).otherwise(0L)).as(s"below_$i"),
        sort_array(collect_list(when(v >= lo && v <= hi, v))).as(s"vals_$i"))
    }
    val pass2 = df.agg(aggs.head, aggs.tail: _*).head()
    ps.indices.map { i =>
      val below = pass2.getLong(2 * i)
      val vals = pass2.getSeq[Double](2 * i + 1)
      interpolate(ps(i), n, below, vals).getOrElse {
        // defensive fallback: exact single-buffer aggregate
        df.agg(expr(s"percentile(CAST($c AS DOUBLE), ${ps(i)})"))
          .head().getDouble(0)
      }
    }
  }

  /** Single-percentile convenience. */
  def exactPercentile(df: DataFrame, c: String, p: Double,
                      accuracy: Int = DefaultAccuracy): Double =
    exactPercentiles(df, c, Seq(p), accuracy).head

  /** EXACT k-th smallest value of `df.col(c)` (1-based rank, nulls
    * ignored) via the same bracket machinery — rank-based selection,
    * no interpolation, so it works where percentile arithmetic cannot
    * (integer sample keys whose (k-1)/(n-1) fraction isn't a
    * representable double). pass 1 brackets the rank with
    * approx_percentile ± the sketch error (plus the ±1-rank neighbor
    * pad); pass 2 counts below-bracket and collects the bracket slice;
    * the answer is slice[(k-1) - below]. Returns None when k is out of
    * range (empty input or k > n). */
  def exactKthSmallest(df: DataFrame, c: String, k: Long,
                       accuracy: Int = DefaultAccuracy): Option[Double] = {
    require(k >= 1, s"rank must be >= 1, got $k")
    val v = col(c).cast("double")
    val n = df.agg(count(v)).head().getLong(0)
    if (n == 0L || k > n) return None
    val p = (k - 1).toDouble / math.max(1L, n - 1).toDouble
    val eps = 2.0 / accuracy
    val (plo, phi) = (math.max(0.0, p - eps), math.min(1.0, p + eps))
    val b = df.agg(expr(
      s"approx_percentile(CAST($c AS DOUBLE), array($plo, $phi), $accuracy)"))
      .head().getSeq[Double](0)
    val pass2 = df.agg(
      sum(when(v < b.head, 1L).otherwise(0L)),
      sort_array(collect_list(when(v >= b.head && v <= b(1), v))),
      max(when(v < b.head, v)),
      min(when(v > b(1), v))).head()
    val below0 = pass2.getLong(0)
    val inB = pass2.getSeq[Double](1)
    val loPad = if (pass2.isNullAt(2)) None else Some(pass2.getDouble(2))
    val hiPad = if (pass2.isNullAt(3)) None else Some(pass2.getDouble(3))
    val vals = loPad.toSeq ++ inB ++ hiPad.toSeq
    val below = below0 - loPad.size
    val idx = (k - 1) - below
    if (idx >= 0 && idx < vals.size) Some(vals(idx.toInt))
    else {
      // defensive: bracket miss outside the sketch contract. Nulls are
      // filtered (an ascending sort puts them FIRST, which would shift
      // the rank the main path computes over count(v) non-nulls), and
      // limit() takes an Int — guard rather than overflow silently.
      require(k <= Int.MaxValue,
        s"defensive fallback needs k <= Int.MaxValue, got $k")
      df.select(v.as("_v")).filter(col("_v").isNotNull)
        .sort("_v").limit(k.toInt).collect().lastOption.map(_.getDouble(0))
    }
  }

  /** PER-GROUP exact k-th smallest (1-based rank per group, nulls
    * ignored) — the grouped twin of [[exactKthSmallest]], built so a
    * caller with G groups pays a FIXED number of Spark jobs instead of
    * ~3·G (the q77 driver loop this replaces: VERDICT r7 item 1).
    *
    * Three jobs, each one full scan, regardless of |G|:
    *   pass 0 — grouped exact count of non-null values (needed to turn
    *            each group's rank into a percentile).
    *   pass 1 — ONE grouped `approx_percentile` sketch. The percentage
    *            argument must be foldable, so per-group percentiles
    *            can't vary inside the aggregate; instead the sketch is
    *            evaluated at the UNION of every group's bracket
    *            endpoints (2·|G| doubles — each group's mergeable
    *            digest answers all of them for free) and the driver
    *            picks each group's own pair.
    *   pass 2 — brackets broadcast back (|G|-row join side), ONE
    *            grouped bounded aggregate: exact below-bracket count,
    *            sorted in-bracket slice (≤ ≈4·n_g/accuracy values per
    *            group), ±1-rank neighbor pads for the small-group
    *            regime (same rationale as [[exactGroupPercentiles]]).
    *
    * The answer for group g is slice[(k_g−1) − below_g]. A bracket miss
    * (outside the sketch's rank-error contract — defensive only) falls
    * back to [[exactKthSmallest]] on that group's rows alone.
    *
    * Group keys are non-null strings (they come from `ks`); rows whose
    * group is not in `ks` are filtered before any scan.
    *
    * `knownCounts`, when provided, must be each group's NON-NULL value
    * count (callers like q77 already hold it from their quota math) —
    * it skips pass 0, taking the fixed job count down by one scan. */
  def exactGroupKthSmallest(df: DataFrame, g: String, c: String,
                            ks: Map[String, Long],
                            accuracy: Int = DefaultAccuracy,
                            knownCounts: Option[Map[String, Long]] = None): Map[String, Double] = {
    require(ks.nonEmpty, "need at least one (group, rank)")
    require(ks.values.forall(_ >= 1), s"ranks must be >= 1, got $ks")
    val v = col(c).cast("double")
    val in = df.filter(col(g).isin(ks.keys.toSeq: _*))
    val ns = knownCounts.getOrElse(
      in.groupBy(g).agg(count(v).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    ks.foreach { case (grp, k) =>
      require(ns.getOrElse(grp, 0L) >= k,
        s"group $grp has ${ns.getOrElse(grp, 0L)} non-null rows < rank $k")
    }
    val eps = 2.0 / accuracy
    val groups = ks.keys.toSeq.sorted
    val bounds = groups.map { grp =>
      val p = (ks(grp) - 1).toDouble / math.max(1L, ns(grp) - 1).toDouble
      (grp, math.max(0.0, p - eps), math.min(1.0, p + eps))
    }
    val pcts = bounds.flatMap { case (_, lo, hi) => Seq(lo, hi) }
    val sk = in.groupBy(g).agg(expr(
      s"approx_percentile(CAST($c AS DOUBLE), array(${pcts.mkString(", ")}), $accuracy)").as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val brackets = bounds.zipWithIndex.map { case ((grp, _, _), i) =>
      (grp, sk(grp)(2 * i), sk(grp)(2 * i + 1))
    }
    val spark = df.sparkSession
    import spark.implicits._
    val bdf = brackets.toDF(g, "_lo", "_hi")
    val pass2 = in.join(broadcast(bdf), g).groupBy(g).agg(
      sum(when(v < col("_lo"), 1L).otherwise(0L)).as("below"),
      sort_array(collect_list(when(v >= col("_lo") && v <= col("_hi"), v))).as("slice"),
      max(when(v < col("_lo"), v)).as("lopad"),
      min(when(v > col("_hi"), v)).as("hipad"))
      .collect().map { r =>
        val grp = r.getString(0)
        val loPad = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        val hiPad = if (r.isNullAt(4)) None else Some(r.getDouble(4))
        val vals = loPad.toSeq ++ r.getSeq[Double](2) ++ hiPad.toSeq
        val below = r.getLong(1) - loPad.size
        grp -> ((below, vals))
      }.toMap
    groups.map { grp =>
      val (below, vals) = pass2(grp)
      val idx = (ks(grp) - 1) - below
      val ans =
        if (idx >= 0 && idx < vals.size) vals(idx.toInt)
        else // defensive: per-group bracket miss outside the contract
          exactKthSmallest(in.filter(col(g) === grp), c, ks(grp), accuracy).get
      grp -> ans
    }.toMap
  }

  /** PER-GROUP exact percentiles via the same two-pass bracket plan,
    * fully declarative (no driver loop, works for any group count):
    *
    *   pass 1 — grouped `approx_percentile` sketches bracket every
    *            (group, p) rank in bounded, mergeable memory.
    *   pass 2 — brackets broadcast back onto the rows (|groups|·2|ps|
    *            doubles — tiny), then ONE grouped aggregate counts
    *            exact below-bracket ranks and collects only in-bracket
    *            values (≤ ≈4n_g/accuracy per group, vs the whole group
    *            that the single-buffer `percentile` aggregate holds).
    *   interpolation happens in column expressions with the same
    *   weighted form as [[interpolate]] — bit-identical to Spark's
    *   `percentile` and DuckDB `quantile_cont` (GroupQuantilesSpec
    *   asserts bit-equality).
    *
    * A bracket miss (impossible within the sketch's rank-error
    * contract) surfaces as a NULL qval — loudly wrong under the
    * oracle rather than silently approximate.
    *
    * Returns (g, q, qval) with one row per group per requested p. */
  def exactGroupPercentiles(df: DataFrame, g: String, c: String, ps: Seq[Double],
                            accuracy: Int = DefaultAccuracy): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val v = col(c).cast("double")
    val eps = 2.0 / accuracy
    val pcts = ps.flatMap(p => Seq(math.max(0.0, p - eps), math.min(1.0, p + eps)))
    val pass1 = df.groupBy(g).agg(
      count(v).as("n"),
      expr(s"approx_percentile(CAST($c AS DOUBLE), " +
        s"array(${pcts.mkString(", ")}), $accuracy)").as("b"))
    // null-safe (<=>) bracket join: groupBy emits a NULL-group row, and
    // an equi-join on g would silently drop it — the grouped percentile
    // aggregate this replaces keeps the null group, so must we.
    val joined = df.join(broadcast(pass1.withColumnRenamed(g, "__qg")),
      col(g) <=> col("__qg")).drop("__qg")
    // Each bracket is padded with its immediate out-of-bracket neighbors
    // (two more bounded scalar aggregates): when a group's n is under
    // `accuracy`, the ±2/accuracy percentile margin spans less than one
    // RANK and the sketch can return the same order statistic for both
    // endpoints, leaving the k+1 value interpolation needs outside the
    // slice. The ±1-rank pad covers that regime; at n ≥ accuracy the
    // margin itself guarantees ≥ 1 rank of slack on each side.
    val aggs = ps.indices.flatMap { i =>
      val lo = element_at(col("b"), 2 * i + 1)
      val hi = element_at(col("b"), 2 * i + 2)
      Seq(
        sum(when(v < lo, 1L).otherwise(0L)).as(s"below_$i"),
        sort_array(collect_list(when(v >= lo && v <= hi, v))).as(s"vals_$i"),
        max(when(v < lo, v)).as(s"lopad_$i"),
        min(when(v > hi, v)).as(s"hipad_$i"))
    }
    val allAggs = max(col("n")).as("n") +: aggs
    val pass2 = joined.groupBy(g).agg(allAggs.head, allAggs.tail: _*)
    val qcols = ps.zipWithIndex.map { case (p, i) =>
      val hasLoPad = col(s"lopad_$i").isNotNull
      val vals = concat(
        when(hasLoPad, array(col(s"lopad_$i"))).otherwise(array().cast("array<double>")),
        col(s"vals_$i"),
        when(col(s"hipad_$i").isNotNull, array(col(s"hipad_$i")))
          .otherwise(array().cast("array<double>")))
      val below = col(s"below_$i") - when(hasLoPad, 1L).otherwise(0L)
      val pos = lit(p) * (col("n") - 1).cast("double")
      val k = floor(pos)
      val idx = (k.cast("long") - below).cast("int")
      val loV = get(vals, idx)
      val hiV = get(vals, idx + 1)
      struct(lit(p).as("q"),
        when(pos === k, loV)
          .otherwise(loV * (k + lit(1) - pos) + hiV * (pos - k)).as("qval"))
    }
    pass2
      .select(col(g), explode(array(qcols: _*)).as("e"))
      .select(col(g), col("e.q").as("q"), col("e.qval").as("qval"))
  }

  /** Linear interpolation at rank p·(n−1) from a sorted slice `vals`
    * whose first element has global rank `below`. BIT-identical to
    * Spark's Percentile.getPercentile (and the DuckDB `quantile_cont`
    * the oracles hash against): the WEIGHTED form
    * `lo·(ceil−pos) + hi·(pos−floor)` — `lo + (hi−lo)·frac` differs in
    * the last ulp (caught by QuantilesSpec). */
  private def interpolate(p: Double, n: Long, below: Long,
                          vals: Seq[Double]): Option[Double] = {
    val pos = p * (n - 1)
    val k = math.floor(pos).toLong
    def at(i: Long): Option[Double] = {
      val j = i - below
      if (j >= 0 && j < vals.size) Some(vals(j.toInt)) else None
    }
    if (pos == k) at(k)
    else for (lv <- at(k); hv <- at(k + 1))
      yield lv * (k + 1 - pos) + hv * (pos - k)
  }

  // ------------------------------------------------ registered queries

  /** q61: the quantile scale path as a first-class, oracle-checked
    * query — exact multi-percentile summary of l_extendedprice computed
    * via the approx-bracket plan (NOT the single-buffer `percentile`
    * aggregate). The output is exact, so the DuckDB `quantile_cont`
    * oracle hash-matches; if the sketch bracket ever failed to contain
    * the true order statistics the values would diverge and the row
    * would go red — the approx machinery is itself under the oracle. */
  val QuantileApproxPs: Seq[Double] = Seq(0.5, 0.9, 0.99)

  def quantileApprox(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val vs = exactPercentiles(li, "l_extendedprice", QuantileApproxPs)
    val rows = QuantileApproxPs.zip(vs).map { case (p, x) =>
      Row(p, BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    s.createDataFrame(
      s.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("qval", org.apache.spark.sql.types.DoubleType))))
  }

  val quantileApproxSql: String = {
    val pts = QuantileApproxPs.mkString("[", ", ", "]")
    s"SELECT CAST(unnest($pts) AS DOUBLE) AS p, " +
      s"round(unnest(quantile_cont(l_extendedprice, $pts)), 4) AS qval " +
      "FROM lineitem"
  }

  // ---------------------------------- mergeable bottom-k sample sketch

  val SampleQK = 64

  /** q125 — MERGEABLE grouped quantile sketch via a bottom-k hash
    * sample: the k docs with the smallest md5 sample keys per language
    * are a uniform without-replacement sample, and the union of two
    * partitions' bottom-k IS the bottom-k of their union — so the
    * sketch merges associatively like KMV (q65), which the bracket
    * plan behind q61/q51 is not (its pass-2 exact recount needs the
    * full column again). This is the shape for federated/incremental
    * quantiles at 100 TB: each shard ships ≤ k (key, value) pairs,
    * any subset of shards merges driver-free, and a new day's data
    * folds into yesterday's sketch without rescanning it.
    *
    * The estimate is the sample's own ceil-rank order statistic
    * (rank ⌈m·p⌉ of m sampled values — integer arithmetic, FLOAT
    * RULE), so rank error is the classic bottom-k bound O(1/√k).
    * Where q61 answers EXACTLY by re-scanning, this answers
    * approximately but mergeably — both live in the registry so the
    * trade is measured, not asserted.
    *
    * Plan shape: one scan, ONE lang-keyed [[TopKAggregator.MinKBy]]
    * aggregate (map-side partials hold ≤ k rows per lang per task —
    * no window, no per-lang sort; the row_number rewrite funnels each
    * language's whole partition through one task). Sample keys are
    * the 53-bit md5 slice of "bq:"+doc_id — keyed on the ID, not the
    * text, so duplicate texts keep independent keys, and
    * exactly-representable in the aggregator's Double. */
  def sampleQuantiles(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    sampleQuantilesFrom(Tables.documents(s, d))

  /** [[sampleQuantiles]] over an explicit (doc_id, lang, n_chars)
    * frame — the unit SampleQuantilesSpec drives. */
  def sampleQuantilesFrom(documents: DataFrame): DataFrame = {
    val k = SampleQK
    documents
      .select(col("lang"), col("doc_id"), col("n_chars"),
        graft.functions.GraftFunctions
          .md5Lower53(concat(lit("bq:"), col("doc_id").cast("string")))
          .cast("double").as("skey"))
      .groupBy("lang")
      .agg(graft.ops.TopKAggregator.minKBy(k)(
        col("skey"), col("doc_id"), col("n_chars")).as("smp"))
      .select(col("lang"), sort_array(expr("transform(smp, e -> e._3)")).as("v"))
      .select(col("lang"),
        size(col("v")).cast("long").as("n_sample"),
        element_at(col("v"),
          expr("CAST((size(v) * 50 + 99) div 100 AS INT)")).as("est_p50"),
        element_at(col("v"),
          expr("CAST((size(v) * 90 + 99) div 100 AS INT)")).as("est_p90"))
  }

  val sampleQuantilesSql: String =
    s"""WITH h AS (SELECT lang, doc_id, n_chars,
       |  CAST(md5_number_lower('bq:' || CAST(doc_id AS VARCHAR)) >> 11 AS DOUBLE) AS skey FROM documents),
       |r AS (SELECT lang, n_chars, row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) AS rn FROM h),
       |s AS (SELECT lang, list_sort(list(n_chars)) AS v, count(*) AS m FROM r WHERE rn <= $SampleQK GROUP BY lang)
       |SELECT lang, CAST(m AS BIGINT) AS n_sample,
       |  v[CAST((m * 50 + 99) // 100 AS INT)] AS est_p50,
       |  v[CAST((m * 90 + 99) // 100 AS INT)] AS est_p90
       |FROM s""".stripMargin.replace("\n", " ")
}
