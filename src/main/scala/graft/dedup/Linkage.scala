package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.ops.Tables

/** Entity-resolution blocking + probabilistic record linkage — the two
  * classic ER layers the dedup family lacked:
  *
  *  - MULTI-PASS SORTED NEIGHBORHOOD (Hernández & Stolfo, SIGMOD'95):
  *    sort the corpus under a cheap blocking key, compare each record
  *    only with the next [[W]]−1 records of the sort order, and run
  *    SEVERAL passes under DIFFERENT keys so a pair missed by one sort
  *    (typo in the leading token) is caught by another (different key
  *    field). The candidate mass is ≤ (W−1)·n·passes BY CONSTRUCTION —
  *    linear in the corpus, against LSH banding's collision-driven
  *    mass — which is why SN survives skew that melts a hash-blocking
  *    bucket: a hot key makes a LONG sorted run, not a quadratic one.
  *  - FELLEGI–SUNTER scoring (JASA 1969): per-pair agreement vectors
  *    over (lang, source, length-within-10%, token-Jaccard), scored by
  *    log-likelihood-ratio weights log2(m/u) / log2((1−m)/(1−u)). The
  *    u-probabilities (chance agreement among NON-matches) are
  *    ESTIMATED FROM THE DATA by frequency algebra — Σ n_v² / N² —
  *    never by pair enumeration; the m-probabilities are fixed priors
  *    (the standard bootstrap before an EM refinement).
  *
  * FLOAT RULE (engine-parity): all scoring is integer. u-probabilities
  * are ppm integers (Σ n_v² div (N² div 10⁶)); weights are BIT-LENGTH
  * quantized log-odds — w = bitlen((m·2¹⁰) div u) for agreement,
  * bitlen(((1−m)·2¹⁰) div (1−u)) − 11 for disagreement — each within
  * ±1 bit of the real log2, and bit-for-bit reproducible in DuckDB via
  * `length(bin(x))` (the q117 HLL-rank trick).
  *
  * Scale shape: each SN pass is ONE exchange (partition by block key,
  * sort within) + streaming `lead` windows — no join, no candidate
  * blow-up; block cardinality (lang × 3-char prefix, source × suffix)
  * grows with the VOCABULARY, block size with the corpus, and the
  * window cost is O(W) per row regardless. Verification joins the
  * (W−1)·n·2 candidates back to the token projection — candidate-grain,
  * never corpus². The u-estimation aggregates are value-domain-bounded
  * (|langs|, |sources|, |n_chars domain|² grid). N² div 10⁶ stays in
  * BIGINT up to N ≈ 3·10⁹ rows; past that the frequencies come from a
  * fixed-size sample (the q258 planner discipline) — documented, not
  * silent.
  */
object Linkage {

  /** SN window width: each record pairs with the next W−1 in sort order. */
  val W = 4
  /** Exact-Jaccard verification threshold (×10⁴). */
  val TauX10k = 5000L
  /** Fixed m-probability priors (ppm): P(field agrees | true match). */
  val MLang = 980000L
  val MSrc  = 600000L
  val MLen  = 900000L
  val MJac  = 800000L
  /** u for the Jaccard field is a fixed prior: chance near-duplication
    * is not estimable by frequency algebra (it IS the pair property),
    * and the corpus's planted dup mass (~5%) over the candidate space
    * puts chance agreement at O(100) ppm. */
  val UJacPrior = 100L
  /** FS decision thresholds on the bit-length score. */
  val ThetaMatch    = 40L
  val ThetaPossible = 20L

  private def bitLen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
  /** Jaccard-field weights are pure constants (fixed m and u priors). */
  val WaJac: Long = bitLen(MJac * 1024L / UJacPrior).toLong
  val WdJac: Long = bitLen((1000000L - MJac) * 1024L / (1000000L - UJacPrior)).toLong - 11L

  /** Shared projection: ids, block-key fields, distinct token set.
    * spreadScan: the single-row-group test parquet pins the scan (and
    * this pipelined tokenize) to ONE task — redistribute first. */
  private[graft] def proj(s: SparkSession, d: String): DataFrame = {
    val raw = split(trim(col("text")), "\\s+")
    graft.dedup.DedupQueries.spreadScan(s, Tables.documents(s, d)).select(
      col("doc_id"), col("lang"), col("source"), col("n_chars"),
      array_distinct(raw).as("toks"),
      substring(element_at(raw, 1), 1, 3).as("k1"),
      substring(element_at(raw, -1), 1, 3).as("k2"))
      .withColumn("nt", size(col("toks")).cast("long"))
  }

  /** One SN pass: pairs of records ≤ W−1 apart in the (block, n_chars,
    * doc_id) sort order, normalized to doc_a < doc_b. */
  private def passPairs(tt: DataFrame, part: Seq[String], pass: Int): DataFrame = {
    val w = Window.partitionBy(part.map(col): _*).orderBy("n_chars", "doc_id")
    tt.select((col("doc_id") +: part.map(col) :+ col("n_chars")): _*)
      .withColumn("nbs", array((1 until W).map(j => lead(col("doc_id"), j).over(w)): _*))
      .select(col("doc_id"), explode(col("nbs")).as("nb"))
      .filter(col("nb").isNotNull)
      .select(least(col("doc_id"), col("nb")).as("a"),
        greatest(col("doc_id"), col("nb")).as("b"), lit(pass).as("pass"))
  }

  /** Distinct candidate pairs with the number of passes that surfaced
    * each (the multi-pass evidence count). */
  private[graft] def candidates(tt: DataFrame): DataFrame =
    passPairs(tt, Seq("lang", "k1"), 1)
      .unionAll(passPairs(tt, Seq("source", "k2"), 2))
      .groupBy("a", "b").agg(countDistinct(col("pass")).as("n_passes"))

  /** Candidates joined back to both sides' attributes + exact Jaccard
    * (×10⁴ integer) — the shared verify stage. */
  private def scored(s: SparkSession, d: String): DataFrame = {
    val tt = proj(s, d).localCheckpoint() // one shingling, three consumers
    val ta = tt.select(col("doc_id").as("a"), col("toks").as("toks_a"),
      col("nt").as("nt_a"), col("lang").as("lang_a"),
      col("source").as("src_a"), col("n_chars").as("nc_a"))
    val tb = tt.select(col("doc_id").as("b"), col("toks").as("toks_b"),
      col("nt").as("nt_b"), col("lang").as("lang_b"),
      col("source").as("src_b"), col("n_chars").as("nc_b"))
    candidates(tt).join(ta, "a").join(tb, "b")
      .withColumn("i", size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("j_x10k", expr("i * 10000 div greatest(nt_a + nt_b - i, 1)"))
  }

  /** q275 — multi-pass SN near-duplicate pairs: candidates within the
    * sort windows, kept iff exact token-Jaccard ≥ [[TauX10k]]. */
  def sortedNeighborhood(s: SparkSession, d: String): DataFrame =
    scored(s, d).filter(col("j_x10k") >= TauX10k)
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("j_x10k"), col("n_passes"))

  /** q276 — Fellegi–Sunter agreement-pattern table over the SN
    * candidates: one row per observed 4-bit agreement pattern
    * (lang, source, length, jaccard) with its pair count, integer
    * log-odds score, and match/possible/non_match verdict. The
    * pattern-grain output (≤ 2⁴ rows) is the classic FS presentation
    * AND the bounded thing a 100 TB run ships to the driver; the
    * per-pair classification is this table joined back to candidates
    * (pattern → verdict is a pure map). */
  def fellegiSunter(s: SparkSession, d: String): DataFrame = {
    val tt = proj(s, d)
    val nn = tt.agg(count(lit(1)).as("n"))
    val ul = tt.groupBy("lang").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("s_lang"))
    val us = tt.groupBy("source").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("s_src"))
    val byLen = tt.groupBy("n_chars").agg(count(lit(1)).as("c"))
    val ulen = byLen.select(col("n_chars").as("va"), col("c").as("ca"))
      .crossJoin(broadcast(byLen.select(col("n_chars").as("vb"), col("c").as("cb"))))
      .filter(abs(col("va") - col("vb")) * 10 <= least(col("va"), col("vb")))
      .agg(sum(col("ca") * col("cb")).as("s_len"))
    val u = nn.crossJoin(ul).crossJoin(us).crossJoin(ulen).select(
      expr("s_lang div greatest(n * n div 1000000, 1)").as("u_lang"),
      expr("s_src  div greatest(n * n div 1000000, 1)").as("u_src"),
      expr("s_len  div greatest(n * n div 1000000, 1)").as("u_len"))
    def wa(m: Long, uc: String) = GraftFunctions.bitLength64(
      expr(s"$m * 1024 div greatest($uc, 1)")).cast("long")
    def wd(m: Long, uc: String) = GraftFunctions.bitLength64(
      expr(s"${1000000L - m} * 1024 div greatest(1000000 - $uc, 1)"))
      .cast("long") - 11L
    val wtab = u.select(
      wa(MLang, "u_lang").as("wa_lang"), wd(MLang, "u_lang").as("wd_lang"),
      wa(MSrc, "u_src").as("wa_src"), wd(MSrc, "u_src").as("wd_src"),
      wa(MLen, "u_len").as("wa_len"), wd(MLen, "u_len").as("wd_len"))
    scored(s, d).crossJoin(broadcast(wtab))
      .withColumn("g1", (col("lang_a") === col("lang_b")).cast("int"))
      .withColumn("g2", (col("src_a") === col("src_b")).cast("int"))
      .withColumn("g3", (abs(col("nc_a") - col("nc_b")) * 10 <=
        least(col("nc_a"), col("nc_b"))).cast("int"))
      .withColumn("g4", (col("j_x10k") >= TauX10k).cast("int"))
      .withColumn("score",
        when(col("g1") === 1, col("wa_lang")).otherwise(col("wd_lang")) +
        when(col("g2") === 1, col("wa_src")).otherwise(col("wd_src")) +
        when(col("g3") === 1, col("wa_len")).otherwise(col("wd_len")) +
        when(col("g4") === 1, lit(WaJac)).otherwise(lit(WdJac)))
      .withColumn("pattern", concat(col("g1").cast("string"),
        col("g2").cast("string"), col("g3").cast("string"),
        col("g4").cast("string")))
      .groupBy("pattern", "score").agg(count(lit(1)).as("n_pairs"))
      .withColumn("verdict",
        when(col("score") >= ThetaMatch, "match")
          .when(col("score") >= ThetaPossible, "possible")
          .otherwise("non_match"))
      .select(col("pattern"), col("n_pairs"), col("score"), col("verdict"))
  }

  // -------------------------------------------------- weighted MinHash

  /** Replication cap: a token with tf ≥ [[WmhCap]] contributes exactly
    * WmhCap replicas. Caps the signature work per document AND defines
    * the (capped) weighted-Jaccard semantics the estimate targets. */
  val WmhCap = 8
  /** Signature length. */
  val WmhK = 32

  /** The K rehash planes: ONE md5 per replica element, reduced once to
    * the Mersenne-31 field (h' = h mod P, P = 2³¹−1), then K classic
    * universal maps g_k(h') = (a_k·h' + b_k) mod P — the r18
    * replacement for K SALTED md5s per replica, which were the query's
    * measured hot loop (32 digests of ~20-char strings per replicated
    * token dominated the signature stage). The multipliers wrap the
    * field ~2³⁰ times, so per-plane minima are effectively independent
    * orderings (the textbook Carter–Wegman MinHash family; the first
    * attempt used a non-wrapping wide-field affine map whose planes
    * all agreed on globally-small hashes — mean estimator error went
    * 3181 vs the spec's 1500 bound — and was discarded).
    *
    * Engine parity is pure integer algebra: operands positive,
    * a_k < 2³⁰ and h' < 2³¹ keep every product < 2⁶¹, so BIGINT never
    * overflows in either engine and % agrees. The (a, b) planes derive
    * from md5 of fixed labels — both engines inline identical
    * literals. */
  val WmhP: Long = (1L << 31) - 1
  val wmhA: IndexedSeq[Long] = (0 until WmhK)
    .map(k => (Hashing.md5Lower64(s"wmh-a:$k") & ((1L << 30) - 1)) | 1L)
  val wmhB: IndexedSeq[Long] = (0 until WmhK)
    .map(k => Hashing.md5Lower64(s"wmh-b:$k") >>> 34) // 30 bits, < P

  /** g_k as SQL text over the field-reduced column `h` — identical
    * characters in the Spark expression and the DuckDB oracle. */
  def wmhPlaneSql(k: Int): String =
    s"(${wmhA(k)} * h + ${wmhB(k)}) % $WmhP"

  /** q277 — WEIGHTED MINHASH with an exact audit: multiset (tf-
    * weighted) Jaccard for the SN candidate pairs, estimated by the
    * replication construction — replicate token t into min(tf, cap)
    * distinct elements t#1..t#min(tf,cap), then plain MinHash over the
    * replicated sets IS an unbiased estimator of the capped weighted
    * Jaccard Σ min(tf_a,tf_b) / Σ max(tf_a,tf_b) (Haveliwala et al.'s
    * rounding trick; ICWS without the continuous machinery). Unweighted
    * Jaccard (q275) calls a doc that repeats one phrase 10× and a doc
    * using it once identical — the weighted form is what boilerplate
    * and spam detection actually need.
    *
    * Each output row carries est_x10k (fraction of the [[WmhK]]
    * signature slots that agree) NEXT TO exact_x10k — the op ships its
    * own accuracy audit (the q274/q21 discipline). Hash math: ONE
    * 53-bit md5 per replica element, then the [[wmhA]] affine rehash
    * planes give the K per-slot orderings (r18: the K-salted-md5 form
    * spent its whole signature stage inside md5 — 32 digests per
    * replicated token; one digest + K integer maps is the standard
    * universal-hashing MinHash construction and both engines compute
    * it exactly).
    *
    * Scale shape: signatures are ONE pass over the (doc, token, tf)
    * contraction — explode to ≤ cap replicas, then K min-aggregates
    * with map-side partials → one K-column row per doc (a few hundred
    * bytes; at 100 TB the signature table is the thing you persist,
    * the corpus is read once). The estimate join is candidate-grain;
    * the exact audit joins per-pair token INTERSECTIONS (r19: one
    * inner join + a doc-grain size table via Σmax = Σa + Σb − Σmin —
    * the r18 form materialized the per-pair token UNION with a
    * distinct and two extra left joins at strictly larger grain). */
  def weightedMinhash(s: SparkSession, d: String): DataFrame = {
    val tt = proj(s, d).localCheckpoint()
    val pairs = candidates(tt).select(col("a"), col("b"))
    // The (doc, token, ctf) contraction feeds FIVE consumers (the
    // signature replicas, both ptoks legs, both exact-audit joins).
    // localCheckpoint truncates the lineage so the corpus tokenize +
    // aggregate runs ONCE instead of relying on silent exchange reuse
    // (the q116/q260 lesson: shared frontiers get an explicit pin —
    // LinkagePlanSpec asserts the final plan holds no parquet scan).
    // At 100 TB this materialization IS the design: the tf table is
    // the thing you persist, the corpus is read once.
    val tf = graft.dedup.DedupQueries.spreadScan(s, Tables.documents(s, d))
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("doc_id", "token")
      .agg(least(count(lit(1)), lit(WmhCap.toLong)).as("ctf"))
      .localCheckpoint()
    val reps = tf.select(col("doc_id"), col("token"),
        explode(expr("sequence(1, ctf)")).as("i"))
      .select(col("doc_id"),
        (GraftFunctions.md5Lower53(concat(lit("wmh:"), col("token"),
          lit("#"), col("i").cast("string"))) % WmhP).as("h"))
    val sigAggs = (0 until WmhK).map { k =>
      min(expr(wmhPlaneSql(k))).as(s"s$k")
    }
    val sig = reps.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    val sa = sig.toDF(("doc_id" +: (0 until WmhK).map(k => s"a$k")): _*)
      .withColumnRenamed("doc_id", "a")
    val sb = sig.toDF(("doc_id" +: (0 until WmhK).map(k => s"b$k")): _*)
      .withColumnRenamed("doc_id", "b")
    val est = pairs.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"),
        expr(s"CAST((${(0 until WmhK).map(k => s"IF(a$k = b$k, 1, 0)").mkString(" + ")}) * 10000 div $WmhK AS BIGINT)")
          .as("est_x10k"))
    // Exact audit via the min/max identity (r19 — the r18 form built a
    // per-pair token UNION: two pair⋈tf joins + a distinct + two more
    // left joins, all at candidate·union-tokens grain. Pointwise on the
    // union, min(a,b) + max(a,b) = a + b with absent = 0, so
    //   Σ max = Σ ctf_a + Σ ctf_b − Σ_∩ min
    // and the audit needs only the INTERSECTION join (pair ⋈ tf_a
    // ⋈ tf_b on token — inner, no distinct, strictly smaller grain)
    // plus one doc-grain size table. Same integers out, three fewer
    // candidate-grain passes.)
    val sz = tf.groupBy("doc_id").agg(sum(col("ctf")).as("sz"))
    val inter = pairs
      .join(tf.select(col("doc_id").as("a"), col("token"), col("ctf").as("ctf_a")), "a")
      .join(tf.select(col("doc_id").as("b"), col("token"), col("ctf").as("ctf_b")),
        Seq("b", "token"))
      .groupBy("a", "b")
      .agg(sum(least(col("ctf_a"), col("ctf_b"))).as("smin"))
    val exact = pairs
      .join(sz.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sz.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
      .join(inter, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        expr("coalesce(smin, 0) * 10000 div greatest(sza + szb - coalesce(smin, 0), 1)")
          .as("exact_x10k"))
    est.join(exact, Seq("a", "b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("est_x10k"), col("exact_x10k"))
  }

  // `pa` is MATERIALIZED to pin the audit's join ASSOCIATION-FIRST:
  // inlined, DuckDB's cardinality estimate (EC 12 500 vs the real
  // ~1.4M tf rows at sf1) reorders the intersection to ta ⋈ tb ON
  // token alone — a ~31-word vocabulary makes that ~10¹⁰ intermediate
  // rows (one replay shard was OOM-killed at 70 GB this round).
  // Materializing the pair⋈tf_a side (candidate·token grain, ~100 K
  // rows) forces the (doc_id, token)-keyed probe. Same integers out.
  val weightedMinhashSql: String = {
    val sigCols = (0 until WmhK).map(k =>
      s"min(${wmhPlaneSql(k)}) AS s$k").mkString(", ")
    val matchSum = (0 until WmhK).map(k =>
      s"CASE WHEN sa.s$k = sb.s$k THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $candSql,
       |tf AS (SELECT doc_id, token, least(count(*), $WmhCap) AS ctf FROM
       |    (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
       |     FROM documents) GROUP BY 1, 2),
       |reps AS (SELECT doc_id,
       |    CAST(md5_number_lower('wmh:' || token || '#' || CAST(i AS VARCHAR)) >> 11 AS BIGINT) % $WmhP AS h
       |  FROM (SELECT doc_id, token, unnest(range(1, ctf + 1)) AS i FROM tf)),
       |sig AS (SELECT doc_id, $sigCols FROM reps GROUP BY doc_id),
       |est AS (SELECT g.a, g.b, ($matchSum) * 10000 // $WmhK AS est_x10k
       |  FROM grp g JOIN sig sa ON sa.doc_id = g.a JOIN sig sb ON sb.doc_id = g.b),
       |sz AS (SELECT doc_id, sum(ctf) AS sz FROM tf GROUP BY doc_id),
       |pa AS MATERIALIZED (SELECT g.a, g.b, ta.token, ta.ctf AS ctf_a
       |  FROM grp g JOIN tf ta ON ta.doc_id = g.a),
       |ix AS (SELECT pa.a, pa.b, sum(least(pa.ctf_a, tb.ctf)) AS smin
       |  FROM pa
       |  JOIN tf tb ON tb.doc_id = pa.b AND tb.token = pa.token
       |  GROUP BY 1, 2),
       |ex AS (SELECT g.a, g.b, coalesce(ix.smin, 0) AS smin,
       |    za.sz + zb.sz - coalesce(ix.smin, 0) AS smax
       |  FROM grp g
       |  JOIN sz za ON za.doc_id = g.a
       |  JOIN sz zb ON zb.doc_id = g.b
       |  LEFT JOIN ix ON ix.a = g.a AND ix.b = g.b)
       |SELECT e.a AS doc_a, e.b AS doc_b,
       |  CAST(e.est_x10k AS BIGINT) AS est_x10k,
       |  CAST(x.smin * 10000 // greatest(x.smax, 1) AS BIGINT) AS exact_x10k
       |FROM est e JOIN ex x ON x.a = e.a AND x.b = e.b""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------------------------------- oracles

  /** Shared SQL prefix: projection, two SN passes, candidate group,
    * attribute join-back with exact Jaccard. */
  private lazy val candSql: String =
    s"""t AS (SELECT doc_id, lang, source, n_chars,
       |    list_distinct(string_split_regex(trim(text), '\\s+')) AS toks,
       |    string_split_regex(trim(text), '\\s+') AS rawt
       |  FROM documents),
       |tt AS (SELECT doc_id, lang, source, n_chars, toks,
       |    CAST(len(toks) AS BIGINT) AS nt,
       |    substr(rawt[1], 1, 3) AS k1, substr(rawt[-1], 1, 3) AS k2 FROM t),
       |pp AS (
       |  SELECT doc_id, [lead(doc_id, 1) OVER w1, lead(doc_id, 2) OVER w1,
       |    lead(doc_id, 3) OVER w1] AS nbs, 1 AS pass FROM tt
       |    WINDOW w1 AS (PARTITION BY lang, k1 ORDER BY n_chars, doc_id)
       |  UNION ALL
       |  SELECT doc_id, [lead(doc_id, 1) OVER w2, lead(doc_id, 2) OVER w2,
       |    lead(doc_id, 3) OVER w2] AS nbs, 2 AS pass FROM tt
       |    WINDOW w2 AS (PARTITION BY source, k2 ORDER BY n_chars, doc_id)),
       |cand0 AS (SELECT doc_id, unnest(nbs) AS nb, pass FROM pp),
       |grp AS (SELECT least(doc_id, nb) AS a, greatest(doc_id, nb) AS b,
       |    count(DISTINCT pass) AS n_passes
       |  FROM cand0 WHERE nb IS NOT NULL GROUP BY 1, 2),
       |ver AS (SELECT g.a, g.b, g.n_passes,
       |    ta.lang AS lang_a, tb.lang AS lang_b,
       |    ta.source AS src_a, tb.source AS src_b,
       |    ta.n_chars AS nc_a, tb.n_chars AS nc_b,
       |    CAST(len(list_intersect(ta.toks, tb.toks)) AS BIGINT) AS i,
       |    ta.nt + tb.nt AS stot
       |  FROM grp g JOIN tt ta ON ta.doc_id = g.a JOIN tt tb ON tb.doc_id = g.b),
       |jac AS (SELECT *, i * 10000 // greatest(stot - i, 1) AS j_x10k FROM ver)""".stripMargin

  val sortedNeighborhoodSql: String =
    s"""WITH $candSql
       |SELECT a AS doc_a, b AS doc_b, CAST(j_x10k AS BIGINT) AS j_x10k,
       |  CAST(n_passes AS BIGINT) AS n_passes
       |FROM jac WHERE j_x10k >= $TauX10k""".stripMargin.replace("\n", " ")

  val fellegiSunterSql: String =
    s"""WITH $candSql,
       |nn AS (SELECT count(*) AS n FROM tt),
       |ul AS (SELECT sum(c * c) AS s_lang FROM
       |  (SELECT count(*) AS c FROM tt GROUP BY lang)),
       |us AS (SELECT sum(c * c) AS s_src FROM
       |  (SELECT count(*) AS c FROM tt GROUP BY source)),
       |ln0 AS (SELECT n_chars AS v, count(*) AS c FROM tt GROUP BY 1),
       |ulen AS (SELECT sum(ca.c * cb.c) AS s_len FROM ln0 ca, ln0 cb
       |  WHERE abs(ca.v - cb.v) * 10 <= least(ca.v, cb.v)),
       |up AS (SELECT
       |  CAST(s_lang // greatest(n * n // 1000000, 1) AS BIGINT) AS u_lang,
       |  CAST(s_src  // greatest(n * n // 1000000, 1) AS BIGINT) AS u_src,
       |  CAST(s_len  // greatest(n * n // 1000000, 1) AS BIGINT) AS u_len
       |  FROM nn, ul, us, ulen),
       |wt AS (SELECT
       |  CAST(length(bin($MLang * 1024 // greatest(u_lang, 1))) AS BIGINT) AS wa_lang,
       |  CAST(length(bin(${1000000L - MLang} * 1024 // greatest(1000000 - u_lang, 1))) AS BIGINT) - 11 AS wd_lang,
       |  CAST(length(bin($MSrc * 1024 // greatest(u_src, 1))) AS BIGINT) AS wa_src,
       |  CAST(length(bin(${1000000L - MSrc} * 1024 // greatest(1000000 - u_src, 1))) AS BIGINT) - 11 AS wd_src,
       |  CAST(length(bin($MLen * 1024 // greatest(u_len, 1))) AS BIGINT) AS wa_len,
       |  CAST(length(bin(${1000000L - MLen} * 1024 // greatest(1000000 - u_len, 1))) AS BIGINT) - 11 AS wd_len
       |  FROM up),
       |sc AS (SELECT
       |  CASE WHEN lang_a = lang_b THEN 1 ELSE 0 END AS g1,
       |  CASE WHEN src_a = src_b THEN 1 ELSE 0 END AS g2,
       |  CASE WHEN abs(nc_a - nc_b) * 10 <= least(nc_a, nc_b) THEN 1 ELSE 0 END AS g3,
       |  CASE WHEN j_x10k >= $TauX10k THEN 1 ELSE 0 END AS g4,
       |  wt.* FROM jac, wt),
       |ps AS (SELECT
       |  CAST(g1 AS VARCHAR) || CAST(g2 AS VARCHAR) ||
       |  CAST(g3 AS VARCHAR) || CAST(g4 AS VARCHAR) AS pattern,
       |  (CASE WHEN g1 = 1 THEN wa_lang ELSE wd_lang END
       |   + CASE WHEN g2 = 1 THEN wa_src ELSE wd_src END
       |   + CASE WHEN g3 = 1 THEN wa_len ELSE wd_len END
       |   + CASE WHEN g4 = 1 THEN $WaJac ELSE $WdJac END) AS score
       |  FROM sc)
       |SELECT pattern, count(*) AS n_pairs, CAST(score AS BIGINT) AS score,
       |  CASE WHEN score >= $ThetaMatch THEN 'match'
       |       WHEN score >= $ThetaPossible THEN 'possible'
       |       ELSE 'non_match' END AS verdict
       |FROM ps GROUP BY pattern, score""".stripMargin.replace("\n", " ")
}
