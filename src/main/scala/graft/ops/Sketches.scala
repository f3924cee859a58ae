package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Distinct-count and frequency SKETCHES — the bounded-state answers to
  * "how many distinct keys" and "how often does key k occur" that a
  * 100 TB pipeline asks constantly, where exact answers would shuffle
  * the full key set.
  *
  * Both sketches here are DETERMINISTIC (md5-derived hashing, no seed,
  * no RNG), which buys two things: results are reproducible across
  * retries/engines, and the DuckDB oracle can recompute the identical
  * sketch bit-for-bit — so the approximate operators get the same
  * exact-match correctness gate as the relational ones, instead of the
  * weaker rows-only check.
  */
object Sketches {

  // ------------------------------------------------- KMV distinct count

  val KmvK = 1024

  /** Bounded bottom-k of DISTINCT long inputs, ascending. The KMV
    * buffer: ≤ k values per task cross the wire (map-side partial),
    * duplicates land in the same slot — this is what makes KMV cheaper
    * than `distinct().count()`, which shuffles EVERY distinct key; the
    * sketch shuffles ≤ k·tasks values total regardless of cardinality.
    *
    * The buffer is a sorted Array with an O(log k) binary-search
    * REJECT fast path: once full, a row only costs an insertion when
    * its hash beats the current k-th minimum — expected ~k·ln(n/k)
    * accepts over the whole stream, so per-row cost is the search, not
    * the shift (a linked-list buffer measured 13.7 s for this query at
    * sf0.1; this shape runs it in ~1 s). */
  final class MinKDistinct(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    private def insert(buf: Array[Long], v: Long): Array[Long] = {
      if (buf.length == k && v >= buf(k - 1)) return buf // reject: can't enter bottom-k
      val idx = java.util.Arrays.binarySearch(buf, v)
      if (idx >= 0) return buf // already present — distinct semantics
      val at = -idx - 1
      val n = math.min(buf.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(buf, 0, out, 0, at)
      out(at) = v
      System.arraycopy(buf, at, out, at + 1, n - at - 1)
      out
    }
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], a: Long): Array[Long] = insert(b, a)
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      // merge two sorted distinct arrays, keep the k smallest
      val out = new Array[Long](math.min(b1.length + b2.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < b1.length || j < b2.length)) {
        val take =
          if (j >= b2.length || (i < b1.length && b1(i) <= b2(j))) {
            val v = b1(i); if (j < b2.length && b2(j) == v) j += 1; i += 1; v
          } else { val v = b2(j); j += 1; v }
        out(o) = take; o += 1
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def minKDistinct(k: Int) = udaf(new MinKDistinct(k), Encoders.scalaLong)

  /** 2^63 as an exact double; (k-1)·2^63 is likewise exact (10+63
    * significant bits ≪ the 53-bit mantissa only because k-1 is a
    * power-of-two-adjacent SMALL factor: 1023·2^63 has 10 significant
    * bits). Division is IEEE correctly-rounded in both engines, so the
    * estimate is bit-identical to the oracle's. */
  private val TwoPow63 = math.pow(2, 63)

  /** q65: k-minimum-values distinct-count estimate over `l_partkey`.
    * est = (k-1) · 2^63 / h_(k)  where h_(k) is the k-th smallest
    * distinct 63-bit key hash; when fewer than k distinct keys exist
    * the sketch IS the key set and the count is exact. One bounded
    * aggregate — no distinct() shuffle, no full key set anywhere;
    * relative error ~ 1/√(k-1) ≈ 3% at k=1024. */
  def kmvDistinct(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .select(graft.functions.GraftFunctions
        .md5Lower64(col("l_partkey").cast("string"))
        .bitwiseAND(Long.MaxValue).as("h"))
      .agg(minKDistinct(KmvK)(col("h")).as("ks"))
      .select(
        size(col("ks")).cast("long").as("k_used"),
        element_at(col("ks"), -1).as("kth_hash"))
      .select(
        col("k_used"), col("kth_hash"),
        when(col("k_used") < KmvK, col("k_used").cast("double"))
          .otherwise(round(lit((KmvK - 1).toDouble * TwoPow63) / col("kth_hash"), 2))
          .as("est_distinct"))
  }

  val kmvDistinctSql: String =
    "WITH hs AS (SELECT DISTINCT md5_number_lower(CAST(l_partkey AS VARCHAR)) & 9223372036854775807 AS h FROM lineitem), " +
      s"k AS (SELECT h FROM hs ORDER BY h LIMIT $KmvK) " +
      "SELECT CAST(count(*) AS BIGINT) AS k_used, CAST(max(h) AS BIGINT) AS kth_hash, " +
      s"CASE WHEN count(*) < $KmvK THEN CAST(count(*) AS DOUBLE) " +
      s"ELSE round(${KmvK - 1}.0 * 9223372036854775808.0 / max(h), 2) END AS est_distinct " +
      "FROM k"

  // ------------------------------------------- count-min frequency sketch

  val CmDepth = 4
  val CmWidth = 1024 // power of two: bucket = hash & (width-1)

  /** q66: count-min sketch frequency estimates. The sketch is a
    * `depth × width` counter grid built by ONE hash aggregate over the
    * depth-exploded stream (grid rows are (r, bucket) keys — bounded at
    * depth·width = 4096 cells regardless of input size, with map-side
    * partials). A probe's estimate is the MIN of its `depth` cells;
    * overestimation only (collisions add, never subtract), bounded by
    * 2N/width with probability 1−2^−depth. Probes here are supplier
    * keys 1..20, joined against the grid and compared with their exact
    * counts — the overestimate is visible in-row.
    *
    * At 100 TB the grid stays 4096 cells whatever the key cardinality —
    * this is the frequency twin of the KMV cardinality sketch. */
  def countMinFreq(s: SparkSession, d: String): DataFrame = {
    // row hash = md5("$r:$key") & (width-1), via the native
    // Md5LowerLong expression (row index r is a compile-time literal,
    // so each depth's hash is one codegen'd call — no UDF in the scan).
    def rowsFor(keyName: String) = explode(array(
      (0 until CmDepth).map { i =>
        val h = graft.functions.GraftFunctions.md5Lower64(
          concat(lit(s"$i:"), col(keyName).cast("string")))
        struct(lit(i).as("r"), h.bitwiseAND(CmWidth - 1L).as("b"))
      }: _*)).as("e")
    val grid = Tables.lineitem(s, d)
      .select(rowsFor("l_suppkey"))
      .select(col("e.r").as("r"), col("e.b").as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))
    val probes = s.range(1, 21).select(col("id").as("suppkey"))
    val est = probes
      .select(col("suppkey"), rowsFor("suppkey"))
      .select(col("suppkey"), col("e.r").as("r"), col("e.b").as("b"))
      .join(grid, Seq("r", "b"), "left")
      .groupBy("suppkey")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
    val exact = Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("exact_count"))
    est.join(exact, Seq("suppkey"), "left")
      .select(col("suppkey"), col("est_count"),
        coalesce(col("exact_count"), lit(0L)).as("exact_count"))
  }

  val countMinFreqSql: String =
    s"""WITH ent AS (SELECT r, md5_number_lower(CAST(r AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR)) & ${CmWidth - 1} AS b
       |  FROM lineitem, range($CmDepth) t(r)),
       |cms AS (SELECT r, b, count(*) AS cnt FROM ent GROUP BY r, b),
       |probes AS (SELECT CAST(range AS BIGINT) AS suppkey FROM range(1, 21)),
       |ph AS (SELECT suppkey, r, md5_number_lower(CAST(r AS VARCHAR) || ':' || CAST(suppkey AS VARCHAR)) & ${CmWidth - 1} AS b
       |  FROM probes, range($CmDepth) t(r)),
       |est AS (SELECT suppkey, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est_count FROM ph LEFT JOIN cms USING (r, b) GROUP BY suppkey),
       |ex AS (SELECT l_suppkey AS suppkey, count(*) AS exact_count FROM lineitem WHERE l_suppkey <= 20 GROUP BY l_suppkey)
       |SELECT est.suppkey, est.est_count, CAST(coalesce(ex.exact_count, 0) AS BIGINT) AS exact_count
       |FROM est LEFT JOIN ex USING (suppkey)""".stripMargin.replace("\n", " ")

  // ------------------------------------------ Misra–Gries heavy hitters

  val MgK = 64 // sketch capacity: finds every key with freq > N/(MgK+1)

  /** Mergeable Misra–Gries summary over string keys, with the stream
    * length N carried in the same buffer so one pass yields both.
    *
    * reduce: hit → increment; room → insert; full miss → decrement ALL
    * (the MG step; zeros evicted). merge: sum counts, then if over
    * capacity subtract the (k+1)-th largest count from everything and
    * keep the positive survivors — the Agarwal et al. mergeable-summary
    * rule, which preserves the deterministic guarantee that any key
    * with true frequency > N/(k+1) remains in the summary with
    * estimate ≥ freq − N/(k+1).
    *
    * Unlike KMV/count-min (q65/q66) this sketch's ESTIMATES never leave
    * the plan: q91 recounts the bounded candidate set exactly, so the
    * sketch needs only its superset guarantee, not determinism of the
    * counts themselves. */
  final class MisraGries(k: Int)
      extends Aggregator[String, (Map[String, Long], Long), (Seq[String], Long)] {
    override def zero: (Map[String, Long], Long) = (Map.empty, 0L)
    override def reduce(b: (Map[String, Long], Long), key: String): (Map[String, Long], Long) = {
      val (m, n) = b
      m.get(key) match {
        case Some(c) => (m.updated(key, c + 1), n + 1)
        case None if m.size < k => (m.updated(key, 1L), n + 1)
        case None =>
          // decrement-all: one "vote" from every counter cancels the miss
          (m.collect { case (w, c) if c > 1 => (w, c - 1) }, n + 1)
      }
    }
    override def merge(b1: (Map[String, Long], Long),
                       b2: (Map[String, Long], Long)): (Map[String, Long], Long) = {
      val summed = b2._1.foldLeft(b1._1) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      }
      val trimmed =
        if (summed.size <= k) summed
        else {
          val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
          summed.collect { case (w, c) if c > cut => (w, c - cut) }
        }
      (trimmed, b1._2 + b2._2)
    }
    override def finish(r: (Map[String, Long], Long)): (Seq[String], Long) =
      (r._1.keys.toSeq.sorted, r._2)
    override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[(Seq[String], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def misraGries(k: Int) = udaf(new MisraGries(k), Encoders.STRING)

  /** q91 — HEAVY HITTERS with an exact answer from approximate
    * machinery: the Misra–Gries pass finds a ≤ [[MgK]]-key candidate
    * superset of everything with frequency > N/[[MgK]] (guaranteed —
    * the sketch can only miss keys at or below N/(k+1) < N/k), then a
    * second pass recounts ONLY the candidates exactly and keeps those
    * above the threshold. The integer comparison `freq·k > N` is what
    * the oracle computes directly — no sketch estimate ever reaches
    * the output, so no determinism requirement lands on the sketch.
    *
    * Scale: pass 1 shuffles ≤ (k+64)·tasks (map-side partial summaries,
    * never the vocabulary); pass 2 is a broadcast semi-join + a
    * ≤ k-group aggregate. `distinct().groupBy.count` over 100 TB of
    * tokens would shuffle every distinct token; this shuffles a few KB
    * per task, twice. */
  def heavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("w"))
    val sketch = toks.agg(misraGries(MgK)(col("w")).as("mg"))
      .select(col("mg._1").as("cands"), col("mg._2").as("n"))
    val cands = sketch.select(explode(col("cands")).as("w"), col("n"))
    toks.join(broadcast(cands), "w")
      .groupBy("w", "n").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * MgK > col("n"))
      .select(col("w"), col("freq"), col("n").as("n_tokens"))
  }

  val heavyHittersSql: String =
    s"""WITH tok AS (SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w FROM documents),
       |n AS (SELECT count(*) AS n_tokens FROM tok)
       |SELECT w, count(*) AS freq, n.n_tokens
       |FROM tok, n GROUP BY w, n.n_tokens
       |HAVING count(*) * $MgK > n.n_tokens""".stripMargin.replace("\n", " ")

  /** q102 — per-GROUP heavy hitters: the q91 sketch-then-recount
    * composition with the Misra–Gries summary as a grouped aggregate —
    * one bounded summary PER LANGUAGE rides the same hash exchange a
    * plain grouped count would (map-side partial summaries merge by
    * the Agarwal rule, SketchesSpec-tested), so "top tokens per
    * language over 100 TB" costs k keys per (task, language) on the
    * wire instead of the per-language vocabularies. Candidates then
    * recount exactly against the (lang, token) stream — a broadcast
    * semi-join, ≤ k·|langs| keys — and the output keeps only exact
    * frequencies above each language's n/k. */
  def groupedHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("lang"),
        explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("w"))
    val sketch = toks.groupBy("lang")
      .agg(misraGries(MgK)(col("w")).as("mg"))
      .select(col("lang"), col("mg._2").as("n_lang"),
        explode(col("mg._1")).as("w"))
    toks.join(broadcast(sketch), Seq("lang", "w"))
      .groupBy("lang", "w", "n_lang").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * MgK > col("n_lang"))
      .select(col("lang"), col("w"), col("freq"), col("n_lang"))
  }

  val groupedHeavyHittersSql: String =
    s"""WITH tok AS (SELECT lang, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w FROM documents),
       |n AS (SELECT lang, count(*) AS n_lang FROM tok GROUP BY lang)
       |SELECT tok.lang, w, count(*) AS freq, n.n_lang
       |FROM tok JOIN n USING (lang) GROUP BY tok.lang, w, n.n_lang
       |HAVING count(*) * $MgK > n.n_lang""".stripMargin.replace("\n", " ")

  // --------------------------------------- HLL-style register sketch

  /** 2^[[HllP]] registers; the estimate's standard error is
    * 1.04/√m ≈ 6.5% at m = 256. */
  val HllP = 8
  val HllM = 256
  /** Bits left in the 53-bit hash after the register index — the rank
    * window; ranks are 1..[[HllW]]+1. */
  val HllW = 45
  /** 2^50 — the fixed-point scale of the harmonic denominator. Each
    * register contributes 2^50 >> rank (empty register: rank 0 →
    * full 2^50), so the denominator Σ 2^(50−rank) is EXACT integer
    * arithmetic in both engines: a power of two shifted right by at
    * most [[HllW]]+1 < 50 bits never truncates. */
  val HllScale = 1125899906842624L

  /** q117 — DISTINCT-token cardinality per language via an HLL-style
    * register sketch. KMV (q65) already answers "how many distinct"
    * with a bottom-k; registers answer it with a FIXED 2^p-slot
    * vector whose merge is elementwise max — the property that lets
    * per-partition (or per-source, per-day, per-shard) sketches
    * combine into any union WITHOUT re-touching raw tokens, which is
    * how distinct counting actually runs at 100 TB (q118 exercises
    * exactly that merge).
    *
    * The plan is two bounded hash aggregates: (lang, register)
    * max-rank — map-side partial max caps the exchange at
    * |langs|·[[HllM]] rows per task however many tokens scanned —
    * then a |langs|-row rollup emitting integer cells only:
    * registers used, Σ ranks, and the harmonic denominator in
    * [[HllScale]] fixed point. The float estimate
    * α·m²·2^50/denom_x2p50 is display-side (SketchesSpec computes it
    * and checks it against the exact distinct count); nothing
    * fractional crosses the engine compare. */
  /** (key, reg, rank) token-register rows from a (key, text) frame —
    * the shared front half of q117/q118 and the streaming twin, so
    * every consumer hashes and ranks identically. */
  def tokenRegisters(docs: DataFrame, key: String): DataFrame = {
    // per-TOKEN hash — the hottest hash site in the repo; the native
    // Md5LowerLong expression hashes the UTF-8 bytes in-row inside
    // whole-stage codegen (PERF_NOTES r10 has the UDF/builtin-md5
    // variant measurements that picked it).
    docs
      .select(col(key),
        explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("w"))
      .select(col(key),
        graft.functions.GraftFunctions.md5Lower53(col("w")).as("h"))
      .select(col(key),
        (col("h") % HllM).as("reg"),
        shiftright(col("h"), HllP).as("v"))
      .select(col(key), col("reg"),
        when(col("v") === 0L, lit(HllW + 1))
          .otherwise(lit(HllW + 1) -
            graft.functions.GraftFunctions.bitLength64(col("v"))).as("rank"))
  }

  def hllDistinct(s: SparkSession, d: String): DataFrame = {
    val regs = tokenRegisters(Tables.documents(s, d), "lang")
      .groupBy("lang", "reg").agg(max("rank").as("mrank"))
    regs.groupBy("lang").agg(
      count(lit(1)).as("m_used"),
      sum("mrank").as("sum_rank"),
      (sum(expr(s"shiftright(${HllScale}L, cast(mrank AS INT))")) +
        (lit(HllM) - count(lit(1))) * HllScale).as("denom_x2p50"))
  }

  val hllDistinctSql: String =
    s"""WITH tok AS (SELECT lang, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w FROM documents),
       |h AS (SELECT lang, md5_number_lower(w) >> 11 AS h53 FROM tok),
       |rk AS (SELECT lang, h53 % $HllM AS reg,
       |  CASE WHEN h53 >> $HllP = 0 THEN ${HllW + 1}
       |       ELSE ${HllW + 1} - length(bin(h53 >> $HllP)) END AS rank FROM h),
       |mr AS (SELECT lang, reg, max(rank) AS mrank FROM rk GROUP BY lang, reg)
       |SELECT lang, count(*) AS m_used, CAST(sum(mrank) AS BIGINT) AS sum_rank,
       |  CAST(sum($HllScale >> mrank) + ($HllM - count(*)) * $HllScale AS BIGINT) AS denom_x2p50
       |FROM mr GROUP BY lang""".stripMargin.replace("\n", " ")

  /** The (day, reg, rank) user-register rows under q262 — the same
    * [[HllM]]/[[HllP]] algebra as q117's token registers with the key
    * swapped to the calendar day and the hashed item to the user id.
    * Shared by the batch query and the streaming twin so every
    * consumer hashes identically. Input schema: (ts, user_id). */
  def userDayRegisters(events: DataFrame): DataFrame =
    events
      .select(col("ts").cast("date").as("day"),
        graft.functions.GraftFunctions.md5Lower53(
          concat(lit("u:"), col("user_id").cast("string"))).as("h"))
      .select(col("day"),
        (col("h") % HllM).as("reg"),
        shiftright(col("h"), HllP).as("v"))
      .select(col("day"), col("reg"),
        when(col("v") === 0L, lit(HllW + 1))
          .otherwise(lit(HllW + 1) -
            graft.functions.GraftFunctions.bitLength64(col("v"))).as("rank"))

  /** The q117 fixed-point rollup over a (day, reg, mrank) register
    * snapshot — the batch tail AND the streaming replay. */
  def hllDauFromRegisters(regs: DataFrame): DataFrame =
    regs.groupBy("day").agg(
      count(lit(1)).as("m_used"),
      sum("mrank").as("sum_rank"),
      (sum(expr(s"shiftright(${HllScale}L, cast(mrank AS INT))")) +
        (lit(HllM) - count(lit(1))) * HllScale).as("denom_x2p50"))

  /** q262 — HLL DAU GRID: per-day distinct-user sketches in the q117
    * integer register algebra. q237 computes DAU/WAU/MAU EXACTLY —
    * the right call at audit time, but its per-day distinct expansion
    * is the thing that stops scaling first (distinct user sets per
    * day × 28-day fan-out). This is the production counterpart every
    * analytics store actually ships (HLL-sketched actives): state is
    * |days|·[[HllM]] registers FOREVER, days merge by register-max
    * (so WAU/MAU roll up from the same grid without re-touching
    * events), and the streaming twin
    * ([[graft.streaming.StreamingFraud.hllDauRegistersStream]]) holds
    * the identical grid as its only state — a snapshot replays this
    * table bit-for-bit (StreamingFraudSpec pins it).
    *
    * All emitted cells are the q117 fixed-point integers; the float
    * estimate is display-side (SketchesSpec checks it against q237's
    * exact DAU within HLL tolerance). */
  def hllDau(s: SparkSession, d: String): DataFrame =
    hllDauFromRegisters(
      userDayRegisters(Tables.events(s, d))
        .groupBy("day", "reg").agg(max("rank").as("mrank")))

  val hllDauSql: String =
    s"""WITH h AS (SELECT CAST(ts AS DATE) AS day,
       |  md5_number_lower('u:' || CAST(user_id AS VARCHAR)) >> 11 AS h53
       |  FROM events),
       |rk AS (SELECT day, h53 % $HllM AS reg,
       |  CASE WHEN h53 >> $HllP = 0 THEN ${HllW + 1}
       |       ELSE ${HllW + 1} - length(bin(h53 >> $HllP)) END AS rank FROM h),
       |mr AS (SELECT day, reg, max(rank) AS mrank FROM rk GROUP BY 1, 2)
       |SELECT day, count(*) AS m_used, CAST(sum(mrank) AS BIGINT) AS sum_rank,
       |  CAST(sum($HllScale >> mrank) + ($HllM - count(*)) * $HllScale AS BIGINT)
       |    AS denom_x2p50
       |FROM mr GROUP BY day""".stripMargin.replace("\n", " ")

  /** q118 — cross-SOURCE distinct-token overlap from merged register
    * sketches: build ONE (source, register) max-rank table from the
    * single token scan, then every source-pair's union denominator is
    * an elementwise max over two 256-slot vectors — the raw corpus is
    * never touched again, and |A∩B| ≈ E(A) + E(B) − E(A∪B) falls out
    * by inclusion–exclusion driver-side. This is the sketch-merge
    * pattern that replaces the quadratic "distinct tokens of A
    * intersect B" joins at 100 TB: per-source sketches are a few KB,
    * so even all-pairs over thousands of sources is a broadcast-size
    * problem (here: |sources|·[[HllM]] = 5120 sketch rows feed 190
    * pair rows).
    *
    * All emitted cells are integers of the q117 fixed-point algebra;
    * empty registers take rank 0 through the grid left-join so both
    * engines materialize the identical dense vectors. */
  def hllSourceUnion(s: SparkSession, d: String): DataFrame = {
    val regs = tokenRegisters(Tables.documents(s, d), "source")
      .groupBy("source", "reg").agg(max("rank").as("mrank"))
      .localCheckpoint(true) // one token scan feeds every pair below
    val srcs = regs.select("source").distinct()
    val grid = srcs
      .crossJoin(s.range(HllM).select(col("id").as("reg")))
      .join(regs, Seq("source", "reg"), "left")
      .select(col("source"), col("reg"),
        coalesce(col("mrank"), lit(0L)).as("mrank"))
    val a = grid.select(col("source").as("src_a"), col("reg"),
      col("mrank").as("rank_a"))
    val b = grid.select(col("source").as("src_b"), col("reg"),
      col("mrank").as("rank_b"))
    a.join(b, "reg").filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(
        sum(when(col("rank_a") > 0, 1L).otherwise(0L)).as("m_used_a"),
        sum(when(col("rank_b") > 0, 1L).otherwise(0L)).as("m_used_b"),
        sum(when(greatest(col("rank_a"), col("rank_b")) > 0, 1L)
          .otherwise(0L)).as("m_used_union"),
        sum(expr(s"shiftright(${HllScale}L, cast(rank_a AS INT))")).as("denom_a_x2p50"),
        sum(expr(s"shiftright(${HllScale}L, cast(rank_b AS INT))")).as("denom_b_x2p50"),
        sum(expr(s"shiftright(${HllScale}L, cast(greatest(rank_a, rank_b) AS INT))"))
          .as("denom_union_x2p50"))
  }

  val hllSourceUnionSql: String =
    s"""WITH tok AS (SELECT source, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w FROM documents),
       |h AS (SELECT source, md5_number_lower(w) >> 11 AS h53 FROM tok),
       |rk AS (SELECT source, h53 % $HllM AS reg,
       |  CASE WHEN h53 >> $HllP = 0 THEN ${HllW + 1}
       |       ELSE ${HllW + 1} - length(bin(h53 >> $HllP)) END AS rank FROM h),
       |mr AS (SELECT source, reg, max(rank) AS mrank FROM rk GROUP BY source, reg),
       |grid AS (SELECT s.source, g.reg, coalesce(mr.mrank, 0) AS mrank
       |  FROM (SELECT DISTINCT source FROM mr) s
       |  CROSS JOIN (SELECT unnest(range($HllM)) AS reg) g
       |  LEFT JOIN mr ON mr.source = s.source AND mr.reg = g.reg)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  CAST(sum(CASE WHEN a.mrank > 0 THEN 1 ELSE 0 END) AS BIGINT) AS m_used_a,
       |  CAST(sum(CASE WHEN b.mrank > 0 THEN 1 ELSE 0 END) AS BIGINT) AS m_used_b,
       |  CAST(sum(CASE WHEN greatest(a.mrank, b.mrank) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS m_used_union,
       |  CAST(sum($HllScale >> a.mrank) AS BIGINT) AS denom_a_x2p50,
       |  CAST(sum($HllScale >> b.mrank) AS BIGINT) AS denom_b_x2p50,
       |  CAST(sum($HllScale >> greatest(a.mrank, b.mrank)) AS BIGINT) AS denom_union_x2p50
       |FROM grid a JOIN grid b ON a.reg = b.reg AND a.source < b.source
       |GROUP BY a.source, b.source""".stripMargin.replace("\n", " ")

  // ---------------------------------------- order-insensitive checksum

  val CkBuckets = 32

  /** q132 — bucketed ORDER-INSENSITIVE table checksum: per hash
    * bucket, the row count and the XOR-fold of a 63-bit row hash over
    * the table's stable column rendering. This is the anti-entropy /
    * replication-verification primitive: two replicas (or a table
    * before and after a migration) compare 32 (count, xor) cells
    * instead of data; a mismatched bucket pins the diff to 1/32 of
    * the keyspace for a targeted re-read. XOR makes the fold
    * commutative+associative (row order and partitioning can't change
    * it) and self-inverse (a vanished row flips exactly its own
    * hash), and the per-bucket split makes the check MERGEABLE and
    * incremental — the 100 TB posture is one scan, map-side partial
    * xor, 32-row exchange.
    *
    * Hash = lower-63 of md5 over 'ck:' + pipe-joined key columns
    * (integers and strings only — their rendering is engine-stable,
    * the FLOAT RULE forbids hashing float renderings). */
  def tableChecksum(s: SparkSession, d: String): DataFrame = {
    val h = graft.functions.GraftFunctions.md5Lower64(
      concat_ws("|", lit("ck:"), col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus")))
      .bitwiseAND(Long.MaxValue)
    Tables.orders(s, d)
      .select(h.as("h"))
      .groupBy((col("h") % CkBuckets).as("bucket"))
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("h")).as("xor_sum"))
  }

  val tableChecksumSql: String =
    s"""WITH h AS (SELECT CAST(md5_number_lower('ck:' || '|' || CAST(o_orderkey AS VARCHAR)
       |  || '|' || CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus)
       |  & ${Long.MaxValue} AS BIGINT) AS h FROM orders)
       |SELECT h % $CkBuckets AS bucket, count(*) AS n_rows,
       |  CAST(bit_xor(h) AS BIGINT) AS xor_sum
       |FROM h GROUP BY 1""".stripMargin.replace("\n", " ")

  // ----------------------------------------- snapshot diff drill-down

  /** Modulus and bucket assignments for q137's simulated previous
    * snapshot (final literals — the r10 init-cycle rule). */
  final val DiffMod = 17L
  final val DiffAddBucket = 3L  // in current only  → "added"
  final val DiffChgBucket = 5L  // fingerprint drift → "changed"
  final val DiffRemBucket = 7L  // in previous only  → "removed"

  /** q137 — SNAPSHOT DIFF, the drill-down half of the anti-entropy
    * pair: q132's bucketed checksum says WHETHER two snapshots agree;
    * this op says WHICH keys differ and HOW — `added` (key only in
    * current), `removed` (only in previous), `changed` (same key,
    * different content fingerprint). Unchanged rows are NOT emitted:
    * the output is proportional to the drift, never the corpus —
    * that asymmetry is the whole reason replication repair, CDC
    * reconciliation, and crawl-delta admission can run nightly at
    * 100 TB. In production the two inputs are real snapshots and the
    * composition is q132-first (compare 32 cells, then run this diff
    * ONLY over the mismatched buckets' keyspace slice); here the
    * previous snapshot is derived deterministically from the current
    * one (drop one doc_id bucket, age another's text) so the oracle
    * can reproduce it.
    *
    * Scale shape: one hash-partitioned full-outer join on the key —
    * both sides shuffle once, no broadcast (snapshots are the same
    * size by definition), fingerprints computed in-scan with the
    * codegen'd Md5LowerLong (engine-stable rendering, FLOAT RULE:
    * integers and strings only). */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    def fp(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      graft.functions.GraftFunctions.md5Lower64(
      concat_ws("|", lit("fp:"), col("doc_id"), text)).bitwiseAND(Long.MaxValue)
    val docs = Tables.documents(s, d)
    val cur = docs.filter(col("doc_id") % DiffMod =!= DiffRemBucket)
      .select(col("doc_id"), fp(col("text")).as("cur_fp"))
    val prev = docs.filter(col("doc_id") % DiffMod =!= DiffAddBucket)
      .select(col("doc_id"), fp(
        when(col("doc_id") % DiffMod === DiffChgBucket,
          concat(col("text"), lit(" [stale]"))).otherwise(col("text"))).as("prev_fp"))
    snapshotDiffFrom(cur, prev)
  }

  /** [[snapshotDiff]] over explicit (doc_id, cur_fp) / (doc_id,
    * prev_fp) snapshot fingerprint frames — the unit SketchesSpec
    * drives and the generic production entry. */
  def snapshotDiffFrom(cur: DataFrame, prev: DataFrame): DataFrame =
    cur.join(prev, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("prev_fp").isNull, "added")
          .when(col("cur_fp").isNull, "removed")
          .when(col("cur_fp") =!= col("prev_fp"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"))

  val snapshotDiffSql: String =
    s"""WITH cur AS (SELECT doc_id, CAST(md5_number_lower('fp:' || '|'
       |    || CAST(doc_id AS VARCHAR) || '|' || text) & ${Long.MaxValue} AS BIGINT) AS fp
       |  FROM documents WHERE doc_id % $DiffMod != $DiffRemBucket),
       |prev AS (SELECT doc_id, CAST(md5_number_lower('fp:' || '|'
       |    || CAST(doc_id AS VARCHAR) || '|'
       |    || CASE WHEN doc_id % $DiffMod = $DiffChgBucket THEN text || ' [stale]' ELSE text END)
       |    & ${Long.MaxValue} AS BIGINT) AS fp
       |  FROM documents WHERE doc_id % $DiffMod != $DiffAddBucket)
       |SELECT COALESCE(c.doc_id, p.doc_id) AS doc_id,
       |  CASE WHEN p.doc_id IS NULL THEN 'added'
       |       WHEN c.doc_id IS NULL THEN 'removed'
       |       ELSE 'changed' END AS status
       |FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id
       |WHERE p.doc_id IS NULL OR c.doc_id IS NULL OR c.fp != p.fp""".stripMargin.replace("\n", " ")

  // ------------------------------------- CMS join-cardinality estimate

  /** q133 — JOIN-SIZE estimation from Count-Min sketches (Cormode &
    * Muthukrishnan 2005 §4.2: the inner product of two CMS rows upper-
    * bounds the true inner product, min over depths tightens it): the
    * cost-based-optimizer primitive. |A ⋈ B on k| = Σ_k cntA(k)·cntB(k)
    * — exact needs a key-grain aggregate of BOTH inputs; the sketch
    * answer needs only the two Depth×Width register grids, which are
    * per-table, mergeable, and maintainable incrementally — so a
    * catalog can price every candidate join from stored sketches
    * without touching data. Estimated here for a genuinely many-to-
    * many join (two lineitem slices on l_partkey — the self-join
    * shape PK/FK joins degenerate away from), with the exact size and
    * the scaled-integer relative error alongside: the overestimate is
    * MEASURED, not asserted.
    *
    * Width is [[JcWidth]], not q66's [[CmWidth]]: inner-product error
    * is ≈ ‖a‖₁·‖b‖₁/width per row, and at sf0.01 the slices carry
    * ~15k×30k weight — width 1024 was measured 180% over (est 690k vs
    * exact 247k); 2^16 brings the bound to ~1% for a 2 MB-per-table
    * sketch, the size a real catalog would store. */
  val JcWidth = 1 << 16

  def joinCardinality(s: SparkSession, d: String): DataFrame = {
    // Both slices ride ONE projected fact frame with membership flags,
    // so each grain (bucket, key) costs one scan with conditional
    // aggregates — the first cut built each slice's sketch and each
    // slice's key counts separately (4 fact scans; at 100 TB that is
    // 4× the I/O for identical arithmetic). The two grids then need
    // no join at all: a bucket row carries both sides' counters.
    val li = Tables.lineitem(s, d).select(
      col("l_partkey").as("k"),
      (col("l_returnflag") === "R").as("ina"),
      (col("l_quantity") > 30).as("inb"))
      .filter(col("ina") || col("inb"))
    val grid = li
      .select(explode(array(
        (0 until CmDepth).map { i =>
          val h = graft.functions.GraftFunctions.md5Lower64(
            concat(lit(s"$i:"), col("k").cast("string")))
          struct(lit(i).as("r"), h.bitwiseAND(JcWidth - 1L).as("b"),
            col("ina"), col("inb"))
        }: _*)).as("e"))
      .select(col("e.r").as("r"), col("e.b").as("b"), col("e.ina"), col("e.inb"))
      .groupBy("r", "b")
      .agg(count(when(col("ina"), 1)).as("ca"), count(when(col("inb"), 1)).as("cb"))
    // Same empty-intersection guard as q247's dotMin: a row with no
    // co-occupied bucket estimates 0 and must win the min.
    val est = grid.filter(col("ca") > 0 && col("cb") > 0)
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("dot"))
      .agg(coalesce(when(count(lit(1)) === CmDepth, min(col("dot"))),
        lit(0L)).as("est_rows"))
    val exact = li.groupBy("k")
      .agg(count(when(col("ina"), 1)).as("ca"), count(when(col("inb"), 1)).as("cb"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_rows"))
    exact.crossJoin(est) // two 1-row sides
      .select(col("exact_rows"), col("est_rows"),
        expr("(est_rows - exact_rows) * 10000 div exact_rows").as("over_x10k"))
  }

  val joinCardinalitySql: String =
    s"""WITH a AS (SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'),
       |b AS (SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 30),
       |ga AS (SELECT r, md5_number_lower(CAST(r AS VARCHAR) || ':' || CAST(k AS VARCHAR)) & ${JcWidth - 1} AS bk,
       |  count(*) AS ca FROM a, range($CmDepth) t(r) GROUP BY 1, 2),
       |gb AS (SELECT r, md5_number_lower(CAST(r AS VARCHAR) || ':' || CAST(k AS VARCHAR)) & ${JcWidth - 1} AS bk,
       |  count(*) AS cb FROM b, range($CmDepth) t(r) GROUP BY 1, 2),
       |est AS (SELECT CAST(CASE WHEN count(*) = $CmDepth THEN min(dot)
       |    ELSE 0 END AS BIGINT) AS est_rows FROM
       |  (SELECT ga.r, sum(ca * cb) AS dot FROM ga JOIN gb ON ga.r = gb.r AND ga.bk = gb.bk GROUP BY ga.r)),
       |ex AS (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS exact_rows FROM
       |  (SELECT k, count(*) AS ca FROM a GROUP BY k) xa
       |  JOIN (SELECT k, count(*) AS cb FROM b GROUP BY k) xb USING (k))
       |SELECT exact_rows, est_rows, (est_rows - exact_rows) * 10000 // exact_rows AS over_x10k
       |FROM ex, est""".stripMargin.replace("\n", " ")

  // --------------------------- sketch-driven join-order decision

  /** q247 — JOIN-ORDER ADVISOR from stored CMS sketches: the q133
    * primitive promoted to the decision it exists for. For the
    * 3-table join σ(lineitem) ⋈ σ(orders) ⋈ σ(customer) the final
    * cardinality is order-independent — what differs is the
    * INTERMEDIATE: start with L⋈O (on orderkey) or with O⋈C (on
    * custkey)? A cost-based optimizer answers from catalog
    * statistics, never data; here each filtered input carries one
    * Depth×[[JcWidth]] CMS per join key (per-table, mergeable,
    * incrementally maintainable — what a 100 TB catalog would
    * actually store), both intermediates are priced by the CMS
    * inner-product estimate, and the row emits the estimates, the
    * exact sizes, BOTH verdicts, and whether sketch-order == exact-
    * order — so the advisor's accuracy is measured in-band, the
    * q133/q157 discipline.
    *
    * Scale shape: one projected scan per table into bucket-grain
    * grids (≤ Depth·Width rows each, map-side partials); estimates
    * and the decision are grid math. The exact twins are key-grain
    * aggregates emitted HERE for audit; a production advisor skips
    * them — that asymmetry (sketches: O(grid); exact: O(data)) is
    * the point. */
  def joinOrderAdvisor(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.md5Lower64
    def grid(df: DataFrame, key: String, side: String): DataFrame =
      df.select(col(key).cast("string").as("k"))
        .select(explode(array((0 until CmDepth).map { i =>
          struct(lit(i).as("r"),
            md5Lower64(concat(lit(s"$i:"), col("k")))
              .bitwiseAND(JcWidth - 1L).as("b"))
        }: _*)).as("e"))
        .groupBy(col("e.r").as("r"), col("e.b").as("b"))
        .agg(count(lit(1)).as(s"c_$side"))
    // CMS semantics on empty intersections: a row r whose buckets never
    // co-occur has inner-product estimate 0 — it must WIN the min, not
    // vanish from it. If any of the CmDepth rows is absent after the
    // bucket join (count < CmDepth), the estimate is 0; likewise when
    // ALL rows are empty (count = 0, min would be NULL).
    def dotMin(ga: DataFrame, gb: DataFrame, out: String): DataFrame =
      ga.join(gb, Seq("r", "b"))
        .groupBy("r")
        .agg(sum(expr(s"${ga.columns.last} * ${gb.columns.last}")).as("dot"))
        .agg(coalesce(when(count(lit(1)) === CmDepth, min(col("dot"))),
          lit(0L)).as(out))
    def exactDot(a: DataFrame, ka: String, b: DataFrame, kb: String,
                 out: String): DataFrame =
      a.groupBy(col(ka).as("k")).agg(count(lit(1)).as("ca"))
        .join(b.groupBy(col(kb).as("k")).agg(count(lit(1)).as("cb")), "k")
        .agg(coalesce(sum(expr("ca * cb")), lit(0L)).as(out))

    val li = Tables.lineitem(s, d).filter(col("l_quantity") > 30)
      .select("l_orderkey").localCheckpoint(true)
    val ord = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select("o_orderkey", "o_custkey").localCheckpoint(true)
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").localCheckpoint(true)

    val estLo = dotMin(grid(li, "l_orderkey", "a"),
      grid(ord, "o_orderkey", "b"), "est_lo")
    val estOc = dotMin(grid(ord, "o_custkey", "a"),
      grid(cust, "c_custkey", "b"), "est_oc")
    val exLo = exactDot(li, "l_orderkey", ord, "o_orderkey", "exact_lo")
    val exOc = exactDot(ord, "o_custkey", cust, "c_custkey", "exact_oc")
    estLo.crossJoin(estOc).crossJoin(exLo).crossJoin(exOc) // four 1-row sides
      .select(col("est_lo"), col("est_oc"), col("exact_lo"), col("exact_oc"),
        expr("CASE WHEN est_lo <= est_oc THEN 'lineitem_orders_first' " +
          "ELSE 'orders_customer_first' END").as("sketch_order"),
        expr("CASE WHEN exact_lo <= exact_oc THEN 'lineitem_orders_first' " +
          "ELSE 'orders_customer_first' END").as("exact_order"))
      .withColumn("agree",
        expr("CAST(CASE WHEN sketch_order = exact_order THEN 1 ELSE 0 END AS BIGINT)"))
  }

  val joinOrderAdvisorSql: String = {
    def grid(src: String, key: String) =
      s"SELECT r, md5_number_lower(CAST(r AS VARCHAR) || ':' || CAST($key AS VARCHAR)) & ${JcWidth - 1} AS b, " +
        s"count(*) AS c FROM $src, range($CmDepth) t(r) GROUP BY 1, 2"
    s"""WITH li AS (SELECT l_orderkey FROM lineitem WHERE l_quantity > 30),
       |ord AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'O'),
       |cust AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
       |gl AS (${grid("li", "l_orderkey")}),
       |go AS (${grid("ord", "o_orderkey")}),
       |gc AS (${grid("ord", "o_custkey")}),
       |gd AS (${grid("cust", "c_custkey")}),
       |elo AS (SELECT CAST(CASE WHEN count(*) = $CmDepth THEN min(dot)
       |    ELSE 0 END AS BIGINT) AS est_lo FROM
       |  (SELECT gl.r, sum(gl.c * go.c) AS dot FROM gl
       |   JOIN go ON gl.r = go.r AND gl.b = go.b GROUP BY 1)),
       |eoc AS (SELECT CAST(CASE WHEN count(*) = $CmDepth THEN min(dot)
       |    ELSE 0 END AS BIGINT) AS est_oc FROM
       |  (SELECT gc.r, sum(gc.c * gd.c) AS dot FROM gc
       |   JOIN gd ON gc.r = gd.r AND gc.b = gd.b GROUP BY 1)),
       |xlo AS (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS exact_lo FROM
       |  (SELECT l_orderkey AS k, count(*) AS ca FROM li GROUP BY 1) a
       |  JOIN (SELECT o_orderkey AS k, count(*) AS cb FROM ord GROUP BY 1) b USING (k)),
       |xoc AS (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS exact_oc FROM
       |  (SELECT o_custkey AS k, count(*) AS ca FROM ord GROUP BY 1) a
       |  JOIN (SELECT c_custkey AS k, count(*) AS cb FROM cust GROUP BY 1) b USING (k))
       |SELECT est_lo, est_oc, exact_lo, exact_oc,
       |  CASE WHEN est_lo <= est_oc THEN 'lineitem_orders_first'
       |    ELSE 'orders_customer_first' END AS sketch_order,
       |  CASE WHEN exact_lo <= exact_oc THEN 'lineitem_orders_first'
       |    ELSE 'orders_customer_first' END AS exact_order,
       |  CAST(CASE WHEN (CASE WHEN est_lo <= est_oc THEN 1 ELSE 0 END)
       |    = (CASE WHEN exact_lo <= exact_oc THEN 1 ELSE 0 END)
       |    THEN 1 ELSE 0 END AS BIGINT) AS agree
       |FROM elo, eoc, xlo, xoc""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------- theta-sketch set operations

  val SetOpK     = 128 // per-source KMV size — small enough that the
                       // sketch path (not the exact small-set path)
                       // engages on the driver corpus
  val SetOpGramN = 3
  // sentinel θ when a source has fewer than K distinct grams: the
  // sketch IS the set and every hash is below θ (h == Long.MaxValue
  // has probability ~2^-63; both engines use the same strict <, so
  // results stay hash-exact regardless)
  val ThetaExact = Long.MaxValue

  /** q182 — theta-sketch (KMV) SET OPERATIONS between sources:
    * estimated union and intersection cardinality of every source
    * pair's distinct word-3-gram sets, from fixed-size sketches. The
    * capability q117/q118's HLL family cannot provide — HLL unions,
    * but only KMV/theta supports intersection/difference algebra
    * (Dasu et al.'s min-hash set resemblance; the DataSketches theta
    * model). The cross-source contamination matrix (q95) computes
    * these EXACTLY with a gram-grain join; this is its O(1)-per-source
    * summary twin — at 100 TB you keep a 128-hash sketch per source
    * (a catalog entry, not a table) and answer all C(S,2) overlap
    * questions without touching the corpus again.
    *
    * Algebra: θ_x = k-th smallest hash (or [[ThetaExact]] when |x| <
    * k); per pair θ = min(θ_a, θ_b); S'_x = {h ∈ sketch_x : h < θ};
    * est_∩ = |S'_a ∩ S'_b| · 2⁶³/θ, est_∪ = |S'_a ∪ S'_b| · 2⁶³/θ.
    * Integer sketch machinery end-to-end; only the final scaling is
    * floating point (same contract as q65).
    *
    * Plan shape: ONE gram-grain aggregate builds all sketches (the
    * bounded MinKDistinct buffer, map-side combinable), then a
    * broadcast self-join over |sources| rows does the algebra on
    * 128-element arrays — corpus touched once, pair stage is
    * sketch-sized. */
  def kmvSetOps(s: SparkSession, d: String): DataFrame =
    kmvPairAlgebra(kmvSourceSketches(Tables.documents(s, d)))

  /** The corpus-touching half of q182 — one gram-grain aggregate into a
    * k-bounded KMV sketch per source. Shared with the streaming twin
    * ([[graft.streaming.StreamingFraud.kmvSketchStream]]): the
    * MinKDistinct buffer is a fold over the hash MULTISET, so
    * micro-batch arrival order can't change the k smallest — the
    * stream's state converges to this batch table exactly. Input
    * schema: (source, text). */
  private[graft] def kmvSourceSketches(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        explode(graft.functions.GraftFunctions
          .wordGramsDistinct(col("text"), SetOpGramN)).as("gram"))
      .select(col("source"),
        graft.functions.GraftFunctions.md5Lower64(col("gram"))
          .bitwiseAND(Long.MaxValue).as("h"))
      .groupBy("source")
      .agg(minKDistinct(SetOpK)(col("h")).as("ks"))

  /** The sketch-sized half of q182 — θ derivation + pair algebra over
    * a (source, ks) sketch table. Runs identically on the batch
    * sketches and on a snapshot of the streaming twin's state (the
    * catalog-entry posture: answer C(S,2) overlap questions without
    * re-touching the corpus). */
  private[graft] def kmvPairAlgebra(sketches: DataFrame): DataFrame = {
    val sk = sketches
      .select(col("source"), col("ks"),
        when(size(col("ks")) < SetOpK, lit(ThetaExact))
          .otherwise(element_at(col("ks"), -1)).as("th"))
    val a = sk.select(col("source").as("src_a"), col("ks").as("ks_a"),
      col("th").as("th_a"))
    val b = sk.select(col("source").as("src_b"), col("ks").as("ks_b"),
      col("th").as("th_b"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .withColumn("theta", least(col("th_a"), col("th_b")))
      .withColumn("fa", filter(col("ks_a"), x => x < col("theta")))
      .withColumn("fb", filter(col("ks_b"), x => x < col("theta")))
      .select(
        col("src_a"), col("src_b"), col("theta"),
        size(col("fa")).cast("long").as("n_a"),
        size(col("fb")).cast("long").as("n_b"),
        size(array_intersect(col("fa"), col("fb"))).cast("long").as("n_inter"))
      .withColumn("est_inter",
        round(lit(TwoPow63) * col("n_inter") / col("theta"), 2))
      .withColumn("est_union",
        round(lit(TwoPow63) * (col("n_a") + col("n_b") - col("n_inter")) / col("theta"), 2))
  }

  val kmvSetOpsSql: String = {
    val n = SetOpGramN
    s"""WITH ws AS (SELECT source, list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS w FROM documents),
       |gr AS (SELECT source, unnest(list_distinct(CASE WHEN len(w) < $n THEN [array_to_string(w, ' ')]
       |  ELSE [array_to_string(w[i:i+${n - 1}], ' ') for i in range(1, len(w) - ${n - 2})] END)) AS gram FROM ws),
       |gh AS (SELECT DISTINCT source, md5_number_lower(gram) & 9223372036854775807 AS h FROM gr),
       |topk AS (SELECT source, h FROM
       |  (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM gh)
       |  WHERE rn <= $SetOpK),
       |sk AS (SELECT source, CASE WHEN count(*) < $SetOpK THEN $ThetaExact ELSE max(h) END AS th
       |  FROM topk GROUP BY source),
       |pr AS (SELECT a.source AS src_a, b.source AS src_b, least(a.th, b.th) AS theta
       |  FROM sk a JOIN sk b ON a.source < b.source),
       |ca AS (SELECT p.src_a, p.src_b, count(*) AS n_a FROM pr p
       |  JOIN topk k ON k.source = p.src_a AND k.h < p.theta GROUP BY 1, 2),
       |cb AS (SELECT p.src_a, p.src_b, count(*) AS n_b FROM pr p
       |  JOIN topk k ON k.source = p.src_b AND k.h < p.theta GROUP BY 1, 2),
       |ci AS (SELECT p.src_a, p.src_b, count(*) AS n_inter FROM pr p
       |  JOIN topk ka ON ka.source = p.src_a AND ka.h < p.theta
       |  JOIN topk kb ON kb.source = p.src_b AND kb.h = ka.h GROUP BY 1, 2)
       |SELECT p.src_a, p.src_b, CAST(p.theta AS BIGINT) AS theta,
       |  CAST(coalesce(ca.n_a, 0) AS BIGINT) AS n_a,
       |  CAST(coalesce(cb.n_b, 0) AS BIGINT) AS n_b,
       |  CAST(coalesce(ci.n_inter, 0) AS BIGINT) AS n_inter,
       |  round(9223372036854775808.0 * coalesce(ci.n_inter, 0) / p.theta, 2) AS est_inter,
       |  round(9223372036854775808.0 * (coalesce(ca.n_a, 0) + coalesce(cb.n_b, 0) - coalesce(ci.n_inter, 0)) / p.theta, 2) AS est_union
       |FROM pr p LEFT JOIN ca ON ca.src_a = p.src_a AND ca.src_b = p.src_b
       |LEFT JOIN cb ON cb.src_a = p.src_a AND cb.src_b = p.src_b
       |LEFT JOIN ci ON ci.src_a = p.src_a AND ci.src_b = p.src_b""".stripMargin.replace("\n", " ")
  }

  // --------------------------------------- equi-width histogram quantiles

  val HistBins = 256

  /** q274 — HISTOGRAM-SKETCH QUANTILES WITH AN EXACT-ERROR AUDIT: the
    * mergeable-quantile answer the sketch family lacked. An equi-width
    * [[HistBins]]-bin histogram is the simplest mergeable quantile
    * structure there is (bin counts add; fixed size; map-side partial
    * combine), and at 100 TB it is what you can afford to maintain
    * continuously — one pass, B counters per task, no value buffering.
    * The estimate at percentile p linearly interpolates inside the
    * covering bin (uniform-within-bin assumption). Each emitted row
    * carries the histogram ESTIMATE next to the EXACT order statistic
    * (via [[Quantiles.exactPercentiles]], the bracket two-pass that
    * replaced the single-buffer `percentile` in r5) and their absolute
    * error — the op ships its own accuracy audit, the same discipline
    * as the ANN recall evals (q21/q79).
    *
    * Scale shape: pass 1 is a 1-row min/max aggregate; pass 2 bins the
    * column against the broadcast range into a ≤ B-row grid; the
    * cumulative window runs on that B-row grid (grid-bounded single
    * partition, the q102/q237 posture). Determinism: bin edges are
    * pure IEEE arithmetic on (min, max) — the oracle replays the
    * identical formula, and the result is rounded at 4dp on both
    * sides (the q51 convention). */
  def histogramQuantiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ps = Seq(0.50, 0.95, 0.99)
    val li = Tables.lineitem(s, d)
    val x  = li.select(col("l_extendedprice").cast("double").as("x"))
    val exact = Quantiles.exactPercentiles(li, "l_extendedprice", ps)
    val mm = x.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    // DEGENERATE-COLUMN GUARD: when every value is identical the bin
    // width (hi−lo)/B is 0 and the unguarded bin expression divides by
    // zero (NaN here, inf-floor in DuckDB — divergent instead of
    // failing). Short-circuit: all mass in bin 0, and the est formula
    // below then yields lo EXACTLY (0-width · anything = 0).
    val grid = x.crossJoin(broadcast(mm))
      .select(when(col("hi") === col("lo"), lit(0L))
        .otherwise(least(floor((col("x") - col("lo")) /
            ((col("hi") - col("lo")) / HistBins)), lit(HistBins - 1))
          .cast("long")).as("bin"), col("lo"), col("hi"))
      .groupBy("bin", "lo", "hi").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("bin") // ≤ HistBins rows: grid-bounded, not corpus-bounded
    val cum = grid
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
    val targets = ps.zip(exact).map { case (p, e) => (math.round(p * 100).toInt, p, e) }
      .toDF("p_x100", "p", "exact_raw")
    cum.crossJoin(broadcast(targets))
      .withColumn("r", col("p") * (col("n") - 1) + 1)
      .filter(col("cum") >= col("r") && (col("cum") - col("cnt")) < col("r"))
      .select(
        col("p_x100"),
        round(col("lo") + ((col("hi") - col("lo")) / HistBins) *
          (col("bin") + (col("r") - (col("cum") - col("cnt"))) / col("cnt")), 4)
          .as("est"),
        round(col("exact_raw"), 4).as("exact"),
        round(abs(col("lo") + ((col("hi") - col("lo")) / HistBins) *
          (col("bin") + (col("r") - (col("cum") - col("cnt"))) / col("cnt"))
          - col("exact_raw")), 4).as("abs_err"))
  }

  val histogramQuantilesSql: String =
    s"""WITH mm AS (SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
       |    max(CAST(l_extendedprice AS DOUBLE)) AS hi FROM lineitem),
       |grid AS (SELECT CASE WHEN hi = lo THEN 0
       |      ELSE least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - lo)
       |      / ((hi - lo) / $HistBins)) AS BIGINT), ${HistBins - 1}) END AS bin,
       |    lo, hi, count(*) AS cnt
       |  FROM lineitem, mm GROUP BY 1, 2, 3),
       |cum AS (SELECT bin, lo, hi, cnt,
       |    sum(cnt) OVER (ORDER BY bin) AS cum,
       |    sum(cnt) OVER () AS n FROM grid),
       |qs AS (SELECT unnest([50, 95, 99]) AS p_x100,
       |    unnest([0.50, 0.95, 0.99]) AS p),
       |hit AS (SELECT q.p_x100,
       |    c.lo + ((c.hi - c.lo) / $HistBins) * (c.bin
       |      + (q.p * (c.n - 1) + 1 - (c.cum - c.cnt)) / c.cnt) AS est_raw
       |  FROM cum c JOIN qs q
       |    ON c.cum >= q.p * (c.n - 1) + 1
       |   AND (c.cum - c.cnt) < q.p * (c.n - 1) + 1),
       |ex AS (SELECT unnest([50, 95, 99]) AS p_x100,
       |    unnest(quantile_cont(CAST(l_extendedprice AS DOUBLE),
       |      [0.50, 0.95, 0.99])) AS exact_raw FROM lineitem)
       |SELECT h.p_x100, round(h.est_raw, 4) AS est,
       |  round(e.exact_raw, 4) AS exact,
       |  round(abs(h.est_raw - e.exact_raw), 4) AS abs_err
       |FROM hit h JOIN ex e ON h.p_x100 = e.p_x100""".stripMargin.replace("\n", " ")
}
