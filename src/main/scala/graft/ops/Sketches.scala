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
    val h63 = udf { (k: Long) => Hashing.md5Lower64(k.toString) & Long.MaxValue }
    Tables.lineitem(s, d)
      .select(h63(col("l_partkey")).as("h"))
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
    val bucket = udf { (r: Int, key: Long) =>
      Hashing.md5Lower64(s"$r:$key") & (CmWidth - 1)
    }
    def rowsFor(key: org.apache.spark.sql.Column) = explode(array(
      (0 until CmDepth).map(i =>
        struct(lit(i).as("r"), bucket(lit(i), key).as("b"))): _*)).as("e")
    val grid = Tables.lineitem(s, d)
      .select(rowsFor(col("l_suppkey")))
      .select(col("e.r").as("r"), col("e.b").as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))
    val probes = s.range(1, 21).select(col("id").as("suppkey"))
    val est = probes
      .select(col("suppkey"), rowsFor(col("suppkey")))
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
}
