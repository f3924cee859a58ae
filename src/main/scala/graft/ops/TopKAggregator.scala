package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group as a typed Aggregator (SURVEY §4 "where
  * customs are warranted").
  *
  * The window formulation (`row_number().over(partitionBy(key)
  * .orderBy(score desc)) <= k`) shuffles EVERY row and sorts every
  * partition before discarding all but k — at 100 TB that's a full
  * sort of the fact table for a k-row-per-key answer. This Aggregator
  * keeps a k-bounded buffer, so Spark's partial aggregation does the
  * heavy lifting MAP-SIDE: each task reduces its input to ≤ k rows per
  * key before the exchange, and the shuffle moves only pre-reduced
  * buffers. Memory is O(k) per key per task; no sort anywhere (a final
  * ascending insertion per buffer entry — k is small by contract).
  *
  * Ties break on ascending id so results are deterministic and
  * engine-reproducible (matches the ORDER BY score DESC, id ASC oracle).
  */
object TopKAggregator {

  /** Total order over double sort keys, matching Spark's SQL ordering
    * (`SQLOrderingUtil.compareDoubles`): `-0.0 == 0.0`, and NaN sorts
    * as the LARGEST double. The naive `a > b || a == b` pair is NOT a
    * total order when NaN appears (both comparisons are false), which
    * made insertion position arrival-order-dependent — a zero-norm
    * embedding's NaN cosine would silently de-determinize the q20
    * family. With this compare the buffers reproduce the replaced
    * `row_number` window's ordering for every double, NaN included. */
  private def cmpScore(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  type Entry = (Double, Long) // (score, id)

  /** Insert `e` into `buf` (desc by score, asc by id), keep ≤ k. */
  private def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] = {
    def lt(a: Entry, b: Entry): Boolean = { // a ranks before b
      val c = cmpScore(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }
    val (head, tail) = buf.span(x => lt(x, e))
    val merged = head ::: e :: tail
    if (merged.length > k) merged.take(k) else merged
  }

  final class TopK(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    override def zero: List[Entry] = Nil
    override def reduce(b: List[Entry], a: Entry): List[Entry] = insert(b, a, k)
    override def merge(b1: List[Entry], b2: List[Entry]): List[Entry] =
      b2.foldLeft(b1)((acc, e) => insert(acc, e, k))
    override def finish(r: List[Entry]): Seq[Entry] = r
    override def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped column form, usable in any `groupBy(...).agg(...)`. */
  def topK(k: Int) = udaf(new TopK(k),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Entry]())

  /** Bounded min-K over long keys: keeps the k SMALLEST inputs in an
    * ascending sorted buffer — the posting-list accumulator for the
    * inverted index (q59). Same map-side-partial story as [[TopK]]:
    * each task reduces its input to ≤ k ids per group before the
    * exchange, so no full posting list ever materializes anywhere —
    * the fix for the r4 scale-killer that collect_set'd every doc id
    * per term before slicing. Inputs are assumed pre-deduplicated
    * (q59 stage 1 groups on (term, doc_id) first); a duplicated input
    * would occupy two buffer slots by design — dedup belongs in the
    * plan, where it shuffles as a hash aggregate, not in this buffer. */
  final class MinK(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    private def insert(buf: List[Long], v: Long): List[Long] = {
      val (head, tail) = buf.span(_ < v)
      val merged = head ::: v :: tail
      if (merged.length > k) merged.take(k) else merged
    }
    override def zero: List[Long] = Nil
    override def reduce(b: List[Long], a: Long): List[Long] = insert(b, a)
    override def merge(b1: List[Long], b2: List[Long]): List[Long] =
      b2.foldLeft(b1)(insert)
    override def finish(r: List[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped column form of [[MinK]]. */
  def minK(k: Int) = udaf(new MinK(k), Encoders.scalaLong)

  type KeyedEntry = (Double, Long, Long) // (sort key, id tiebreak, payload)

  /** Bounded k-smallest by (key asc, id asc), carrying one payload
    * column through the buffer — the grouped-sampling accumulator
    * (q60): `row_number().over(partitionBy(g).orderBy(key, id)) <= k`
    * funnels each group's FULL sort through one task when the group
    * cardinality is fixed (5 languages), whereas this buffer reduces
    * map-side to ≤ k rows per group per task and ranks by buffer
    * position. Memory O(k) per group per task, no sort, no window. */
  final class MinKBy(k: Int)
      extends Aggregator[KeyedEntry, (Int, List[KeyedEntry]), Seq[KeyedEntry]] {
    // capped-unsorted buffer with an explicit count, like [[MinKByStr]]:
    // O(1) cons per row, one sort+take(k) per 2k overflow — amortized
    // O(log k) per row vs the former sorted-insert's O(k) span
    private val ord: Ordering[KeyedEntry] = new Ordering[KeyedEntry] {
      override def compare(a: KeyedEntry, b: KeyedEntry): Int = {
        val c = cmpScore(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    private def compress(xs: List[KeyedEntry]): List[KeyedEntry] =
      xs.sorted(ord).take(k)
    override def zero: (Int, List[KeyedEntry]) = (0, Nil)
    override def reduce(b: (Int, List[KeyedEntry]), a: KeyedEntry): (Int, List[KeyedEntry]) = {
      val xs = a :: b._2
      if (b._1 + 1 > 2 * k) { val c = compress(xs); (c.length, c) }
      else (b._1 + 1, xs)
    }
    override def merge(b1: (Int, List[KeyedEntry]), b2: (Int, List[KeyedEntry])): (Int, List[KeyedEntry]) = {
      val xs = b1._2 ::: b2._2
      val n = b1._1 + b2._1
      if (n > 2 * k) { val c = compress(xs); (c.length, c) } else (n, xs)
    }
    override def finish(r: (Int, List[KeyedEntry])): Seq[KeyedEntry] = compress(r._2)
    override def bufferEncoder: Encoder[(Int, List[KeyedEntry])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[KeyedEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped column form of [[MinKBy]]: agg(minKBy(k)(key, id, payload)). */
  def minKBy(k: Int) = udaf(new MinKBy(k),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KeyedEntry]())

  type StrEntry = (String, Long) // (sort key, id tiebreak)

  /** [[MinKBy]] with a STRING sort key (lexicographic asc, id asc) —
    * the md5-ordered quota-sampling accumulator (q73). Byte-wise
    * compare over lowercase hex equals the engines' binary string
    * ordering, so buffer position reproduces the oracle's
    * ORDER BY md5 ASC, id ASC rank exactly.
    *
    * Unlike the k≤20 buffers above, q73's k is the LANGUAGE QUOTA —
    * it grows with the corpus (≈20k at sf1), so the sorted-list
    * insert the small buffers use (O(k) span per row) turns the
    * aggregate quadratic: measured 0.84 s → 19.6 s for 10× data in
    * the r13 sf1 sweep (PERF_NOTES). This buffer is instead UNSORTED
    * with an explicit count, capped at 2k: appends are O(1) cons and
    * each overflow compresses with ONE sort+take(k) — amortized
    * O(log k) per row, same (str asc, id asc) k-smallest result. */
  final class MinKByStr(k: Int)
      extends Aggregator[StrEntry, (Int, List[StrEntry]), Seq[StrEntry]] {
    private val ord: Ordering[StrEntry] = new Ordering[StrEntry] {
      override def compare(a: StrEntry, b: StrEntry): Int = {
        val c = a._1.compareTo(b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    private def compress(xs: List[StrEntry]): List[StrEntry] =
      xs.sorted(ord).take(k)
    override def zero: (Int, List[StrEntry]) = (0, Nil)
    override def reduce(b: (Int, List[StrEntry]), a: StrEntry): (Int, List[StrEntry]) = {
      val xs = a :: b._2
      if (b._1 + 1 > 2 * k) { val c = compress(xs); (c.length, c) }
      else (b._1 + 1, xs)
    }
    override def merge(b1: (Int, List[StrEntry]), b2: (Int, List[StrEntry])): (Int, List[StrEntry]) = {
      val xs = b1._2 ::: b2._2
      val n = b1._1 + b2._1
      if (n > 2 * k) { val c = compress(xs); (c.length, c) } else (n, xs)
    }
    override def finish(r: (Int, List[StrEntry])): Seq[StrEntry] = compress(r._2)
    override def bufferEncoder: Encoder[(Int, List[StrEntry])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[StrEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped column form of [[MinKByStr]]. */
  def minKByStr(k: Int) = udaf(new MinKByStr(k),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[StrEntry]())

  type ScoredEntry = (Double, Long, Double, Int) // (score, id, payload, tag)

  /** Bounded k-LARGEST by (score desc, id asc), carrying a double
    * payload and an int tag through the buffer — the neighbor-search
    * accumulator for the q20 family (q20/q104/q109). The per-anchor
    * `row_number` window those queries shipped with partitions the
    * CORPUS per anchor — a full shuffle + sort of N·|anchors| rows for
    * a k-row answer; this buffer holds ≤ k rows per anchor per task and
    * map-side partials collapse each task's contribution before the
    * exchange. score is the round-6-quantized cosine (ranking stays
    * oracle-stable), payload the raw cosine for display rounding, tag
    * any small int riding to the output (q104's neighbor label). */
  final class TopKByScore(k: Int)
      extends Aggregator[ScoredEntry, List[ScoredEntry], Seq[ScoredEntry]] {
    private def lt(a: ScoredEntry, b: ScoredEntry): Boolean = {
      val c = cmpScore(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }
    private def insert(buf: List[ScoredEntry], e: ScoredEntry): List[ScoredEntry] = {
      val (head, tail) = buf.span(x => lt(x, e))
      val merged = head ::: e :: tail
      if (merged.length > k) merged.take(k) else merged
    }
    override def zero: List[ScoredEntry] = Nil
    override def reduce(b: List[ScoredEntry], a: ScoredEntry): List[ScoredEntry] = insert(b, a)
    override def merge(b1: List[ScoredEntry], b2: List[ScoredEntry]): List[ScoredEntry] =
      b2.foldLeft(b1)(insert)
    override def finish(r: List[ScoredEntry]): Seq[ScoredEntry] = r
    override def bufferEncoder: Encoder[List[ScoredEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[ScoredEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped column form of [[TopKByScore]]:
    * agg(topKByScore(k)(score, id, payload, tag)). */
  def topKByScore(k: Int) = udaf(new TopKByScore(k),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ScoredEntry]())

  /** Top-3 customers by account balance per nation — the Aggregator in
    * a registered query. Output exploded to flat rows; rank recovered
    * from the (already sorted) buffer position. */
  def topBalancePerNation(s: SparkSession, d: String, k: Int = 3): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_nationkey")
      .agg(topK(k)(col("c_acctbal"), col("c_custkey")).as("top"))
      .select(col("c_nationkey"), posexplode(col("top")).as(Seq("rk", "e")))
      .select(
        col("c_nationkey"),
        (col("rk") + 1).as("rank"),
        col("e._2").as("c_custkey"),
        col("e._1").as("c_acctbal"))

  val topBalancePerNationSql: String =
    "WITH r AS (SELECT c_nationkey, c_custkey, c_acctbal, " +
      "row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rank " +
      "FROM customer) " +
      "SELECT c_nationkey, CAST(rank AS INT) AS rank, c_custkey, c_acctbal FROM r WHERE rank <= 3"
}
