package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Byte-pair-encoding tokenizer: distributed statistics, driver-side
  * merge learning, distributed encode — the classic split of labor
  * (Sennrich et al. 2016, and how production tokenizer trainers work).
  *
  * The scale contract, explicitly:
  *
  *   - Anything CORPUS-sized stays distributed: the word-frequency
  *     aggregate that feeds training (one explode + one hash aggregate,
  *     map-side partials), and the encode pass (a broadcast of the
  *     merge ranks + one map over the docs — no shuffle at all).
  *   - Anything the driver touches is VOCABULARY-sized and bounded:
  *     training operates on (distinct word, freq) pairs capped at the
  *     [[MaxTrainVocab]] most frequent words via a bounded TakeOrdered
  *     (never a global sort), so driver memory is O(cap), independent
  *     of corpus size. Truncating the long tail of hapax words is what
  *     real BPE trainers do — a word seen once in 100 TB contributes
  *     nothing to pair counts that matters.
  *
  * The iterative merge loop itself is inherently sequential (merge k+1
  * depends on the counts AFTER merge k), which is exactly why it runs
  * on the contracted vocab table and not the corpus.
  */
object Bpe {

  val PairTopN      = 40    // q87 result size
  val MaxTrainVocab = 65536 // driver-side training vocabulary cap

  // ------------------------------------------------- q87: pair statistics

  /** q87 — corpus-wide adjacent character-pair frequencies, weighted by
    * word frequency: the exact table whose argmax is BPE's first merge,
    * and the oracle-checkable face of the trainer (the merge LOOP is
    * not SQL-expressible; it is property-tested in BpeSpec instead).
    *
    * Two hash aggregates: corpus words → (word, freq) collapses the
    * data to vocabulary size, then the pair explode runs over DISTINCT
    * words only — each word's characters are scanned once no matter how
    * often it occurs. Top-N executes as TakeOrdered (bounded per
    * partition), not a global sort of the pair table. */
  def pairStats(s: SparkSession, d: String): DataFrame = {
    val wf = Tables.documents(s, d)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    wf.filter(length(col("word")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")).as("pair"),
        col("freq"))
      .groupBy("pair").agg(sum("freq").as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(PairTopN)
  }

  val pairStatsSql: String =
    s"""WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents),
       |wf AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
       |p AS (SELECT unnest([substring(word, i, 2) for i in range(1, len(word))]) AS pair, freq
       |  FROM wf WHERE len(word) >= 2)
       |SELECT pair, CAST(sum(freq) AS BIGINT) AS freq FROM p GROUP BY pair
       |ORDER BY freq DESC, pair LIMIT $PairTopN""".stripMargin.replace("\n", " ")

  // --------------------------------------------------------- training

  /** One left-to-right pass replacing every adjacent (a, b) with a+b.
    * Overlaps resolve leftmost-first ("aaa" + merge (a,a) → [aa, a]),
    * matching the reference BPE behavior. */
  def mergePair(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `nMerges` merges from a (word, freq) table. Deterministic:
    * ties on count break to the lexicographically smallest pair, so
    * two runs (or two engines) learn the identical merge list. Stops
    * early when no pair occurs twice or nothing is left to merge. */
  def train(wordFreqs: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var vocab: Array[(Vector[String], Long)] =
      wordFreqs.map { case (w, f) => (w.map(_.toString).toVector, f) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) done = true
      else {
        val (pair, _) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        vocab = vocab.map { case (syms, f) => (mergePair(syms, pair._1, pair._2), f) }
      }
    }
    merges.toSeq
  }

  /** Distributed statistics + driver-side merge learning. The collect
    * is of the top-[[MaxTrainVocab]] (word, freq) rows — bounded,
    * vocabulary-grain, never corpus-grain. */
  def trainFromCorpus(s: SparkSession, d: String, nMerges: Int): Seq[(String, String)] = {
    val wf = Tables.documents(s, d)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(MaxTrainVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(wf, nMerges)
  }

  // ---------------------------------------------------------- encoding

  /** Encode one word with a learned rank table: repeatedly merge the
    * present pair with the LOWEST rank (earliest-learned wins — the BPE
    * inference rule, which reproduces training's segmentation) until no
    * ranked pair remains. */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else syms = mergePair(syms, best._1, best._2)
      if (syms.length < 2) continue = false
    }
    syms
  }

  /** Distributed encode: broadcast the rank table (merge-list-sized),
    * tokenize + encode per document in one codegen-adjacent map pass —
    * zero shuffles, cost O(corpus bytes). Output is the per-doc token
    * accounting a packing/budgeting stage consumes: word count, BPE
    * token count, and the compression ratio the tokenizer achieves. */
  def encodeDocs(s: SparkSession, d: String, merges: Seq[(String, String)]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val bc = s.sparkContext.broadcast(ranks)
    val wordRe = "[a-z]+".r
    val encodeUdf = udf { (text: String) =>
      val r = bc.value
      var nWords = 0L
      var nTokens = 0L
      for (m <- wordRe.findAllIn(text.toLowerCase)) {
        nWords += 1
        nTokens += encode(m, r).length
      }
      Array(nWords, nTokens)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), encodeUdf(col("text")).as("c"))
      .select(col("doc_id"),
        col("c").getItem(0).as("n_words"),
        col("c").getItem(1).as("n_tokens"),
        round(col("c").getItem(1).cast("double") /
          greatest(col("c").getItem(0), lit(1L)), 4).as("tokens_per_word"))
  }
}
