package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Unigram-LM tokenizer trainer (Kudo 2018 — the SentencePiece
  * "unigram" model), the other mainstream subword family next to BPE
  * ([[Bpe]]). Same split of labor as the BPE trainer, because the same
  * scale argument applies:
  *
  *   - CORPUS-sized work stays distributed: the word-frequency
  *     contraction (one explode + one hash aggregate — shared shape
  *     with q87) and the seed-piece statistics (substring explode over
  *     DISTINCT words only, so each word's characters are scanned once
  *     regardless of its corpus frequency). q272 registers the seed
  *     statistics — the exact table EM initializes from — as the
  *     oracle-checkable face; the EM loop itself is iterative
  *     numeric optimization, not SQL-expressible, and is pinned by
  *     UnigramSpec against an independent reference implementation
  *     plus the EM monotonicity property instead.
  *   - DRIVER-sized work is vocabulary-bounded: EM runs over the
  *     top-[[MaxTrainVocab]] (word, freq) rows and a seed vocabulary
  *     capped at [[SeedCap]] pieces — O(cap · maxWordLen · maxPieceLen)
  *     per iteration, independent of corpus size.
  *
  * Training: seed = frequent substrings (length ≤ [[SeedMaxLen]]);
  * repeat { EM to convergence-ish ([[EmIters]] sweeps of
  * forward-backward expected counts — the soft-count E-step over ALL
  * segmentations, not just the Viterbi one); prune the weakest
  * multi-char pieces } until the target vocab size; single characters
  * are never pruned, so every word stays encodable. Determinism: fixed
  * iteration order, fixed tie-breaks (probability desc, then piece
  * asc), pure double arithmetic in one JVM — two runs learn the
  * identical vocabulary.
  */
object Unigram {

  val SeedMaxLen    = 4     // seed substrings up to this length
  val SeedTopN      = 40    // q272 result size (the q87 convention)
  val SeedCap       = 20000 // driver-side seed vocabulary cap
  val MaxTrainVocab = 65536 // word-table cap shared with Bpe.trainFromCorpus
  val EmIters       = 2     // EM sweeps between prune steps
  val PruneKeep     = 0.75  // fraction of multi-char pieces kept per prune

  // ---------------------------------------------- q272: seed statistics

  /** q272 — corpus-wide frequent-substring statistics: every substring
    * of length 1..[[SeedMaxLen]] of every word, weighted by word
    * frequency — the seed table unigram-LM training initializes its
    * piece probabilities from (Kudo 2018 §3.2 seeds from frequent
    * substrings). Top-N by (freq desc, piece asc), executed as a
    * bounded TakeOrdered like q87.
    *
    * Scale shape: corpus → (distinct word, freq) contraction first
    * (vocabulary-grain from then on), then ≤ SeedMaxLen·|word| pieces
    * per DISTINCT word; two hash aggregates with map-side partials,
    * no window, no global sort. */
  def seedStats(s: SparkSession, d: String): DataFrame = {
    val wf = Tables.documents(s, d)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    wf.select(explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  filter(transform(sequence(1, $SeedMaxLen), l ->
           |    CASE WHEN i + l - 1 <= length(word)
           |         THEN substring(word, i, l) END),
           |  x -> x IS NOT NULL)))""".stripMargin.replace("\n", " ")))
        .as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("freq"))
      .orderBy(col("freq").desc, col("piece"))
      .limit(SeedTopN)
  }

  val seedStatsSql: String =
    s"""WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents),
       |wf AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
       |p AS (SELECT substring(word, CAST(i AS INT), CAST(l AS INT)) AS piece, freq
       |  FROM wf, range(1, ${SeedMaxLen + 1}) tl(l), range(1, 64) ti(i)
       |  WHERE i + l - 1 <= len(word))
       |SELECT piece, CAST(sum(freq) AS BIGINT) AS freq FROM p GROUP BY piece
       |ORDER BY freq DESC, piece LIMIT $SeedTopN""".stripMargin.replace("\n", " ")

  // ------------------------------------------------------------ training

  /** All (piece, weighted count) seeds of a word-frequency table:
    * substrings of length 1..[[SeedMaxLen]]. */
  private def seedCounts(wordFreqs: Seq[(String, Long)]): mutable.HashMap[String, Long] = {
    val cnt = mutable.HashMap.empty[String, Long]
    for ((w, f) <- wordFreqs; i <- 0 until w.length;
         l <- 1 to math.min(SeedMaxLen, w.length - i))
      cnt.updateWith(w.substring(i, i + l))(c => Some(c.getOrElse(0L) + f))
    cnt
  }

  private def logSumExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

  /** One EM sweep: forward-backward expected piece counts over every
    * word's segmentation lattice (soft counts over ALL segmentations),
    * then the multinomial M-step. Returns (new logProbs, total corpus
    * log-likelihood under the OLD probs) so callers can assert EM's
    * monotone-likelihood property. */
  def emStep(wordFreqs: Seq[(String, Long)],
             logP: Map[String, Double]): (Map[String, Double], Double) = {
    val expected = mutable.HashMap.empty[String, Double]
    var ll = 0.0
    for ((w, f) <- wordFreqs) {
      val n = w.length
      val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
      val beta = Array.fill(n + 1)(Double.NegativeInfinity)
      alpha(0) = 0.0; beta(n) = 0.0
      for (j <- 1 to n; i <- math.max(0, j - SeedMaxLen) until j) {
        val lp = logP.getOrElse(w.substring(i, j), Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity && alpha(i) != Double.NegativeInfinity)
          alpha(j) = logSumExp(alpha(j), alpha(i) + lp)
      }
      for (i <- n - 1 to 0 by -1; j <- i + 1 to math.min(n, i + SeedMaxLen)) {
        val lp = logP.getOrElse(w.substring(i, j), Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity && beta(j) != Double.NegativeInfinity)
          beta(i) = logSumExp(beta(i), lp + beta(j))
      }
      val z = alpha(n)
      if (z != Double.NegativeInfinity) {
        ll += f * z
        for (i <- 0 until n; j <- i + 1 to math.min(n, i + SeedMaxLen)) {
          val piece = w.substring(i, j)
          val lp = logP.getOrElse(piece, Double.NegativeInfinity)
          if (lp != Double.NegativeInfinity &&
              alpha(i) != Double.NegativeInfinity &&
              beta(j) != Double.NegativeInfinity) {
            val post = math.exp(alpha(i) + lp + beta(j) - z)
            expected.updateWith(piece)(c => Some(c.getOrElse(0.0) + f * post))
          }
        }
      }
    }
    val total = expected.values.sum
    val next = logP.keysIterator.map { p =>
      val e = expected.getOrElse(p, 0.0)
      // floor at a tiny mass so a piece unseen this sweep stays in the
      // lattice until the PRUNE step removes it (never -inf mid-EM)
      p -> math.log(math.max(e, 1e-12) / total)
    }.toMap
    (next, ll)
  }

  /** Learn a unigram-LM vocabulary of `vocabSize` pieces (single chars
    * always included) from a (word, freq) table. Returns piece →
    * log-probability, renormalized over the final vocabulary. */
  def train(wordFreqs: Seq[(String, Long)], vocabSize: Int): Map[String, Double] = {
    val seeds = seedCounts(wordFreqs)
    val chars = seeds.keysIterator.filter(_.length == 1).toSeq
    val multi = seeds.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(SeedCap).map(_._1)
    var vocabCnt: Seq[(String, Long)] =
      (chars ++ multi).map(p => p -> seeds(p)).sortBy(_._1)
    val seedTotal = vocabCnt.map(_._2).sum.toDouble
    var logP: Map[String, Double] =
      vocabCnt.map { case (p, c) => p -> math.log(c / seedTotal) }.toMap
    var done = false
    while (!done) {
      for (_ <- 1 to EmIters) logP = emStep(wordFreqs, logP)._1
      val nMulti = logP.count(_._1.length > 1)
      val targetMulti = math.max(vocabSize - chars.length, 0)
      if (nMulti <= targetMulti) done = true
      else {
        // prune the weakest multi-char pieces (lowest probability —
        // the cheap stand-in for Kudo's per-piece loss contribution;
        // ties break lexicographically for run-to-run determinism)
        val keep = math.max(targetMulti, (nMulti * PruneKeep).toInt)
        val kept = logP.iterator.filter(_._1.length > 1).toSeq
          .sortBy { case (p, lp) => (-lp, p) }.take(keep).map(_._1).toSet
        logP = logP.filter { case (p, _) => p.length == 1 || kept(p) }
      }
    }
    // final renormalization over the surviving vocabulary
    val total = logP.values.map(math.exp).sum
    logP.map { case (p, lp) => p -> (lp - math.log(total)) }
  }

  /** [[train]] over the distributed word-frequency contraction — the
    * [[Bpe.trainFromCorpus]] twin. The collect is vocabulary-grain and
    * capped, never corpus-grain. */
  def trainFromCorpus(s: SparkSession, d: String, vocabSize: Int): Map[String, Double] = {
    val wf = Tables.documents(s, d)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(MaxTrainVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(wf, vocabSize)
  }

  // ------------------------------------------------------------ encoding

  /** Viterbi segmentation of one word under the learned unigram LM:
    * the max-probability split. Ties break to the LONGER last piece
    * (smaller split point), then lexicographically — deterministic. */
  def encodeViterbi(word: String, logP: Map[String, Double]): Vector[String] = {
    val n = word.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    for (j <- 1 to n; i <- math.max(0, j - SeedMaxLen) until j) {
      val lp = logP.getOrElse(word.substring(i, j), Double.NegativeInfinity)
      if (lp != Double.NegativeInfinity && best(i) != Double.NegativeInfinity) {
        val cand = best(i) + lp
        if (cand > best(j) || (cand == best(j) && i < back(j))) {
          best(j) = cand; back(j) = i
        }
      }
    }
    if (best(n) == Double.NegativeInfinity)
      return word.map(_.toString).toVector // unreachable if chars are in-vocab
    val out = mutable.ArrayBuffer.empty[String]
    var j = n
    while (j > 0) { val i = back(j); out += word.substring(i, j); j = i }
    out.reverseIterator.toVector
  }

  /** Distributed encode with a broadcast vocabulary — the
    * [[Bpe.encodeDocs]] twin: per-doc word count, unigram piece count,
    * and pieces-per-word; zero shuffles, cost O(corpus bytes). */
  def encodeDocs(s: SparkSession, d: String, logP: Map[String, Double]): DataFrame = {
    val bc = s.sparkContext.broadcast(logP)
    val wordRe = "[a-z]+".r
    val encodeUdf = udf { (text: String) =>
      val v = bc.value
      var nWords = 0L
      var nPieces = 0L
      for (m <- wordRe.findAllIn(text.toLowerCase)) {
        nWords += 1
        nPieces += encodeViterbi(m, v).length
      }
      Array(nWords, nPieces)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), encodeUdf(col("text")).as("c"))
      .select(col("doc_id"),
        col("c").getItem(0).as("n_words"),
        col("c").getItem(1).as("n_pieces"),
        round(col("c").getItem(1).cast("double") /
          greatest(col("c").getItem(0), lit(1L)), 4).as("pieces_per_word"))
  }
}
