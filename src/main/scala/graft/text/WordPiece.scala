package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** WordPiece tokenizer — the BERT-lineage subword family, completing
  * the three deployed tokenizer families next to BPE ([[Bpe]], merge
  * ranks) and unigram-LM ([[Unigram]], Viterbi under piece
  * probabilities). What distinguishes WordPiece IN DEPLOYMENT is its
  * encoder: greedy LONGEST-MATCH-FIRST against a vocabulary whose
  * non-initial pieces carry the '##' continuation marker (Schuster &
  * Nakajima 2012; Devlin et al. 2018 §WordPiece) — no rank table, no
  * lattice, just one longest-prefix scan per word position.
  *
  * Same split of labor as the other two trainers, same scale argument:
  *
  *   - CORPUS-sized work stays distributed: the word-frequency
  *     contraction (one explode + one hash aggregate — the q87/q272
  *     shape) and the position-marked piece statistics (substring
  *     explode over DISTINCT words only). q286 registers the marked
  *     seed table — the frequency evidence vocabulary selection reads
  *     — as the oracle-checkable face; the greedy encoder is pinned
  *     by WordPieceSpec against hand-computed references (the
  *     canonical "unaffable" → [un, ##aff, ##able] example included).
  *   - DRIVER-sized work is vocabulary-bounded: selection collects the
  *     top-[[MaxTrainVocab]] marked pieces and keeps the most frequent
  *     [[DefaultVocabSize]], with every observed single-character
  *     piece (both forms) force-included so any trained-on word stays
  *     encodable — unknown words take the [[Unk]] token, BERT's rule.
  *
  * The vocabulary here is selected by FREQUENCY over the marked-seed
  * evidence (the transparent, engine-exact criterion); the original
  * likelihood-gain merge criterion is the [[Bpe]]/[[Unigram]] pair's
  * territory — what q286 + the spec pin is the piece-statistics
  * contraction and the deployed greedy-encode semantics. */
object WordPiece {

  val SeedMaxLen      = 4     // marked pieces carry ≤ this many chars
  val SeedTopN        = 40    // q286 result size (the q87/q272 convention)
  val MaxTrainVocab   = 65536 // driver-side piece-table cap
  val DefaultVocabSize = 8192
  val Unk             = "[UNK]"

  /** Word positions contributing pieces are capped at this bound IN
    * BOTH ENGINES: the oracle enumerates positions via
    * `range(1, MaxWordPositions + 1)` and the Spark side caps its
    * `sequence` at `least(length, MaxWordPositions)` — one shared
    * constant, so a pathological 64+-char lowercase run cannot make
    * the engines diverge (r17 advice: the bound used to live only in
    * the SQL). BERT's own tokenizer skips words past a length cap for
    * the same reason; 63 covers every natural-language word. */
  val MaxWordPositions = 63

  /** The shared corpus-grain evidence pipeline: word-frequency
    * contraction, then position-marked substring explode over DISTINCT
    * words, summed per marked piece — ONE definition read by both
    * [[seedStats]] (top-[[SeedTopN]], the q286 face) and
    * [[trainFromCorpus]] (top-[[MaxTrainVocab]] collect), so the
    * trained vocabulary can never silently drift from the
    * oracle-checked evidence table (r17 advice: the expression used
    * to be duplicated verbatim). */
  private def markedPieceFreqs(s: SparkSession, d: String): DataFrame = {
    val wf = Tables.documents(s, d)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    wf.select(explode(expr(
        s"""flatten(transform(sequence(1, least(length(word), $MaxWordPositions)), i ->
           |  filter(transform(sequence(1, $SeedMaxLen), l ->
           |    CASE WHEN i + l - 1 <= length(word)
           |         THEN CASE WHEN i = 1 THEN substring(word, i, l)
           |              ELSE concat('##', substring(word, i, l)) END END),
           |  x -> x IS NOT NULL)))""".stripMargin.replace("\n", " ")))
        .as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("freq"))
  }

  // ------------------------------------ q286: marked piece statistics

  /** q286 — corpus-wide POSITION-MARKED substring statistics: every
    * substring of length 1..[[SeedMaxLen]] of every word, weighted by
    * word frequency, with WordPiece's continuation marking — a
    * word-initial substring counts as `piece`, a non-initial one as
    * `##piece`. This is the evidence table WordPiece vocabulary
    * selection reads (BERT's vocab distinguishes "able" from "##able"
    * because initial and continuation occurrences are DIFFERENT
    * distributions — exactly what the marking separates). Top-N by
    * (freq desc, piece asc), executed as a bounded TakeOrdered.
    *
    * Scale shape: corpus → (distinct word, freq) contraction first
    * (vocabulary-grain from then on), then ≤ SeedMaxLen·|word| marked
    * pieces per DISTINCT word; two hash aggregates with map-side
    * partials, no window, no global sort — the q272 plan with one
    * extra CASE in the projected piece. */
  def seedStats(s: SparkSession, d: String): DataFrame =
    markedPieceFreqs(s, d)
      .orderBy(col("freq").desc, col("piece"))
      .limit(SeedTopN)

  val seedStatsSql: String =
    s"""WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents),
       |wf AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
       |p AS (SELECT CASE WHEN i = 1 THEN substring(word, CAST(i AS INT), CAST(l AS INT))
       |    ELSE '##' || substring(word, CAST(i AS INT), CAST(l AS INT)) END AS piece, freq
       |  FROM wf, range(1, ${SeedMaxLen + 1}) tl(l), range(1, ${MaxWordPositions + 1}) ti(i)
       |  WHERE i + l - 1 <= len(word))
       |SELECT piece, CAST(sum(freq) AS BIGINT) AS freq FROM p GROUP BY piece
       |ORDER BY freq DESC, piece LIMIT $SeedTopN""".stripMargin.replace("\n", " ")

  // ------------------------------------------------------------ training

  /** Frequency-based vocabulary selection from a (marked piece, freq)
    * table: the top `vocabSize` pieces by (freq desc, piece asc), with
    * every single-character piece present in the evidence (both the
    * initial and '##' form) force-included so any word whose characters
    * were all observed stays encodable. Deterministic: pure ordering,
    * fixed tie-breaks. */
  def selectVocab(pieceFreqs: Seq[(String, Long)], vocabSize: Int): Set[String] = {
    def isChar(p: String): Boolean =
      p.length == 1 || (p.startsWith("##") && p.length == 3)
    val chars = pieceFreqs.iterator.map(_._1).filter(isChar).toSet
    val rest = pieceFreqs.filter { case (p, _) => !isChar(p) }
      .sortBy { case (p, f) => (-f, p) }
      .iterator.map(_._1)
      .take(math.max(vocabSize - chars.size, 0))
    chars ++ rest
  }

  /** Distributed marked-piece statistics + driver-side selection. The
    * collect is the top-[[MaxTrainVocab]] (piece, freq) rows — bounded,
    * vocabulary-grain, never corpus-grain (the [[Bpe.trainFromCorpus]]
    * contract). */
  def trainFromCorpus(s: SparkSession, d: String,
                      vocabSize: Int = DefaultVocabSize): Set[String] = {
    val pieces = markedPieceFreqs(s, d)
      .orderBy(col("freq").desc, col("piece"))
      .limit(MaxTrainVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    selectVocab(pieces, vocabSize)
  }

  // ------------------------------------------------------------ encoding

  /** Greedy longest-match-first encode of one word — the deployed
    * WordPiece inference rule: at each position take the LONGEST
    * vocabulary piece (continuation positions try the '##' form),
    * ties impossible by construction; if no piece matches, the whole
    * word becomes [[Unk]] (BERT's behavior — the word, not the
    * character, is the unknown unit). */
  def encode(word: String, vocab: Set[String]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    val out = mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = math.min(word.length, start + SeedMaxLen)
      var found: String = null
      while (end > start && found == null) {
        val cand = (if (start == 0) "" else "##") + word.substring(start, end)
        if (vocab(cand)) found = cand else end -= 1
      }
      if (found == null) return Vector(Unk)
      out += found
      start = end
    }
    out.toVector
  }

  /** Distributed encode with a broadcast vocabulary — the
    * [[Bpe.encodeDocs]]/[[Unigram.encodeDocs]] twin: per-doc word
    * count, WordPiece token count, unknown-word count, and tokens per
    * word; zero shuffles, cost O(corpus bytes). */
  def encodeDocs(s: SparkSession, d: String, vocab: Set[String]): DataFrame = {
    val bc = s.sparkContext.broadcast(vocab)
    val wordRe = "[a-z]+".r
    val encodeUdf = udf { (text: String) =>
      val v = bc.value
      var nWords = 0L
      var nTokens = 0L
      var nUnk = 0L
      for (m <- wordRe.findAllIn(text.toLowerCase)) {
        nWords += 1
        val toks = encode(m, v)
        nTokens += toks.length
        if (toks.length == 1 && toks.head == Unk) nUnk += 1
      }
      Array(nWords, nTokens, nUnk)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), encodeUdf(col("text")).as("c"))
      .select(col("doc_id"),
        col("c").getItem(0).as("n_words"),
        col("c").getItem(1).as("n_tokens"),
        col("c").getItem(2).as("n_unk"),
        round(col("c").getItem(1).cast("double") /
          greatest(col("c").getItem(0), lit(1L)), 4).as("tokens_per_word"))
  }
}
