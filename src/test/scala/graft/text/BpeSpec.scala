package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The BPE trainer/encoder contract: merges follow the max-count /
  * lexicographic-tiebreak rule on the textbook corpus, encode replays
  * training's segmentation, and the distributed encode pass agrees
  * with the driver-side reference word by word. */
class BpeSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  // Sennrich's worked example: freq-weighted pair counts start at
  // es=9, st=9 (tie → ("e","s") wins lexicographically), and merging
  // "es" makes ("es","t") the unique next max at 9.
  private val toyCorpus = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("train learns the textbook merges in order, deterministic ties") {
    val merges = Bpe.train(toyCorpus, 4)
    assert(merges.take(2) === Seq(("e", "s"), ("es", "t")))
    // after (es,t): lo=7, ow=7 tie → ("l","o") wins lexicographically
    assert(merges(2) === ("l", "o"))
    assert(Bpe.train(toyCorpus, 4) === merges)
  }

  test("train stops early when nothing repeats") {
    // every pair occurs exactly once with freq 1 — merges still apply
    // (count 1 is a valid max), but a fully merged vocab terminates
    val m = Bpe.train(Seq("ab" -> 1L), 10)
    assert(m === Seq(("a", "b")))
  }

  test("encode replays training segmentation, lowest rank first") {
    val ranks = Map(("e", "s") -> 0, ("es", "t") -> 1, ("l", "o") -> 2)
    assert(Bpe.encode("newest", ranks) === Vector("n", "e", "w", "est"))
    assert(Bpe.encode("lowest", ranks) === Vector("lo", "w", "est"))
    assert(Bpe.encode("x", ranks) === Vector("x"))
    assert(Bpe.encode("stes", ranks) === Vector("s", "t", "es"))
  }

  test("mergePair resolves overlaps leftmost-first") {
    assert(Bpe.mergePair(Vector("a", "a", "a"), "a", "a") === Vector("aa", "a"))
  }

  test("distributed encode agrees with the driver-side reference") {
    val spark = SparkSpec.spark
    val merges = Bpe.trainFromCorpus(spark, sfDir, 50)
    assert(merges.length === 50)
    val ranks = merges.zipWithIndex.toMap
    val got = Bpe.encodeDocs(spark, sfDir, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
    val wordRe = "[a-z]+".r
    docs.foreach { r =>
      val words = wordRe.findAllIn(r.getString(1).toLowerCase).toSeq
      val expect = (words.size.toLong,
        words.map(w => Bpe.encode(w, ranks).length.toLong).sum)
      assert(got(r.getLong(0)) === expect, s"doc ${r.getLong(0)}")
    }
    // the tokenizer actually compresses: fewer symbols than characters
    val totalTokens = got.values.map(_._2).sum
    val totalChars = docs.map(r =>
      wordRe.findAllIn(r.getString(1).toLowerCase).map(_.length).sum).sum
    assert(totalTokens < totalChars)
  }

  test("training is insensitive to word-frequency row order") {
    val shuffled = Seq("widest" -> 3L, "low" -> 5L, "newest" -> 6L, "lower" -> 2L)
    assert(Bpe.train(shuffled, 4) === Bpe.train(toyCorpus, 4))
  }
}
