package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Greedy longest-match-first WordPiece encode + vocabulary selection
  * + the q286 marked-seed statistics, pinned against driver-side
  * references (the BpeSpec/UnigramSpec discipline). */
class WordPieceSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("encode: the canonical BERT example and longest-match-first order") {
    val vocab = Set("un", "##aff", "##able", "##ab", "##le", "a", "##a",
      "b", "##b", "f", "##f", "l", "##l", "e", "##e", "u", "##u", "n", "##n")
    assert(WordPiece.encode("unaffable", vocab) ===
      Vector("un", "##aff", "##able"))
    // longest match wins at every position: "##ab" never fires because
    // "##aff" (longer at that position) is in vocab
    assert(WordPiece.encode("unab", vocab) === Vector("un", "##ab"))
    // empty word
    assert(WordPiece.encode("", vocab) === Vector.empty)
  }

  test("encode: reconstruction and the UNK rule") {
    val vocab = Set("ca", "##t", "c", "##a", "t")
    val toks = WordPiece.encode("cat", vocab)
    assert(toks === Vector("ca", "##t"))
    // stripping the markers reconstructs the word exactly
    assert(toks.map(_.stripPrefix("##")).mkString === "cat")
    // a word with an uncovered position is UNK AS A WHOLE (BERT rule)
    assert(WordPiece.encode("cax", vocab) === Vector(WordPiece.Unk))
  }

  test("selectVocab keeps all single-char pieces and respects the size/tie order") {
    val freqs = Seq("the" -> 100L, "##he" -> 90L, "t" -> 5L, "##t" -> 4L,
      "h" -> 3L, "##h" -> 2L, "e" -> 2L, "##e" -> 1L, "th" -> 90L)
    // 6 single-char pieces are always kept; vocabSize 8 leaves a
    // multi-char budget of 2
    val v = WordPiece.selectVocab(freqs, vocabSize = 8)
    // every single-char form survives regardless of the budget
    assert(Set("t", "##t", "h", "##h", "e", "##e").subsetOf(v))
    // the multi-char budget admits the top by (freq desc, piece asc):
    // "the"(100) first, then the tie "##he" vs "th" at 90 → "##he"
    assert(v.contains("the") && v.contains("##he") && !v.contains("th"))
  }

  test("q286 marked seed stats: Spark top-N matches a driver-side recomputation (sf0.01)") {
    val spark = SparkSpec.spark
    val texts = graft.ops.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    val wordRe = "[a-z]+".r
    val wf = collection.mutable.HashMap.empty[String, Long]
    texts.foreach(t => wordRe.findAllIn(t.toLowerCase)
      .foreach(w => wf.updateWith(w)(c => Some(c.getOrElse(0L) + 1L))))
    val cnt = collection.mutable.HashMap.empty[String, Long]
    for ((w, f) <- wf; i <- 0 until w.length;
         l <- 1 to math.min(WordPiece.SeedMaxLen, w.length - i)) {
      val marked = (if (i == 0) "" else "##") + w.substring(i, i + l)
      cnt.updateWith(marked)(c => Some(c.getOrElse(0L) + f))
    }
    val want = cnt.toSeq.sortBy { case (p, f) => (-f, p) }
      .take(WordPiece.SeedTopN)
    val got = WordPiece.seedStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("trainFromCorpus + encodeDocs: corpus accounting consistent, zero UNK on trained-on text") {
    val spark = SparkSpec.spark
    val v = WordPiece.trainFromCorpus(spark, dir, vocabSize = 400)
    val rows = WordPiece.encodeDocs(spark, dir, v).collect()
    assert(rows.length === 500)
    // every char position of every trained-on word was seeded in both
    // marked forms, so nothing in the training corpus is UNK
    assert(rows.map(_.getLong(3)).sum === 0L)
    val wordRe = "[a-z]+".r
    val texts = graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { r =>
      val words = wordRe.findAllIn(texts(r.getLong(0)).toLowerCase).toSeq
      assert(r.getLong(1) === words.length.toLong, s"doc ${r.getLong(0)} words")
      val pieces = words.map(w => WordPiece.encode(w, v).length.toLong).sum
      assert(r.getLong(2) === pieces, s"doc ${r.getLong(0)} tokens")
      // greedy longest-match never uses more pieces than characters,
      // and every encode reconstructs its word
      words.foreach { w =>
        val toks = WordPiece.encode(w, v)
        assert(toks.map(_.stripPrefix("##")).mkString === w)
        assert(toks.length <= w.length)
      }
    }
  }
}
