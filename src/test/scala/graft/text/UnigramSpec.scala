package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Unigram-LM trainer (q272 + the EM/Viterbi core): the EM loop is not
  * SQL-expressible, so — like BpeSpec for the merge loop — this spec
  * carries its correctness burden against independent reference
  * implementations: an enumerate-ALL-segmentations E-step, a brute-force
  * best-segmentation search, and EM's monotone-likelihood property.
  */
class UnigramSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  /** All segmentations of `w` into pieces of length <= SeedMaxLen. */
  private def segmentations(w: String): Seq[Vector[String]] =
    if (w.isEmpty) Seq(Vector.empty)
    else (1 to math.min(Unigram.SeedMaxLen, w.length)).flatMap { l =>
      segmentations(w.drop(l)).map(w.take(l) +: _)
    }

  test("emStep expected counts match enumerate-all-segmentations on a fixture") {
    val words = Seq(("abab", 3L), ("aba", 2L), ("bb", 1L), ("a", 5L))
    // seed probs: uniform over the fixture's substrings
    val pieces = words.flatMap { case (w, _) =>
      for (i <- 0 until w.length;
           l <- 1 to math.min(Unigram.SeedMaxLen, w.length - i))
        yield w.substring(i, i + l)
    }.distinct.sorted
    val logP = pieces.map(p => p -> math.log(1.0 / pieces.length)).toMap
    // reference: enumerate every segmentation, weight by its probability
    val refCounts = collection.mutable.HashMap.empty[String, Double]
    var refLl = 0.0
    for ((w, f) <- words) {
      val segs = segmentations(w)
      val probs = segs.map(_.map(p => math.exp(logP(p))).product)
      val z = probs.sum
      refLl += f * math.log(z)
      for ((seg, pr) <- segs.zip(probs); piece <- seg)
        refCounts.updateWith(piece)(c => Some(c.getOrElse(0.0) + f * pr / z))
    }
    val refTotal = refCounts.values.sum
    val (next, ll) = Unigram.emStep(words, logP)
    assert(math.abs(ll - refLl) < 1e-9, "corpus log-likelihood")
    pieces.foreach { p =>
      val want = math.log(math.max(refCounts.getOrElse(p, 0.0), 1e-12) / refTotal)
      assert(math.abs(next(p) - want) < 1e-9, s"piece '$p'")
    }
  }

  test("EM likelihood is monotone non-decreasing over sweeps") {
    val words = Seq(("abcab", 4L), ("cabc", 3L), ("abc", 7L), ("bca", 2L),
      ("aa", 1L), ("ccc", 2L))
    val pieces = words.flatMap { case (w, _) =>
      for (i <- 0 until w.length;
           l <- 1 to math.min(Unigram.SeedMaxLen, w.length - i))
        yield w.substring(i, i + l)
    }.distinct.sorted
    var logP = pieces.map(p => p -> math.log(1.0 / pieces.length)).toMap
    var lastLl = Double.NegativeInfinity
    for (sweep <- 1 to 6) {
      val (next, ll) = Unigram.emStep(words, logP)
      assert(ll >= lastLl - 1e-9, s"sweep $sweep: $ll < $lastLl")
      lastLl = ll; logP = next
    }
  }

  test("train: target size respected, chars never pruned, deterministic") {
    val words = Seq(("thecat", 10L), ("thedog", 8L), ("catdog", 5L),
      ("the", 20L), ("cat", 9L), ("dog", 7L), ("he", 3L))
    val v1 = Unigram.train(words, vocabSize = 15)
    val v2 = Unigram.train(words, vocabSize = 15)
    assert(v1 === v2, "two runs learn the identical vocabulary")
    val chars = words.flatMap(_._1.toSeq).distinct.map(_.toString).toSet
    assert(chars.subsetOf(v1.keySet), "single chars survive every prune")
    assert(v1.count(_._1.length > 1) <= 15 - chars.size,
      "multi-char piece count within the target")
    val total = v1.values.map(math.exp).sum
    assert(math.abs(total - 1.0) < 1e-9, "final probs normalized")
    // frequent substrings must out-rank rare ones in the learned LM
    assert(v1.contains("the"), "'the' (freq 38 as a substring) is kept")
  }

  test("encodeViterbi: reconstructs the word, pieces in vocab, score is the true max") {
    val words = Seq(("internal", 5L), ("internet", 7L), ("tern", 3L),
      ("inter", 4L), ("net", 6L), ("nalter", 1L))
    val v = Unigram.train(words, vocabSize = 25)
    for ((w, _) <- words) {
      val seg = Unigram.encodeViterbi(w, v)
      assert(seg.mkString === w, s"'$w' reconstructs")
      assert(seg.forall(v.contains), s"'$w' pieces all in vocab")
      val got = seg.map(v).sum
      val best = segmentations(w)
        .filter(_.forall(v.contains)).map(_.map(v).sum).max
      assert(math.abs(got - best) < 1e-9, s"'$w' Viterbi = brute-force max")
    }
  }

  test("q272 seed stats: Spark top-N matches a driver-side recomputation (sf0.01)") {
    val spark = SparkSpec.spark
    val texts = graft.ops.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    val wordRe = "[a-z]+".r
    val wf = collection.mutable.HashMap.empty[String, Long]
    texts.foreach(t => wordRe.findAllIn(t.toLowerCase)
      .foreach(w => wf.updateWith(w)(c => Some(c.getOrElse(0L) + 1L))))
    val cnt = collection.mutable.HashMap.empty[String, Long]
    for ((w, f) <- wf; i <- 0 until w.length;
         l <- 1 to math.min(Unigram.SeedMaxLen, w.length - i))
      cnt.updateWith(w.substring(i, i + l))(c => Some(c.getOrElse(0L) + f))
    val want = cnt.toSeq.sortBy { case (p, f) => (-f, p) }
      .take(Unigram.SeedTopN)
    val got = Unigram.seedStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("trainFromCorpus + encodeDocs: full-corpus accounting is consistent (sf0.01)") {
    val spark = SparkSpec.spark
    val v = Unigram.trainFromCorpus(spark, dir, vocabSize = 400)
    assert(v.count(_._1.length > 1) <= 400)
    val rows = Unigram.encodeDocs(spark, dir, v).collect()
    assert(rows.length === 500)
    val wordRe = "[a-z]+".r
    val texts = graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { r =>
      val words = wordRe.findAllIn(texts(r.getLong(0)).toLowerCase).toSeq
      assert(r.getLong(1) === words.length.toLong, s"doc ${r.getLong(0)} words")
      val pieces = words.map(w => Unigram.encodeViterbi(w, v).length.toLong).sum
      assert(r.getLong(2) === pieces, s"doc ${r.getLong(0)} pieces")
      // a subword LM never uses more pieces than characters
      assert(r.getLong(2) <= words.map(_.length.toLong).sum)
    }
  }
}
