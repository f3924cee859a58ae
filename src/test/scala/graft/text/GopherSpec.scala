package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q124 Gopher rule suite: every rule exercised at its boundary. */
class GopherSpec extends AnyFunSuite {

  private def rules(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long, Long, Long)] = {
    val spark = SparkSpec.spark
    import spark.implicits._
    TextQueries.gopherRulesFrom(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
  }

  test("each rule flips at its documented boundary") {
    def words(n: Int, w: String) = Seq.fill(n)(w)
    val passing = (words(48, "aaaa") ++ Seq("the", "a")).mkString(" ")
    val docs = Seq(
      // 49 words: r_nwords fails, everything else computes
      1L -> (words(47, "aaaa") ++ Seq("the", "a")).mkString(" "),
      // 50 words incl 2 distinct stopwords, mean len in range: keep
      2L -> passing,
      // only ONE distinct stopword (repeated): r_stop fails
      3L -> (words(49, "aaaa") :+ "the").mkString(" "),
      // 50 words of length 2: sum_len 100 < 3*50: r_wordlen fails low
      4L -> words(50, "ab").mkString(" "),
      // 48 words of length 11 + 2 stopwords: sum_len 532 > 10*50: r_wordlen fails high
      5L -> (words(48, "aaaaaaaaaaa") ++ Seq("the", "a")).mkString(" "),
      // 11 of 50 words numeric: 39*5 < 200: r_alpha fails
      6L -> (words(37, "aaaa") ++ words(11, "123") ++ Seq("the", "a")).mkString(" "),
      // 10 of 50 numeric: 40*5 == 200: r_alpha passes AT the boundary
      7L -> (words(38, "aaaa") ++ words(10, "123") ++ Seq("the", "a")).mkString(" "),
      // empty text: row survives with n_words 0, keep 0
      8L -> "")
    val got = rules(docs)
    //            (n_words, r_nwords, r_wordlen, r_stop, r_alpha, keep)
    assert(got(1L) === ((49L, 0L, 1L, 1L, 1L, 0L)))
    assert(got(2L) === ((50L, 1L, 1L, 1L, 1L, 1L)))
    assert(got(3L) === ((50L, 1L, 1L, 0L, 1L, 0L)))
    assert(got(4L) === ((50L, 1L, 0L, 0L, 1L, 0L)))
    assert(got(5L) === ((50L, 1L, 0L, 1L, 1L, 0L)))
    assert(got(6L) === ((50L, 1L, 1L, 1L, 0L, 0L)))
    assert(got(7L) === ((50L, 1L, 1L, 1L, 1L, 1L)))
    // empty doc: r_wordlen and r_alpha are vacuously true (0 >= 0 —
    // same in both engines); r_nwords rejects it
    assert(got(8L) === ((0L, 0L, 1L, 0L, 1L, 0L)))
  }

  test("discriminates on the real corpus: some kept, some rejected, keep is the conjunction") {
    val spark = SparkSpec.spark
    val rows = TextQueries.gopherRules(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val conj = Seq("r_nwords", "r_wordlen", "r_stop", "r_alpha")
        .map(r.getAs[Long](_)).forall(_ == 1L)
      assert(r.getAs[Long]("keep") == (if (conj) 1L else 0L))
    }
    val kept = rows.count(_.getAs[Long]("keep") == 1L)
    assert(kept > 0 && kept < rows.length, s"rules must discriminate, kept=$kept/${rows.length}")
  }
}
