package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q236 OOV rate and q237 stickiness: driver-side recounts with the
  * exact-windowed-distinct semantics (a user active 5x this week
  * counts once). */
class StickinessSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("oovRate equals a driver-side recount against the q40 vocab (sf0.01)") {
    val spark = SparkSpec.spark
    val vocab = Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).toSeq
      .map { case (t, g) => (t, g.length) }
      .sortBy { case (t, f) => (-f, t) }
      .take(graft.text.TextQueries.OovVocabN)
      .map(_._1).toSet
    val truth = Tables.documents(spark, dir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (lang, docs) =>
        val toks = docs.flatMap(_._2.trim.split("\\s+")).filter(_.nonEmpty)
        lang -> ((toks.length.toLong, toks.count(t => !vocab(t)).toLong))
      }
    val got = graft.text.TextQueries.oovRate(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === truth.keySet)
    got.foreach { case (lang, (nt, no, ppm)) =>
      assert((nt, no) === truth(lang), lang)
      assert(ppm === no * 1000000L / nt)
    }
    // the top-50 vocab covers most of the stream but not all of it
    // somewhere (a per-lang zero is fine: the generator's vocabulary
    // is small enough that some languages are fully covered)
    assert(got.values.forall(v => v._2 < v._1))
    assert(got.values.map(_._2).sum > 0)
  }

  test("activeUserStickiness equals driver-side exact windowed distincts (sf0.01)") {
    val spark = SparkSpec.spark
    val act = Tables.events(spark, dir)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
      .distinct
    val days = act.map(_._2).distinct.sorted
    val truth = days.map { d =>
      def win(n: Long) = act.filter { case (_, ad) =>
        val age = d.toEpochDay - ad.toEpochDay; age >= 0 && age < n
      }.map(_._1).distinct.length.toLong
      val (dau, wau, mau) = (win(1), win(7), win(28))
      d.toString -> ((dau, wau, mau, dau * 1000000L / wau, wau * 1000000L / mau))
    }.toMap

    val got = RelationalQueries.activeUserStickiness(spark, dir).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    assert(got.keySet === truth.keySet)
    assert(got === truth)
    // windowed distincts are monotone per day: dau ≤ wau ≤ mau, and
    // strictly fewer than the naive sum-of-daily-counts would claim
    assert(got.values.forall { case (d, w, m, _, _) => d <= w && w <= m })
    assert(got.values.exists { case (d, w, _, _, _) => w < 7 * d })
  }
}
