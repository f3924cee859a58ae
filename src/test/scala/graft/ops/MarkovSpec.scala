package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q234 Markov removal effect: transition counts against a driver
  * recount from raw events, the fixed-point conservation bound, and
  * removal semantics on constructed chains. */
class MarkovSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("transitions equal a driver-side journey walk (sf0.01)") {
    val spark = SparkSpec.spark
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts", "event_type", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
    val byDay = ev.groupBy(t => (t._1, t._2.toLocalDateTime.toLocalDate))
    val counts = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    byDay.foreach { case (_, rows) =>
      val conv = rows.exists(_._3 == "purchase")
      val touches = rows.filter(r => Markov.Channels.contains(r._3))
        .sortBy(r => (r._2.getTime, r._4)).map(_._3)
      if (touches.nonEmpty) {
        counts(("start", touches.head)) = counts(("start", touches.head)) + 1
        touches.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts((p(0), p(1))) + 1
        }
        val last = (touches.last, if (conv) "conv" else "null")
        counts(last) = counts(last) + 1
      }
    }
    val got = Markov.transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === counts.toMap)
  }

  test("fixed-point conservation and removal semantics on the real chain (sf0.01)") {
    val spark = SparkSpec.spark
    val out = Markov.markovRemoval(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet === Markov.Channels.toSet)
    val full = out.values.head._1
    assert(full > 0 && full <= Markov.MarkovScale)
    out.foreach { case (c, (f, wo, ppm)) =>
      assert(f === full, s"full mass must be variant-independent ($c)")
      assert(wo < f, s"removing $c must lose conversion mass")
      assert(ppm === (f - wo) * 1000000L / f)
      assert(ppm > 0 && ppm < 1000000L)
    }
  }

  test("constructed chains: a mandatory hop removed kills ALL conversion") {
    // start → view → click → conv, every journey: click is mandatory
    val trans = Seq(("start", "view", 10L), ("view", "click", 10L),
      ("click", "conv", 10L))
    val full = Markov.convMassFrom(trans, None)
    assert(full === Markov.MarkovScale, "deterministic chain converts fully")
    assert(Markov.convMassFrom(trans, Some("click")) === 0L)
    assert(Markov.convMassFrom(trans, Some("view")) === 0L)
  }

  test("constructed chains: a bypassed channel's removal loses only its share") {
    // start → view → conv (7), start → click → conv (3)
    val trans = Seq(("start", "view", 7L), ("start", "click", 3L),
      ("view", "conv", 7L), ("click", "conv", 3L))
    val full = Markov.convMassFrom(trans, None)
    val woClick = Markov.convMassFrom(trans, Some("click"))
    // removing click leaves the view path intact: 7/10 of the mass
    // (up to the documented fixed-point truncation)
    assert(math.abs(woClick - full * 7 / 10) <= 2,
      s"full=$full woClick=$woClick")
    assert(Markov.convMassFrom(trans, Some("view")) < woClick)
  }

  test("the fixed-point loses at most rounds·states of mass to truncation") {
    val spark = SparkSpec.spark
    val trans = Markov.transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // run the same loop but summing ALL mass (conv + null + transient)
    val full = Markov.convMassFrom(trans, None)
    val nullMass = {
      // swap conv/null labels to read the other absorber with the
      // identical arithmetic
      val swapped = trans.map { case (f, t, c) =>
        (f, t match { case "conv" => "null"; case "null" => "conv"; case x => x }, c) }
      Markov.convMassFrom(swapped, None)
    }
    val total = full + nullMass
    assert(total <= Markov.MarkovScale)
    assert(total >= Markov.MarkovScale - 64L * Markov.MarkovRounds,
      s"excessive truncation loss: $total")
  }
}
