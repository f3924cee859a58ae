package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q158/q159/q160 — the sequence-analytics family must equal a
  * driver-side sequential recomputation: the cascaded-window funnel is
  * exactly the one-pass-per-user simulation, the RANGE frame is the
  * two-pointer trailing window, and transitions are the lag pairs. */
class SequenceSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private def eventsByUser = {
    val spark = SparkSpec.spark
    Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2.getTime * 1000 + e._2.getNanos / 1000 % 1000, e._3)).toSeq)
      .toMap
  }

  test("q158 funnel equals a per-user sequential simulation; counts are monotone") {
    val spark = SparkSpec.spark
    val got = RelationalQueries.funnelSteps(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val order = Seq("signup", "view", "click", "purchase")
    val reached = Array.fill(4)(0L)
    eventsByUser.values.foreach { evs =>
      var step = 0
      var lastT = Long.MinValue
      // sequential scan: advance to step k+1 at the first event of that
      // type strictly after the step-k completion time
      evs.foreach { case (_, ts, _, tpe, _) =>
        val t = ts.getTime * 1000 + ts.getNanos / 1000 % 1000
        if (step < 4 && tpe == order(step) && (step == 0 || t > lastT)) {
          // strictly-after vs the PREVIOUS step's time; step 1 unconditioned
          step += 1; lastT = t
          reached(step - 1) += 1
        }
      }
    }
    // NOTE: the simulation above greedily takes the FIRST qualifying
    // event per step, which is exactly min{ts > t_(k-1)} — same rule
    assert((1 to 4).map(i => got(i.toLong)) === reached.toSeq)
    assert(got(1L) >= got(2L) && got(2L) >= got(3L) && got(3L) >= got(4L))
    assert(got(1L) > 0L)
  }

  test("q159 rolling 7-day activity equals the two-pointer recount") {
    val spark = SparkSpec.spark
    val got = RelationalQueries.rollingUserActivity(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val horizon = 7L * 86400L * 1000000L
    eventsByUser.values.foreach { evs =>
      val times = evs.map(e => e._2.getTime * 1000 + e._2.getNanos / 1000 % 1000)
      evs.zipWithIndex.foreach { case ((_, _, id, _, _), i) =>
        val t = times(i)
        val inWin = evs.indices.filter(j => times(j) >= t - horizon && times(j) <= t)
        val (n, v) = got(id)
        assert(n === inWin.size.toLong, s"event $id count")
        val expectV = inWin.map(j => evs(j)._5).sum
        assert(math.abs(v - math.rint(expectV * 100) / 100) < 0.02, s"event $id sum")
      }
    }
  }

  test("q160 transition matrix equals the lag-pair recount; shares sum to ~1 per source") {
    val spark = SparkSpec.spark
    val got = RelationalQueries.eventTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val exp = scala.collection.mutable.Map.empty[(String, String), Long]
    eventsByUser.values.foreach { evs =>
      evs.sliding(2).foreach {
        case Seq(a, b) => exp((a._4, b._4)) = exp.getOrElse((a._4, b._4), 0L) + 1L
        case _ => ()
      }
    }
    assert(got.view.mapValues(_._1).toMap === exp.toMap)
    // fixed-point shares: per from_type they sum into (10000-|types|, 10000]
    got.keys.map(_._1).toSet.foreach { ft: String =>
      val s = got.filter(_._1._1 == ft).values.map(_._2).sum
      assert(s > 10000L - 25L && s <= 10000L, s"$ft shares sum $s")
    }
  }
}
