package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q232 attribution and q233 survival: driver-side journey/lifetime
  * recounts and the model-conservation identities. */
class AttributionSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("multiTouchAttribution equals a driver-side journey recount (sf0.01)") {
    val spark = SparkSpec.spark
    val ev = Tables.events(spark, dir)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime,
        r.getLong(3)))
    val touches = ev.filter(t => Set("view", "click", "signup")(t._2))
    val purchases = ev.filter(_._2 == "purchase")
    val lookbackMs = RelationalQueries.AttribLookbackHours * 3600 * 1000L

    val journeys = purchases.flatMap { case (u, _, pts, pid) =>
      val js = touches.filter(t => t._1 == u && t._3 < pts &&
        t._3 >= pts - lookbackMs)
      if (js.isEmpty) None
      else Some(pid -> js.sortBy(t => (t._3, t._4)).map(t => t._2))
    }
    val truth = scala.collection.mutable.Map[String, (Long, Long, Long, Long)]()
      .withDefaultValue((0L, 0L, 0L, 0L))
    val journeysPerChannel = scala.collection.mutable.Map[String,
      scala.collection.mutable.Set[Long]]()
    journeys.foreach { case (pid, chs) =>
      val n = chs.length.toLong
      chs.zipWithIndex.foreach { case (c, i) =>
        val (t, f, l, lin) = truth(c)
        truth(c) = (t + 1,
          f + (if (i == 0) 1000000L else 0L),
          l + (if (i == chs.length - 1) 1000000L else 0L),
          lin + 1000000L / n)
        journeysPerChannel.getOrElseUpdate(c,
          scala.collection.mutable.Set[Long]()) += pid
      }
    }

    val got = RelationalQueries.multiTouchAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_touches"),
        r.getAs[Long]("n_journeys"), r.getAs[Long]("first_ppm"),
        r.getAs[Long]("last_ppm"), r.getAs[Long]("linear_ppm")))).toMap

    assert(got.keySet === truth.keySet.toSet)
    got.foreach { case (c, (nt, nj, f, l, lin)) =>
      val (tt, tf, tl, tlin) = truth(c)
      assert((nt, f, l, lin) === ((tt, tf, tl, tlin)), s"channel $c")
      assert(nj === journeysPerChannel(c).size.toLong)
    }
    // conservation: each model hands out exactly 1e6 per journey
    // (linear loses < n ppm per journey to integer div)
    val nJourneys = journeys.size.toLong
    assert(got.values.map(_._3).sum === nJourneys * 1000000L)
    assert(got.values.map(_._4).sum === nJourneys * 1000000L)
    val linSum = got.values.map(_._5).sum
    assert(linSum <= nJourneys * 1000000L &&
      linSum > nJourneys * 999000L)
  }

  test("survivalTable equals a driver-side lifetime recount with censoring (sf0.01)") {
    val spark = SparkSpec.spark
    val byUser = Tables.events(spark, dir)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val horizon = byUser.values.flatten.max
    val lifes = byUser.values.map { days =>
      val (f, l) = (days.min, days.max)
      (l.toEpochDay - f.toEpochDay,
        horizon.toEpochDay - l.toEpochDay < RelationalQueries.SurvCensorDays)
    }.toSeq
    val grid = lifes.groupBy(_._1).map { case (t, rs) =>
      t -> ((rs.count(!_._2).toLong, rs.count(_._2).toLong)) }
    val ts = grid.keys.toSeq.sorted
    val truth = ts.map { t =>
      val nRisk = grid.filterKeys(_ >= t).values.map(v => v._1 + v._2).sum
      val (d, c) = grid(t)
      t -> ((nRisk, d, c, d * 1000000L / nRisk))
    }.toMap

    val got = RelationalQueries.survivalTable(spark, dir).collect()
      .map(r => r.getAs[Long]("t") -> ((r.getAs[Long]("n_risk"),
        r.getAs[Long]("d_churn"), r.getAs[Long]("d_censor"),
        r.getAs[Long]("hazard_ppm")))).toMap

    assert(got.keySet === truth.keySet)
    assert(got === truth)
    // n_risk is a suffix sum: decreasing in t, max at the youngest age
    val ordered = got.toSeq.sortBy(_._1).map(_._2._1)
    assert(ordered === ordered.sorted.reverse)
    assert(ordered.head === byUser.size.toLong)
    // censoring is live on this corpus (users active near the horizon)
    assert(got.values.map(_._3).sum > 0)
  }
}
