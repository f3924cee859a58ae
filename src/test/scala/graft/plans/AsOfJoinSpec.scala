package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.RelationalQueries

/** The native as-of join must agree row-for-row with the window-composed
  * rewrite (q32) and actually plan through AsOfJoinExec. */
class AsOfJoinSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.get(2)), Option(r.get(3)))).toSet

  test("native as-of equals the window-composed as-of (sf0.001)") {
    val spark = SparkSpec.spark
    val composed = rows(RelationalQueries.asofJoin(spark, sfDir))
    val native   = rows(RelationalQueries.asofJoinNative(spark, sfDir))
    assert(native === composed)
    // non-vacuous: both matched and unmatched (null) rows occur
    assert(native.exists(_._3.isEmpty) && native.exists(_._3.nonEmpty))
  }

  test("q139 forward as-of equals a brute-force driver recount (sf0.001)") {
    val spark = SparkSpec.spark
    val ev = graft.ops.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime / 1000L * 1000000L + r.getTimestamp(2).getNanos / 1000L,
        r.getString(3)))
    val byUser = ev.groupBy(_._2)
    val truth = ev.map { case (id, user, us, _) =>
      val next = byUser(user)
        .filter(e => e._4 == "purchase" && e._3 > us)
        .sortBy(_._3).headOption
      (id, user, next.map(_._1), next.map(_._3 - us))
    }.toSet
    val got = RelationalQueries.asofForward(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got === truth)
    // non-vacuous: matched and tail (no-later-purchase) rows both occur,
    // and every wait is strictly positive
    assert(got.exists(_._3.isEmpty) && got.exists(_._3.nonEmpty))
    assert(got.forall(_._4.forall(_ > 0L)))
  }

  test("native forward as-of equals the window-composed forward (sf0.001)") {
    val spark = SparkSpec.spark
    val composed = rows(RelationalQueries.asofForward(spark, sfDir))
    val native   = rows(RelationalQueries.asofForwardNative(spark, sfDir))
    assert(native === composed)
    assert(native.exists(_._3.isEmpty) && native.exists(_._3.nonEmpty))
    // the forward node must actually plan through AsOfJoinExec
    val df = RelationalQueries.asofForwardNative(spark, sfDir)
    df.collect()
    val rendered = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(rendered.contains("AsOfJoin "), s"AsOfJoinExec not found in:\n$rendered")
  }

  test("q47 plans through AsOfJoinExec (strategy registered via extensions)") {
    val spark = SparkSpec.spark
    val df = RelationalQueries.asofJoinNative(spark, sfDir)
    df.collect() // force AQE to finalize the physical plan
    // AQE wraps finalized stages in leaf QueryStageExec nodes, so walk
    // the rendered tree instead of .children
    val rendered = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // final plan only (AQE prints both)
    assert(rendered.contains("AsOfJoin "), s"AsOfJoinExec not found in:\n$rendered")
    // the scale contract: exactly one exchange per side, none above the join
    assert(rendered.split("Exchange hashpartitioning").length - 1 == 2, rendered)
  }

  test("merge handles keys present on only one side") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (2L, 10L, "l2"), (3L, 5L, "l3"))
      .toDF("lk", "lt", "lv")
    val right = Seq((1L, 4L, "r1a"), (1L, 9L, "r1b"), (1L, 11L, "r1c"),
      (9L, 1L, "r9"))
      .toDF("rk", "rt", "rv")
    val out = AsOfJoin.backward(left, right, "lk", "rk", "lt", "rt")
      .select("lk", "lt", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(out === Set(
      (1L, 10L, Some("r1b")), // latest strictly before 10 is rt=9
      (2L, 10L, None),        // no right rows for key 2
      (3L, 5L, None)))        // key 3 absent on right; key 9 unmatched is dropped (left join)
  }
}
