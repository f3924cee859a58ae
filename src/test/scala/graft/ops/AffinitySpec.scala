package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q164 item co-occurrence: the capped pair-expansion plan must equal a
  * driver-side brute force that applies the SAME cap contract (top
  * [[Affinity.ItemCap]] items per user by (count desc, item asc)) —
  * including the lift fixed-point arithmetic — and the cap must
  * actually bound the per-user pair fan-out. */
class AffinitySpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSpec.spark

  private def brute(): Map[(Long, Long), (Long, Long)] = {
    val rows = Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(get_json_object(props, '$.k') AS LONG) AS item")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val capped: Map[Long, Seq[Long]] = rows.groupBy(_._1).map { case (u, es) =>
      val byItem = es.groupBy(_._2).view.mapValues(_.length).toSeq
      u -> byItem.sortBy { case (item, n) => (-n, item) }
        .take(Affinity.ItemCap).map(_._1).sorted
    }
    val nu = capped.size.toLong
    val ni = capped.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    capped.values.toSeq
      .flatMap(items => for {
        i <- items.indices; j <- (i + 1) until items.size
      } yield (items(i), items(j)))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= Affinity.MinSupport)
      .map { case ((a, b), nab) =>
        (a, b) -> (nab, nab * nu * 10000L / (ni(a) * ni(b)))
      }.toMap
  }

  test("q164 equals a driver-side capped co-occurrence brute force (sf0.001)") {
    val got = Affinity.itemCooccurrence(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val want = brute()
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(v === want(k), s"pair $k") }
    // every pair is ordered and above support
    got.keys.foreach { case (a, b) => assert(a < b) }
    got.values.foreach { case (nab, _) => assert(nab >= Affinity.MinSupport) }
  }

  test("per-user pair fan-out is structurally capped") {
    import org.apache.spark.sql.functions._
    // replay stage 2 only: no user's capped item list exceeds ItemCap
    val capped = Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(get_json_object(props, '$.k') AS LONG) AS item")
      .where("item IS NOT NULL")
      .groupBy("user_id", "item").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(TopKAggregator.topK(Affinity.ItemCap)(
        col("n").cast("double"), col("item")).as("top"))
      .select(size(col("top")).as("sz"))
      .agg(max("sz")).head().getInt(0)
    assert(capped <= Affinity.ItemCap)
  }
}
