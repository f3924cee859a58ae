package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q126 z-order layout: the Morton expression must equal the
  * bit-interleave definition, and the layout must actually prune —
  * fewer files touched than the linear layout for the same rect. */
class LayoutSpec extends AnyFunSuite {

  private def mortonRef(x: Long, y: Long): Long =
    (0 until Layout.ZBits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("engine-portable arithmetic equals the shift-based Morton curve on the full grid") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val side = 1 << Layout.ZBits
    val grid = (for (x <- 0L until side; y <- 0L until side) yield (x, y)).toDF("x", "y")
    val got = grid.withColumn("z", expr(Layout.mortonExpr("x", "y", "div")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (x <- 0L until side; y <- 0L until side)
      assert(got((x, y)) == mortonRef(x, y), s"($x, $y)")
  }

  test("every file's bounding box is at most a 4x4 cell block (sf0.01)") {
    val spark = SparkSpec.spark
    val files = Layout.zorderLayout(spark, "/root/testdata/sf0.01").collect()
    assert(files.nonEmpty)
    files.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 3, s"wide x box: $r")
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 3, s"wide y box: $r")
    }
  }

  test("a rect query prunes to a fraction of the files the linear layout touches (sf0.01)") {
    val spark = SparkSpec.spark
    val d = "/root/testdata/sf0.01"
    val (qxLo, qxHi, qyLo, qyHi) = (8L, 11L, 8L, 11L) // one aligned 4x4 block
    def touched(stats: Array[org.apache.spark.sql.Row]): Int =
      stats.count { r =>
        r.getAs[Long]("max_x") >= qxLo && r.getAs[Long]("min_x") <= qxHi &&
          r.getAs[Long]("max_y") >= qyLo && r.getAs[Long]("min_y") <= qyHi
      }
    val z = Layout.zorderLayout(spark, d).collect()
    // linear (arrival-order) layout with the SAME file count: row_number
    // over event_id, chunked — each file sees ~every user and ~every day
    val nFiles = z.length.toLong
    val ev = Tables.events(spark, d)
      .select(
        expr(s"CAST(user_id div ${Layout.XDiv} AS BIGINT)").as("x"),
        expr("CAST(day(ts) - 1 AS BIGINT)").as("y"),
        col("event_id"))
    val n = ev.count()
    val per = (n + nFiles - 1) / nFiles
    val linear = ev
      .withColumn("file_id",
        expr(s"CAST((row_number() OVER (ORDER BY event_id) - 1) div $per AS BIGINT)"))
      .groupBy("file_id")
      .agg(min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .collect()
    val (zt, lt) = (touched(z), touched(linear))
    assert(zt > 0, "the rect must hit data")
    assert(zt * 4 <= lt,
      s"z-order must prune at least 4x vs linear: z touches $zt of ${z.length}, linear $lt of ${linear.length}")
    // the query rect covers one 4x4 aligned block: ideally ONE z file
    assert(zt <= 4, s"z-order touched $zt files for an aligned 4x4 rect")
  }
}
