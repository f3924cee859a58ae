package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** KILL-AND-RESTART parity for the r15 stateful twins: each test feeds
  * half the input, STOPS the query, starts a NEW query from the same
  * checkpoint (state recovered from disk — a process-boundary restart
  * as far as the state store is concerned: nothing survives in the
  * operator, only the checkpoint), feeds the rest, and then reads the
  * recovered+updated state back through Spark's `statestore` reader to
  * hash-match the batch twin. This is the proof behind every "a state
  * snapshot replays the registered table" claim: the snapshot is the
  * CHECKPOINT, not the JVM.
  */
class RestartParitySpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private def ckptDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Run `mk` twice around a stop/restart boundary: feed the first
    * half, stop, rebuild the query from the SAME checkpoint, feed the
    * second half, stop. Returns the checkpoint path for state reads. */
  private def runWithRestart[A](input: MemoryStream[A], out: DataFrame,
                                batches: Seq[Seq[A]]): String = {
    val ckpt = ckptDir("restart")
    val (firstHalf, secondHalf) = batches.splitAt(batches.length / 2)
    val q1 = out.writeStream.format("noop")
      .option("checkpointLocation", ckpt).outputMode("update").start()
    try {
      firstHalf.foreach { b =>
        input.addData(b.toIndexedSeq: _*); q1.processAllAvailable()
      }
    } finally q1.stop()
    val q2 = out.writeStream.format("noop")
      .option("checkpointLocation", ckpt).outputMode("update").start()
    try {
      secondHalf.foreach { b =>
        input.addData(b.toIndexedSeq: _*); q2.processAllAvailable()
      }
      q2.processAllAvailable()
    } finally q2.stop()
    ckpt
  }

  /** Latest state of operator 0 as (key.*, value.*) columns. */
  private def stateRows(ckpt: String): DataFrame = {
    val spark = SparkSpec.spark
    spark.read.format("statestore").load(ckpt)
      .select(col("key.*"), col("value.*"))
  }

  test("(type, day) grid survives a kill-and-restart; recovered state replays q240 and q264") {
    val spark = SparkSpec.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.ops.Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts)").as("tsus"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("tsus", "event_type")
      .select(expr("timestamp_micros(tsus)").as("ts"), col("event_type"))
    val (b1, rest) = ev.splitAt(ev.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val ckpt = runWithRestart(input,
      StreamingFraud.typeDayCountsStream(stream), Seq(b1, b2, b3).map(_.toSeq))
    // recovered state: (event_type, day, <count buffer>) — buffer last
    val st = stateRows(ckpt)
    val cols = st.columns
    val snap = st.select(col(cols(0)).as("event_type"),
        col(cols(1)).as("day"), col(cols.last).cast("long").as("x"))
      .localCheckpoint(true)
    val batchGrid = graft.ops.Quality.typeDayCounts(
        graft.ops.Tables.events(spark, sfDir))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .toSet
    val stateGrid = snap.collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2))).toSet
    assert(stateGrid === batchGrid, "recovered grid = batch grid, cell for cell")
    // and the registered tables replay from the RECOVERED state
    def m(df: DataFrame) = df.collect().map(r => r.toSeq.head -> r.toSeq.tail).toMap
    assert(m(graft.ops.Quality.seasonalBacktestFromCounts(snap)) ===
      m(graft.ops.Quality.seasonalBacktest(spark, sfDir)))
    val outFromState = graft.ops.Quality.seasonalOutliersFromCounts(snap)
      .collect().map(r => (r.getString(0), r.getDate(1).toString)).toSet
    val q264 = graft.ops.Quality.seasonalOutliers(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(outFromState === q264)
  }

  test("HLL-DAU register grid survives a kill-and-restart; recovered registers replay q262") {
    val spark = SparkSpec.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.ops.Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts)").as("tsus"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val input = MemoryStream[(Long, Long)]
    val stream = input.toDF().toDF("tsus", "user_id")
      .select(expr("timestamp_micros(tsus)").as("ts"), col("user_id"))
    val (b1, rest) = ev.splitAt(ev.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val ckpt = runWithRestart(input,
      StreamingFraud.hllDauRegistersStream(stream), Seq(b1, b2, b3).map(_.toSeq))
    val st = stateRows(ckpt)
    val cols = st.columns
    val snap = st.select(col(cols(0)).as("day"), col(cols(1)).as("reg"),
      col(cols.last).cast("long").as("mrank"))
    val fromState = graft.ops.Sketches.hllDauFromRegisters(snap).collect()
      .map(r => r.getDate(0).toString -> r.toSeq.drop(1)).toMap
    val q262 = graft.ops.Sketches.hllDau(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> r.toSeq.drop(1)).toMap
    assert(fromState === q262)
  }

  test("CDC merge state survives a kill-and-restart; recovered rows = last-writer-wins fold") {
    val spark = SparkSpec.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic CDC tape: inserts, out-of-order updates, deletes,
    // a late pre-delete update that must NOT resurrect key 7
    val tape = Seq(
      StreamingFraud.CdcChange(1L, 1L, "I", "en", "web", 10L),
      StreamingFraud.CdcChange(2L, 2L, "I", "de", "web", 20L),
      StreamingFraud.CdcChange(3L, 7L, "I", "fr", "web", 70L),
      StreamingFraud.CdcChange(5L, 1L, "U", "en", "curated", 11L),
      // --- restart boundary lands here (4 | 4) ---
      StreamingFraud.CdcChange(7L, 7L, "D", null, null, 0L),
      StreamingFraud.CdcChange(6L, 7L, "U", "fr", "late", 71L), // stale vs seq 7
      StreamingFraud.CdcChange(4L, 1L, "U", "en", "stale", 12L), // stale vs seq 5
      StreamingFraud.CdcChange(8L, 2L, "U", "de", "curated", 21L))
    val input = MemoryStream[StreamingFraud.CdcChange]
    val ckpt = runWithRestart(input, StreamingFraud.cdcMergeStream(input.toDS()).toDF(),
      tape.grouped(2).map(_.toSeq).toSeq)
    val st = stateRows(ckpt)
    // mapGroupsWithState value may nest the user state under groupState
    val flat =
      if (st.columns.contains("groupState")) st.select(col("groupState.*"))
      else st
    val got = flat.select("doc_id", "lang", "source", "n_chars", "seq", "deleted")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), Option(r.getString(2)),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // driver-side LWW fold over the whole tape
    val ref = tape.groupBy(_.doc_id).map { case (id, cs) =>
      val sorted = cs.sortBy(_.seq)
      val last = sorted.last
      id -> (if (last.op == "D")
        ((None: Option[String]), (None: Option[String]),
          sorted.takeWhile(_.op != "D").lastOption.map(_.n_chars).getOrElse(0L),
          last.seq, true)
      else (Option(last.lang), Option(last.source), last.n_chars, last.seq, false))
    }
    assert(got.keySet === ref.keySet)
    ref.foreach { case (id, (_, _, _, seq, del)) =>
      assert(got(id)._4 === seq, s"key $id seq")
      assert(got(id)._5 === del, s"key $id tombstone")
      if (!del) {
        assert(got(id)._1 === ref(id)._1 && got(id)._2 === ref(id)._2,
          s"key $id payload")
      }
    }
    // the late pre-delete update (seq 6 < delete seq 7) must not resurrect
    assert(got(7L)._5 === true, "tombstone survives the restart and the late update")
  }
}
