package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The multimodal plumbing must be real even while the decoder is a
  * stub: schema, per-partition batching, null handling, determinism. */
class MultimodalSpec extends AnyFunSuite {

  test("withMediaFeatures appends deterministic fixed-size features; null payload → empty") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = Seq(
      (1L, "abc".getBytes("UTF-8")),
      (2L, "abc".getBytes("UTF-8")),
      (3L, "different".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.withMediaFeatures(df, "payload")
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "payload", "media_features"))
    val rows = out.select("doc_id", "media_features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows(1L).length === Multimodal.FeatureDim)
    assert(rows(1L) == rows(2L))      // same bytes → same features
    assert(rows(1L) != rows(3L))      // different bytes → different features
    assert(rows(4L).isEmpty)          // null payload → empty vector
  }

  test("sampleFrames slices every 4th 64-byte frame and decodes each") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // 300 bytes → 5 frames (64,64,64,64,44) → sampled idx 0 and 4
    val payload = Array.tabulate[Byte](300)(i => (i % 127).toByte)
    val df = Seq((1L, payload), (2L, Array[Byte](1, 2, 3)),
        (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.sampleFrames(df, "payload")
      .select("doc_id", "frame_idx", "frame_features").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    // null payload contributes NO frames (no phantom frame_idx=0 row)
    assert(out.keySet === Set((1L, 0), (1L, 4), (2L, 0)))
    // each sampled frame decodes like the standalone stub on its slice
    val frame0 = payload.slice(0, 64)
    assert(out((1L, 0)) === Multimodal.decodeStub(frame0).toSeq)
    val frame4 = payload.slice(256, 300) // short tail frame
    assert(out((1L, 4)) === Multimodal.decodeStub(frame4).toSeq)
    assert(out((2L, 0)) === Multimodal.decodeStub(Array[Byte](1, 2, 3)).toSeq)
  }

  test("withResizedMedia keeps every 4th byte, nulls stay null") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val payload = Array.tabulate[Byte](10)(_.toByte)
    val df = Seq((1L, payload), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.withResizedMedia(df, "payload")
      .select("doc_id", "media_resized").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out(1L).toSeq === Seq[Byte](0, 4, 8))
    assert(out(2L) == null)
  }

  test("mediaMeta chunk math matches the chunk size contract") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = Seq((1L, Array.fill[Byte](300)(7)), (2L, Array.fill[Byte](256)(7)))
      .toDF("doc_id", "payload")
    val m = Multimodal.mediaMeta(df, "payload")
      .select("doc_id", "byte_len", "n_chunks").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(1L) === ((300L, 2L)))
    assert(m(2L) === ((256L, 1L)))
  }
}
