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
