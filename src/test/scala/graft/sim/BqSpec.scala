package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q203/q204 binary quantization: packed codes equal the driver-side
  * bit math, the two-phase search equals its brute replay, and the
  * 1-bit + rescore pipeline keeps usable recall on this corpus. */
class BqSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("bqEncode packs exactly the midrange sign bits (sf0.01)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val emb = graft.ops.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dim = BinaryQuantization.Dim
    val mins = (0 until dim).map(i => vecs.values.map(_(i)).min)
    val maxs = (0 until dim).map(i => vecs.values.map(_(i)).max)
    def pack(e: Array[Double], off: Int): Long =
      (0 until BinaryQuantization.Half).foldLeft(0L) { (acc, i) =>
        if (e(i + off) > (mins(i + off) + maxs(i + off)) / 2)
          acc + (1L << i) else acc
      }
    val got = BinaryQuantization
      .bqEncode(emb, ScalarQuantization.sqBounds(emb)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === vecs.keySet)
    vecs.foreach { case (id, e) =>
      assert(got(id) === ((pack(e, 0), pack(e, BinaryQuantization.Half))),
        s"vec $id")
    }
    // both halves are 32-bit clean: no sign games, engine-portable
    assert(got.values.forall { case (lo, hi) =>
      lo >= 0 && lo < (1L << 32) && hi >= 0 && hi < (1L << 32)
    })
  }

  test("bqTopK equals the brute Hamming-shortlist + exact-rescore replay (sf0.01)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val emb = graft.ops.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val codes = BinaryQuantization
      .bqEncode(emb, ScalarQuantization.sqBounds(emb)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val truth = vecs.keys.filter(_ % 100 == 0).flatMap { qid =>
      val (qlo, qhi) = codes(qid)
      val short = vecs.keys.filter(_ != qid).toSeq
        .map { id =>
          val (lo, hi) = codes(id)
          (java.lang.Long.bitCount(lo ^ qlo) +
            java.lang.Long.bitCount(hi ^ qhi), id)
        }
        .sorted.take(BinaryQuantization.BqShortlist).map(_._2)
      short
        .map(id => (BigDecimal(cos(vecs(qid), vecs(id)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, id))
        .sortBy { case (c, id) => (-c, id) }.take(BinaryQuantization.K)
        .zipWithIndex.map { case ((_, id), rk) => (qid, rk + 1) -> id }
    }.toMap
    val got = BinaryQuantization.bqTopK(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(got === truth)
  }

  test("q204: 1 bit/dim + rescore keeps recall@5 above 0.5 (sf0.01)") {
    val spark = SparkSpec.spark
    val rows = BinaryQuantization.bqRecall(spark, dir).collect()
    val hits = rows.map(_.getAs[Long]("n_hits")).sum
    val total = rows.length.toLong * BinaryQuantization.K
    assert(rows.nonEmpty)
    assert(hits * 2 > total, s"recall@5 = $hits/$total")
  }
}
