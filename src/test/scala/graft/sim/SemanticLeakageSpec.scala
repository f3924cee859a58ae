package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q189 semantic split-leakage: driver-side replay of the cell-pair
  * audit and consistency with the q88 machinery it reuses. */
class SemanticLeakageSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splitOf(vecId: Long): String = {
    val hex = "0123456789abcdef"
    val h = md5hex(vecId.toString)
    val b = hex.indexOf(h.charAt(0)) * 16 + hex.indexOf(h.charAt(1))
    if (b < graft.text.CorpusOps.TrainBuckets) "train"
    else if (b < graft.text.CorpusOps.TrainBuckets + graft.text.CorpusOps.ValBuckets) "val"
    else "test"
  }

  test("semanticSplitLeakage equals the driver-side cell-pair replay (sf0.01)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val vecs = graft.ops.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // replay: centroids by the q88 stride rule, nearest-centroid cells
    val cents = vecs.filter { case (id, _) =>
      id % SimilarityQueries.CentStride == SimilarityQueries.CentOffset }
    val cell = vecs.map { case (id, e) =>
      id -> cents.minBy { case (cid, ce) => (-r6(cos(e, ce)), cid) }._1
    }.toMap
    val pairs = for {
      (ida, ea) <- vecs
      (idb, eb) <- vecs
      if idb < ida && cell(ida) == cell(idb)
      c = cos(ea, eb)
      if r6(c) >= SimilarityQueries.SemLeakThr
    } yield (splitOf(ida), splitOf(idb), c)
    val expect = pairs
      .groupBy { case (sa, sb, _) =>
        (Seq(sa, sb).min, Seq(sa, sb).max) }
      .map { case (k, ps) => k ->
        ((ps.length.toLong,
          BigDecimal(ps.map(_._3).max).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)) }

    val got = SimilarityQueries.semanticSplitLeakage(spark, dir).collect()
      .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b")) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("max_cos")))).toMap
    assert(got === expect)
    // the audit must be non-degenerate: pairs exist, and the grid is
    // grouped on ordered split names only
    assert(got.nonEmpty)
    assert(got.keys.forall { case (a, b) => a <= b })
  }
}
