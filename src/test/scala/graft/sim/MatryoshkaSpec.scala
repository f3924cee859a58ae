package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q193 k-anonymity audit and q194 matryoshka recall: driver replays
  * and the structural guarantees each report exists to state. */
class MatryoshkaSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("q194 matryoshka recall equals the driver replay; prefix search ranks sanely") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val vecs = graft.ops.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double], n: Int): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def topk(q: Long, n: Int): Seq[Long] = {
      val qe = vecs.find(_._1 == q).get._2
      vecs.filter(_._1 != q)
        .map { case (id, e) => (id, r6(cos(qe, e, n))) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
    }
    val queries = vecs.map(_._1).filter(_ % 100 == 0)
    val expect = queries.map { q =>
      val exact = topk(q, 64).toSet
      val approx = topk(q, SimilarityQueries.MatryoshkaDims)
      val hits = approx.count(exact)
      val firstRank = approx.zipWithIndex
        .collectFirst { case (id, i) if exact(id) => i + 1 }
      q -> ((hits.toLong, firstRank))
    }.toMap
    val got = SimilarityQueries.matryoshkaRecall(spark, dir).collect()
      .map(r => r.getAs[Long]("qid") ->
        ((r.getAs[Long]("n_hits"),
          Option(r.getAs[java.lang.Integer]("first_hit_rank")).map(_.intValue)))).toMap
    assert(got === expect)
    // even on an isotropic space a 16/64 prefix preserves SOME signal:
    // across the query set the truncated search must beat zero overlap
    assert(got.values.map(_._1).sum > 0L)
  }

  test("q193 k-anonymity: rollup equals the driver recount of sub-k classes") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val docs = graft.ops.Tables.documents(spark, dir)
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val classes = docs.groupBy { case (l, s, n) =>
      (l, s, n / graft.ops.Maintenance.KAnonCharBin) }
      .view.mapValues(_.length.toLong).toMap
    val risky = classes.filter(_._2 < graft.ops.Maintenance.KAnonK)
    val expect = risky.groupBy(_._1._2).map { case (src, cs) =>
      src -> ((cs.size.toLong, cs.values.sum, cs.values.min)) }
    val got = graft.ops.Maintenance.kAnonymityAudit(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_risky_classes"), r.getAs[Long]("n_exposed_docs"),
          r.getAs[Long]("min_class_size")))).toMap
    assert(got === expect)
    assert(got.nonEmpty, "a 500-doc corpus must have sub-k metadata classes")
  }
}
