package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q220 nDCG: driver-side regrade of the two collected search tables
  * must equal the distributed eval; bounds and the perfect-search
  * identity hold. */
class NdcgSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private val K = 5

  test("ndcgEval equals a driver-side regrade of the collected searches (sf0.01)") {
    val spark = SparkSpec.spark
    val disc = SimilarityQueries.NdcgDiscPpm
    val exact = SimilarityQueries.cosineTopK(spark, dir, K)
      .select("qid", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val approx = SimilarityQueries.ivfTopK(spark, dir, K,
        SimilarityQueries.NProbe)
      .select("qid", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

    val dcg = approx.groupBy(_._1).map { case (qid, rs) =>
      qid -> rs.map { case (_, nb, rk) =>
        exact.get((qid, nb)).map(er => (K + 1 - er).toLong).getOrElse(0L) *
          disc(rk - 1)
      }.sum
    }
    val idcg = exact.toSeq.groupBy(_._1._1).map { case (qid, rs) =>
      qid -> rs.map { case ((_, _), er) => (K + 1 - er).toLong * disc(er - 1) }.sum
    }

    val got = SimilarityQueries.ndcgEval(spark, dir).collect().map { r =>
      r.getAs[Long]("qid") -> ((r.getAs[Long]("dcg_num"),
        r.getAs[Long]("idcg_num"), r.getAs[Long]("ndcg_ppm")))
    }.toMap

    assert(got.keySet === dcg.keySet)
    got.foreach { case (qid, (d, i, ppm)) =>
      assert(d === dcg(qid), s"dcg for $qid")
      assert(i === idcg(qid), s"idcg for $qid")
      assert(ppm === d * 1000000L / i)
      // graded eval is bounded: 0 ≤ dcg ≤ idcg ⟺ ndcg ∈ [0, 10⁶]
      assert(d >= 0 && d <= i && ppm <= 1000000L)
    }
    // nDCG must separate queries recall@k cannot: somewhere the searcher
    // found neighbors but imperfectly ordered or partially missed them
    assert(got.values.exists(v => v._3 > 0 && v._3 < 1000000L))
  }

  test("a searcher identical to the exact oracle scores ndcg = 1.0 everywhere") {
    val spark = SparkSpec.spark
    val exact = SimilarityQueries.cosineTopK(spark, dir, K)
      .select("qid", "neighbor_id", "rank")
    val out = SimilarityQueries.ndcgEvalFrom(exact, exact, K).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("ndcg_ppm") === 1000000L))
    assert(out.forall(r => r.getAs[Long]("dcg_num") === r.getAs[Long]("idcg_num")))
  }
}
