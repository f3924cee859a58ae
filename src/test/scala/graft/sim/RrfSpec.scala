package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q213/q214 RRF fusion: driver-side fuse of the three searchers'
  * actual outputs must equal the distributed fuse, and the ensemble
  * must recover recall its weakest member loses. */
class RrfSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("rrfFusion equals the driver-side fuse of the three lists (sf0.01)") {
    val spark = SparkSpec.spark
    def ranks(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id")) -> r.getAs[Int]("rank")
    }
    val lists = Seq(
      ranks(SimilarityQueries.ivfTopK(spark, dir)),
      ranks(ScalarQuantization.sqTopK(spark, dir)),
      ranks(BinaryQuantization.bqTopK(spark, dir)))
    val fusedScores = lists.flatten
      .groupBy(_._1).map { case (k, entries) =>
        k -> ((entries.map { case (_, r) => 1000000L / (RankFusion.RrfK + r) }.sum,
          entries.length.toLong))
      }
    val truth = fusedScores.groupBy(_._1._1).flatMap { case (qid, cands) =>
      cands.toSeq
        .sortBy { case ((_, nid), (s, _)) => (-s, nid) }
        .take(RankFusion.FuseK).zipWithIndex
        .map { case (((_, nid), (s, nl)), i) =>
          (qid, nid) -> ((i + 1, s, nl))
        }
    }
    val got = RankFusion.rrfFusion(spark, dir).collect().map { r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id")) ->
        ((r.getAs[Int]("rank"), r.getAs[Long]("rrf_ppm"),
          r.getAs[Long]("n_lists")))
    }.toMap
    assert(got === truth)
    // structural invariants: votes in [1,3], scores within the 3-vote cap
    assert(got.values.forall { case (rk, s, nl) =>
      rk >= 1 && rk <= RankFusion.FuseK && nl >= 1 && nl <= 3 &&
        s <= 3 * (1000000L / (RankFusion.RrfK + 1))
    })
  }

  test("q214: the ensemble recovers recall the weakest member loses (sf0.01)") {
    val spark = SparkSpec.spark
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.collect()
      rows.map(_.getAs[Long]("n_hits")).sum.toDouble /
        (rows.length * RankFusion.FuseK)
    }
    val fused = recall(RankFusion.rrfRecall(spark, dir))
    val bq = recall(BinaryQuantization.bqRecall(spark, dir))
    assert(fused > bq, s"fused $fused must beat BQ alone $bq")
    assert(fused >= 0.8, s"fused recall@5 = $fused")
  }
}
