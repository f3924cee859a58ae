package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.Tables

/** q277 weighted MinHash: signature estimate must equal a driver-side
  * replica of the replication construction, the exact column must
  * equal capped multiset Jaccard, and the estimator must actually
  * track the exact value (bounded mean error at K=32). */
class WeightedMinhashSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("matches a driver-side replica end to end (sf0.001)") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").trim.split("\\s+").toSeq)
      .toMap
    val tf = docs.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (t, xs) =>
        t -> math.min(xs.size, Linkage.WmhCap)
      }
    }
    def sig(id: Long): Seq[Long] = {
      val hs = tf(id).toSeq.flatMap { case (t, c) =>
        (1 to c).map(i => (Hashing.md5Lower64(s"wmh:$t#$i") >>> 11) % Linkage.WmhP)
      }
      (0 until Linkage.WmhK).map { k =>
        hs.map(h => (Linkage.wmhA(k) * h + Linkage.wmhB(k)) % Linkage.WmhP).min
      }
    }
    def exact(a: Long, b: Long): Long = {
      val (ta, tb) = (tf(a), tf(b))
      val keys = ta.keySet ++ tb.keySet
      val smin = keys.toSeq.map(t => math.min(ta.getOrElse(t, 0), tb.getOrElse(t, 0)).toLong).sum
      val smax = keys.toSeq.map(t => math.max(ta.getOrElse(t, 0), tb.getOrElse(t, 0)).toLong).sum
      smin * 10000L / math.max(smax, 1L)
    }
    val got = Linkage.weightedMinhash(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val wantEst = sig(a).zip(sig(b)).count { case (x, y) => x == y }.toLong *
        10000L / Linkage.WmhK
      assert(r.getLong(2) === wantEst, s"est mismatch for ($a,$b)")
      assert(r.getLong(3) === exact(a, b), s"exact mismatch for ($a,$b)")
    }
  }

  test("estimator tracks the exact value: identical docs hit 10000, mean error bounded") {
    val spark = SparkSpec.spark
    val rows = Linkage.weightedMinhash(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    rows.filter(_._2 == 10000L).foreach { case (est, _) =>
      assert(est === 10000L, "identical multisets must have identical signatures")
    }
    val meanAbs = rows.map { case (e, x) => math.abs(e - x) }.sum.toDouble / rows.length
    assert(meanAbs < 1500.0, s"mean |est-exact| too high: $meanAbs")
  }
}
