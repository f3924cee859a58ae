package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q134 cluster-safe split: the q129 leak must vanish by construction
  * while the split proportions and exact-dup safety survive. */
class ClusterSplitSpec extends AnyFunSuite {

  test("q134 has ZERO leaky clusters where q85's split has real ones (sf0.01)") {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.01"
    val rows = CorpusOps.clusterSafeSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    assert(rows.length == 500)
    // construction: every cluster maps to exactly ONE split
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.map(_._4).distinct.length == 1,
        s"cluster $cluster straddles splits: ${members.map(_._4).distinct.toSeq}")
    }
    // the baseline q85 split genuinely leaks on this corpus (q129) —
    // the comparison is what makes zero-above meaningful
    val naive = CorpusOps.deterministicSplit(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val clusters = rows.map(r => r._1 -> r._2).toMap
    val naiveLeaky = clusters.groupBy(_._2).count { case (_, members) =>
      members.keys.map(naive).toSeq.distinct.length > 1
    }
    assert(naiveLeaky > 0, "expected the q85 split to leak on near-dup clusters")
    // proportions stay roughly 80/10/10 (hash-sampled representatives)
    val bySplit = rows.groupBy(_._4).view.mapValues(_.length)
    assert(bySplit("train") > rows.length * 6 / 10, s"train too small: $bySplit")
    assert(bySplit.getOrElse("val", 0) + bySplit.getOrElse("test", 0) > rows.length / 20,
      s"holdout too small: $bySplit")
    // singleton clusters (their own representative) keep the q85 split
    rows.filter(r => r._1 == r._2).foreach { case (doc, _, _, split) =>
      assert(naive(doc) == split, s"representative $doc changed split")
    }
  }
}
