package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q191 Hamilton eval sampler and q192 rendezvous shard stability:
  * exact apportionment properties and the HRW movement guarantee. */
class ApportionSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("q191: quotas sum to the budget, are within 1 of proportional, selection is md5-ranked (sf0.01)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val sel = CorpusOps.hamiltonEvalSample(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[Int]("rnk")))
    assert(sel.length.toLong === CorpusOps.EvalBudget)
    val nl = graft.ops.Tables.documents(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = nl.values.sum
    val byLang = sel.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // Hamilton's defining property: every stratum within 1 of its
    // exact proportional share (no stratum can be cheated by ≥1 seat)
    nl.foreach { case (l, n) =>
      val exact = CorpusOps.EvalBudget.toDouble * n / total
      val k = byLang.getOrElse(l, 0L).toDouble
      assert(math.abs(k - exact) < 1.0, s"lang $l: $k vs $exact")
    }
    // within a stratum, the selected docs are exactly the quota
    // smallest md5 keys, ranked 1..k
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docsByLang = graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
    byLang.foreach { case (l, k) =>
      val want = docsByLang(l).map(_._1).sortBy(id => md5hex(id.toString))
        .take(k.toInt).zipWithIndex
        .map { case (id, i) => (id, l, i + 1) }.toSet
      assert(sel.filter(_._2 == l).toSet === want, s"lang $l")
    }
  }

  test("q192: docs move ONLY into the new shard, churn ≈ 1/(S+1) (sf0.01)") {
    val spark = SparkSpec.spark
    val m = CorpusOps.rendezvousStability(spark, dir).collect()
      .map(r => (r.getAs[Int]("shard_old"), r.getAs[Int]("shard_new")) ->
        r.getAs[Long]("n_docs")).toMap
    // HRW guarantee: shard_new == shard_old, or shard_new == S (added)
    m.keys.foreach { case (o, n) =>
      assert(n == o || n == CorpusOps.HrwShards, s"illegal move $o -> $n")
    }
    val total = m.values.sum
    val moved = m.collect { case ((o, n), c) if n != o => c }.sum
    // expected churn 1/(S+1) ≈ 11.1%; allow a wide statistical band
    assert(moved > 0 && moved.toDouble / total < 0.25,
      s"churn $moved/$total out of band")
    // every old shard is populated (statistical balance at 500 docs)
    assert((0 until CorpusOps.HrwShards).forall(s => m.keys.exists(_._1 == s)))
  }
}
