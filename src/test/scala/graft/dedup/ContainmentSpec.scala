package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q188 exact containment join: COMPLETE-RECALL equality against the
  * brute-force all-pairs scan (the prefix filter must lose nothing),
  * plus asymmetry structure. */
class ContainmentSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def grams(text: String): Set[String] = {
    val w = text.split("\\s+").filter(_.nonEmpty)
    if (w.length < DedupQueries.ContainGramN) Set(w.mkString(" "))
    else w.sliding(DedupQueries.ContainGramN).map(_.mkString(" ")).toSet
  }

  test("containmentPairs equals the brute-force all-pairs scan (sf0.01)") {
    val spark = SparkSpec.spark
    val docs = graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> grams(r.getString(1)))
    // brute force: every ordered pair, exact integer containment
    val truth = (for {
      (ida, ga) <- docs.iterator
      (idb, gb) <- docs.iterator
      if ida != idb
      inter = ga.intersect(gb).size.toLong
      cx = (inter * 10000L + ga.size / 2) / ga.size
      if cx >= DedupQueries.ContainTauX4
    } yield (ida, idb) -> cx.toDouble / 10000.0).toMap

    val got = DedupQueries.containmentPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("containment")).toMap
    assert(got === truth) // complete recall AND no false positives
    assert(truth.nonEmpty, "corpus should contain near-dup injections")
  }

  test("containment is asymmetric: short-in-long pairs surface one-way") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // constructed: doc 2 is a verbatim excerpt of doc 1
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val df = Seq(
      (1L, base + " phi chi psi omega one two three four five six seven",
        "en", "srcX", 1L),
      (2L, base, "en", "srcX", 2L),
      (3L, "unrelated words entirely different content nothing shared here at all",
        "en", "srcX", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DedupQueries.containmentPairsFrom(df.select("doc_id", "text"))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("containment")).toMap
    // excerpt fully contained: C(2→1) = 1.0 surfaces; the container
    // direction C(1→2) ≈ 18/29 < τ must NOT; doc 3 pairs with nobody
    assert(got.contains((2L, 1L)) && got((2L, 1L)) === 1.0)
    assert(!got.contains((1L, 2L)))
    assert(!got.keys.exists(p => p._1 == 3L || p._2 == 3L))
    // sanity: the Jaccard of the (2,1) pair is far below the q67
    // threshold — this geometry is invisible to symmetric dedup
    val g1 = grams(df.filter(col("doc_id") === 1L).head.getString(1))
    val g2 = grams(df.filter(col("doc_id") === 2L).head.getString(1))
    val j = g1.intersect(g2).size.toDouble / g1.union(g2).size
    assert(j < 0.8)
  }
}
