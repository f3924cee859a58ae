package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q207 source ablation: the two-extrema arithmetic must equal the
  * brute-force recomputation where each source is ACTUALLY removed and
  * the cluster reps re-crowned. */
class AblationSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("sourceAblation equals brute-force per-source removal (sf0.01)") {
    val spark = SparkSpec.spark
    val docs = graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val contaminated = Scrub.decontaminate(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet

    val stop = Set("the", "a", "of", "and", "is", "to")
    def fp(t: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(t.toLowerCase.replaceAll("[^a-z0-9]", "").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    def pass(id: Long, t: String): Boolean = {
      val nTok = "[a-z0-9]+".r.findAllIn(t).length
      val nStop = t.split(" ", -1).count(stop)
      nTok >= 20 && nStop.toLong * 5 < nTok.toLong * 3 &&
        id % Scrub.BenchStride != Scrub.BenchOffset && !contaminated(id)
    }
    val flagged = docs.map { case (id, src, t) => (fp(t), id, src, pass(id, t)) }

    def keptWithout(dropped: Option[String]): Long =
      flagged.filter(r => !dropped.contains(r._3))
        .groupBy(_._1).values
        .count(cluster => cluster.minBy(_._2)._4).toLong

    val kFull = keptWithout(None)
    val got = Scrub.sourceAblation(spark, dir).collect().map { r =>
      r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_reps"),
          r.getAs[Long]("n_kept_reps"), r.getAs[Long]("kept_without"),
          r.getAs[Long]("delta_kept")))
    }.toMap

    val sources = docs.map(_._2).distinct
    assert(got.keySet === sources.toSet)
    sources.foreach { s =>
      val (nDocs, nReps, nKeptReps, keptW, delta) = got(s)
      assert(nDocs === docs.count(_._2 == s).toLong, s"$s n_docs")
      assert(keptW === keptWithout(Some(s)), s"$s kept_without")
      assert(delta === keptW - kFull, s"$s delta")
      assert(nReps >= nKeptReps, s"$s rep counts")
    }
    // the full-corpus kept total reconciles: K_full = Σ n_kept_reps
    assert(got.values.map(_._3).sum === kFull)
  }
}
