package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.Tables

/** q275/q276: the SN pair set must equal an independent driver-side
  * replay of the multi-pass algorithm, candidate mass must respect the
  * (W−1)·n·passes bound, and the FS pattern table must tie out to the
  * candidate mass with threshold-consistent verdicts. */
class LinkageSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private case class Doc(id: Long, lang: String, source: String,
                         nChars: Long, toks: Set[String], k1: String, k2: String)

  private def load(): Seq[Doc] = {
    val spark = SparkSpec.spark
    Tables.documents(spark, sf).collect().map { r =>
      val raw = r.getAs[String]("text").trim.split("\\s+")
      Doc(r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[Long]("n_chars"),
        raw.toSet, raw.head.take(3), raw.last.take(3))
    }.toSeq
  }

  private def passPairs(ds: Seq[Doc], key: Doc => (String, String)): Set[(Long, Long)] =
    ds.groupBy(key).values.flatMap { block =>
      val sorted = block.sortBy(d => (d.nChars, d.id)).map(_.id)
      sorted.indices.flatMap { i =>
        (1 until Linkage.W).flatMap { j =>
          if (i + j < sorted.length)
            Some((math.min(sorted(i), sorted(i + j)), math.max(sorted(i), sorted(i + j))))
          else None
        }
      }
    }.toSet

  test("q275 equals the driver-side multi-pass SN replay (sf0.001)") {
    val spark = SparkSpec.spark
    val ds = load()
    val byId = ds.map(d => d.id -> d).toMap
    val p1 = passPairs(ds, d => (d.lang, d.k1))
    val p2 = passPairs(ds, d => (d.source, d.k2))
    val want = (p1 ++ p2).flatMap { case (a, b) =>
      val (ta, tb) = (byId(a).toks, byId(b).toks)
      val i = (ta & tb).size.toLong
      val u = math.max(ta.size + tb.size - i, 1L)
      val jx = i * 10000L / u
      if (jx >= Linkage.TauX10k)
        Some((a, b, jx, (if (p1((a, b))) 1 else 0) + (if (p2((a, b))) 1 else 0)))
      else None
    }
    val got = Linkage.sortedNeighborhood(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.map(t => (t._1, t._2, t._3, t._4.toInt)) === want)
    assert(want.nonEmpty, "fixture assumption: the corpus has SN-visible near-dups")
  }

  test("q276 pattern table ties out to the candidate mass with consistent verdicts") {
    val spark = SparkSpec.spark
    val ds = load()
    val nCand = (passPairs(ds, d => (d.lang, d.k1)) ++
      passPairs(ds, d => (d.source, d.k2))).size.toLong
    val rows = Linkage.fellegiSunter(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === nCand)
    assert(nCand <= 2L * (Linkage.W - 1) * ds.size, "SN candidate bound violated")
    rows.foreach { r =>
      val (score, verdict) = (r.getAs[Long]("score"), r.getAs[String]("verdict"))
      val want =
        if (score >= Linkage.ThetaMatch) "match"
        else if (score >= Linkage.ThetaPossible) "possible"
        else "non_match"
      assert(verdict === want)
    }
    // monotonicity: flipping any 0→1 in the pattern never lowers the score
    val byPattern = rows.map(r => r.getAs[String]("pattern") -> r.getAs[Long]("score")).toMap
    for ((p, s) <- byPattern; i <- 0 until 4 if p(i) == '0') {
      val up = p.updated(i, '1')
      byPattern.get(up).foreach(s2 => assert(s2 > s, s"$up not above $p"))
    }
  }
}
