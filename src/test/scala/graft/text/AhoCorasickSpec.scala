package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q185 Aho–Corasick blocklist screen: automaton unit behavior
  * (suffix-pattern outputs, overlaps, resets) and replay equality of
  * the full query against naive per-pattern counting. */
class AhoCorasickSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  /** All occurrences of `p` in `t` (overlapping included). */
  private def naiveCount(t: String, p: String): Long = {
    var i = t.indexOf(p); var n = 0L
    while (i >= 0) { n += 1; i = t.indexOf(p, i + 1) }
    n
  }

  test("automaton counts all occurrences incl. dictionary suffixes") {
    val ac = AhoCorasick.build(Seq("scan", "slow scan", "an", "agg"))
    val c = ac.countAll("a slow scan then a scan again; aggregate agg")
    assert(c(0) === 2L) // "scan" matches inside "slow scan" too
    assert(c(1) === 1L)
    // "an": in sc[an]×2, [an]d? — count against naive to be exact
    assert(c(2) === naiveCount("a slow scan then a scan again; aggregate agg", "an"))
    assert(c(3) === 2L) // "agg" in "aggregate" and standalone
  }

  test("non-ASCII chars reset the machine; empty text counts nothing") {
    val ac = AhoCorasick.build(Seq("ab"))
    assert(ac.countAll("aéb ab").toSeq === Seq(1L))
    assert(ac.countAll("").toSeq === Seq(0L))
  }

  test("hasBorder detects self-overlap capability") {
    assert(AhoCorasick.hasBorder("window"))    // w…w
    assert(AhoCorasick.hasBorder("aba"))
    assert(!AhoCorasick.hasBorder("table"))
    assert(!AhoCorasick.hasBorder("a"))
  }

  test("the shipped blocklist is border-free (oracle precondition)") {
    Scrub.Blocklist.foreach(p =>
      assert(!AhoCorasick.hasBorder(p), s"bordered pattern: $p"))
  }

  test("automaton equals naive counting on every sf0.01 document") {
    val spark = SparkSpec.spark
    val ac = AhoCorasick.build(Scrub.Blocklist)
    val docs = graft.ops.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    docs.foreach { t =>
      val got = ac.countAll(t)
      Scrub.Blocklist.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) === naiveCount(t, p), s"pattern '$p'")
      }
    }
  }

  test("blocklistScreen emits the full source×pattern grid with zeros") {
    val spark = SparkSpec.spark
    val rows = Scrub.blocklistScreen(spark, dir).collect()
    val nSources = graft.ops.Tables.documents(spark, dir)
      .select("source").distinct().count()
    assert(rows.length === nSources * Scrub.Blocklist.size)
    // a doc counted in n_docs contributes ≥1 occurrence
    assert(rows.forall(r => r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occ")))
    assert(rows.exists(r => r.getAs[Long]("n_occ") > 0L))
  }
}
