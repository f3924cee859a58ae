package graft

import org.scalatest.funsuite.AnyFunSuite

/** Canary for the r10 object-init-cycle corruption: a strict val SQL
  * string that interpolates ANOTHER object's plain val can bake a 0
  * when the init graph re-enters a mid-initialization object (the
  * DedupQueries → splitLeakageSql → CorpusOps → Scrub →
  * DedupQueries.IncBatchMod cycle produced `doc_id % 0 = 0` in the
  * full-registry Verify run while every targeted run was green). The
  * constants are now `final` (compile-time inlined) and the
  * cycle-opening vals lazy; this asserts the invariant on every
  * registered oracle so a future cycle cannot ship silently. */
class OracleSqlSpec extends AnyFunSuite {

  test("no oracle SQL carries an init-order-zeroed constant") {
    val bads = Seq("% 0 ", "% 0)", "% 0=", "% 0 =", " div 0", "// 0 ", "INTO 0 BUCKETS")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      bads.foreach(b => assert(!sql.contains(b), s"$name oracle contains '$b': $sql"))
      assert(sql.trim.nonEmpty, s"$name oracle is empty")
    }
    // the two cycle-prone compositions, pinned to their true literals
    assert(SparkEntry.oracleSql("q128_incremental_spans").contains("% 5 = 4"))
    assert(SparkEntry.oracleSql("q130_incremental_spans_indexed").contains("% 5 = 4"))
    assert(SparkEntry.oracleSql("q129_split_leakage").contains("< 205"))
  }

  /** Empty since round 16: q223 (zlib compression probe) was the one
    * deliberate exception — DEFLATE has no SQL twin — until its oracle
    * became the precomputed deflate-length FIXTURE
    * (`fixtures/q223_deflate.parquet`, see Compressibility), restoring
    * the full rows+schema+hash contract. Any gap here is a
    * registration mistake. */
  val OracleFree = Set.empty[String]

  test("every registered query has an oracle, except the documented oracle-free set") {
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet === OracleFree)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("packs partition the registry: disjoint names, union exact, every entry fully paired") {
    val names = SparkEntry.packs.flatMap(_.entries.map(_._1))
    // a name registered in two packs would silently shadow in the
    // union maps — fail loudly instead
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"names registered in more than one pack: $dups")
    assert(names.toSet === SparkEntry.queries.keySet)
    assert(names.toSet === SparkEntry.oracleSql.keySet)
    // the registry size is pinned so a dropped pack (or a pack whose
    // entries Seq silently emptied) cannot ship as a smaller registry
    assert(names.length === 287, s"registry size changed: ${names.length}")
  }
}
