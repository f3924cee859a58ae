package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The generalized pigeonhole blocking must be RESULT-INVARIANT in the
  * block count: every B > maxHamming keys a superset-free cover of the
  * Hamming ball, so the verified pair set is identical — only the
  * candidate mass (the scale property) changes. A drift here would mean
  * lost recall at exactly the corpus sizes that trigger larger B. */
class SimHashBlockingSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private def pairs(nBlocks: Int): Set[(Long, Long, Int)] = {
    val spark = SparkSpec.spark
    DedupQueries.simHashPairsBlocked(spark, sfDir, maxHamming = 3, nBlocks = nBlocks)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("B = 4, 5, 6 produce the identical verified pair set (sf0.001)") {
    val b4 = pairs(4)
    assert(b4 === pairs(5))
    assert(b4 === pairs(6))
  }

  test("block-count policy steps with log N and never loses the pigeonhole bound") {
    assert(DedupQueries.pigeonholeBlocks(500L, 3) === 4)     // sf0.001/sf0.01
    assert(DedupQueries.pigeonholeBlocks(5000L, 3) === 5)    // sf0.1
    assert(DedupQueries.pigeonholeBlocks(50000L, 3) === 5)   // sf1
    assert(DedupQueries.pigeonholeBlocks(150000L, 3) === 5)  // sf3
    assert(DedupQueries.pigeonholeBlocks(300000000L, 3) === 6)
    // the adaptive entry agrees with the explicit path at this SF
    val spark = SparkSpec.spark
    val adaptive = DedupQueries.simHashPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(adaptive === pairs(4))
  }
}
