package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import graft.dedup.Hashing

/** Minimal deterministic Bloom filter over 64-bit keys, built
  * DISTRIBUTED as a typed [[Aggregator]] (map-side partial bitsets
  * OR-merged up the tree — the driver only ever sees the final
  * [[NumWords]]-long array, ~32 KB).
  *
  * This is the membership-sketch half of a runtime-filter join: build
  * the sketch over the SMALL side's keys, broadcast the bits, and
  * prefilter the big side map-side so the exact join only receives
  * probable matches. False positives are possible (and bounded by the
  * m/n ratio); false negatives are not — so an exact verify stage
  * downstream makes the composition EXACT while the shuffle volume
  * shrinks by the true-negative rate. Bit positions derive from
  * splitmix64 re-mixes of the key, so the filter is reproducible
  * everywhere.
  */
object Bloom {
  val NumBits   = 1 << 18 // 256 Kbit = 32 KB — ~13 bits/key at 20k keys
  val NumHashes = 5
  val NumWords: Int = NumBits / 64

  def bitPositions(key: Long): Array[Int] = Array.tabulate(NumHashes) { i =>
    val h = Hashing.splitmix64(key + 0x9e3779b97f4a7c15L * i)
    (h & (NumBits - 1)).toInt
  }

  def add(bits: Array[Long], key: Long): Unit = {
    val ps = bitPositions(key)
    var i = 0
    while (i < ps.length) {
      val p = ps(i); bits(p >> 6) |= (1L << (p & 63)); i += 1
    }
  }

  def mightContain(bits: Array[Long], key: Long): Boolean = {
    val ps = bitPositions(key)
    var i = 0
    while (i < ps.length) {
      val p = ps(i)
      if ((bits(p >> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Typed aggregate: column of 64-bit keys → bloom bitset. */
  class BloomAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](NumWords)
    def reduce(b: Array[Long], key: Long): Array[Long] = { add(b, key); b }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }
}
