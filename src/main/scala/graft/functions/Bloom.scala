package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import graft.dedup.Hashing

/** Minimal deterministic Bloom filter over 64-bit keys, built
  * DISTRIBUTED as a typed [[Aggregator]] (map-side partial bitsets
  * OR-merged up the tree — the driver only ever sees the final
  * bitset, `numBits/8` bytes).
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
  *
  * The sketch is sized per use from the actual key count
  * ([[sizeFor]]) rather than a compile-time constant: a static size
  * tuned for one SF silently saturates (FP rate → 1) when the keyed
  * side grows with the data, degrading the prefilter to pure overhead
  * while output stays correct — invisible without a fill-ratio check.
  */
object Bloom {
  val BitsPerKey = 13 // ~13 bits/key ≈ 1% FP at 5 hashes
  val NumHashes  = 5
  val MinBits    = 1 << 12 // 4 Kbit floor — below this the array overhead dominates
  val MaxBits    = 1 << 27 // 16 MB ceiling — beyond this broadcast cost beats FP savings

  /** Next power of two ≥ BitsPerKey·n, clamped to [MinBits, MaxBits].
    * Power-of-two so position extraction is a mask, not a modulo. */
  def sizeFor(numKeys: Long): Int = {
    val want = math.max(MinBits.toLong, numKeys * BitsPerKey)
    val pow2 = java.lang.Long.highestOneBit(math.min(want * 2 - 1, MaxBits.toLong))
    math.min(pow2, MaxBits.toLong).toInt
  }

  def bitPositions(key: Long, numBits: Int): Array[Int] = Array.tabulate(NumHashes) { i =>
    val h = Hashing.splitmix64(key + 0x9e3779b97f4a7c15L * i)
    (h & (numBits - 1)).toInt
  }

  def add(bits: Array[Long], key: Long, numBits: Int): Unit = {
    val ps = bitPositions(key, numBits)
    var i = 0
    while (i < ps.length) {
      val p = ps(i); bits(p >> 6) |= (1L << (p & 63)); i += 1
    }
  }

  def mightContain(bits: Array[Long], key: Long, numBits: Int): Boolean = {
    val ps = bitPositions(key, numBits)
    var i = 0
    while (i < ps.length) {
      val p = ps(i)
      if ((bits(p >> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Set-bit fraction — the saturation gauge. ~0.5 at design load with
    * 5 hashes; approaching 1.0 means the sketch is undersized and the
    * prefilter is passing everything. */
  def fillRatio(bits: Array[Long]): Double = {
    var pop = 0L
    var i = 0
    while (i < bits.length) { pop += java.lang.Long.bitCount(bits(i)); i += 1 }
    pop.toDouble / (bits.length.toLong * 64)
  }

  /** Typed aggregate: column of 64-bit keys → bloom bitset of
    * `numBits` (power of two) bits. */
  class BloomAgg(numBits: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require((numBits & (numBits - 1)) == 0, s"numBits must be a power of two, got $numBits")
    def zero: Array[Long] = new Array[Long](numBits / 64)
    def reduce(b: Array[Long], key: Long): Array[Long] = { add(b, key, numBits); b }
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
