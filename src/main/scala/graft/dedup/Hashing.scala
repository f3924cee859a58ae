package graft.dedup

/** Deterministic, engine-independent hashing primitives used by the
  * near-dup operators. Pure JVM code (no Spark types) so the same bits
  * come out in tests, executors, and any future streaming use.
  */
object Hashing {
  /** FNV-1a 64-bit over a string's UTF-16 code units. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 — cheap avalanche; used to derive hash families. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Word n-gram shingles of a whitespace-tokenized text. */
  def wordShingles(text: String, n: Int): Array[String] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Array(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toArray
  }

  private final val MersennePrime = (1L << 61) - 1

  /** MinHash signature: numPerm universal-hash permutations
    * h_i(x) = (a_i·x + b_i) mod (2^61-1), min over the shingle set.
    * The (a_i, b_i) family is derived deterministically from `seed`. */
  def minHashSignature(shingleHashes: Array[Long], numPerm: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var p = 0
    while (p < numPerm) {
      val a = splitmix64(seed + 2L * p) | 1L   // odd multiplier
      val b = splitmix64(seed + 2L * p + 1)
      var i = 0
      var mn = Long.MaxValue
      while (i < shingleHashes.length) {
        val x = shingleHashes(i) & Long.MaxValue
        val v = java.lang.Math.floorMod(a * x + b, MersennePrime)
        if (v < mn) mn = v
        i += 1
      }
      sig(p) = mn
      p += 1
    }
    sig
  }

  /** Jaccard estimate from two equal-length MinHash signatures. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Exact Jaccard over the distinct-shingle sets. */
  def exactJaccard(a: Array[String], b: Array[String]): Double = {
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** 64-bit SimHash over token hashes: sign of the per-bit weighted sum. */
  def simHash64(tokens: Array[String]): Long = {
    val acc = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = fnv1a64(tokens(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hammingDistance64(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)
}
