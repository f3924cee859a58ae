package graft.dedup

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic, engine-independent hashing primitives used by the
  * near-dup operators. Pure JVM code (no Spark types) so the same bits
  * come out in tests, executors, and any future streaming use.
  *
  * Every data-dependent hash is derived from MD5 so that the DuckDB
  * oracle can recompute the identical values (`md5_number_lower(s)` =
  * little-endian uint64 of digest bytes 8..15 — verified experimentally);
  * the permutation families on top are exact universal hashes
  * h(x) = (a·x + b) mod (2^61 - 1) with the 128-bit product reduced via
  * Mersenne folding, so the independence guarantees actually hold
  * (Broder, "On the resemblance and containment of documents", 1997).
  */
object Hashing {

  /** FNV-1a 64-bit over a string's UTF-16 code units (kept for fast
    * non-oracle paths). */
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

  /** splitmix64 — cheap avalanche; used to derive hash-family constants. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Lower 64 bits of md5(s) — little-endian interpretation of digest
    * bytes 8..15, bit-identical to DuckDB's `md5_number_lower`. */
  def md5Lower64(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (bytes(i) & 0xffL); i -= 1 }
    h
  }

  /** Word n-gram shingles of a whitespace-tokenized text. */
  def wordShingles(text: String, n: Int): Array[String] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Array(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toArray
  }

  /** Character n-gram shingles (sliding window over CODE POINTS,
    * multiplicity preserved; shorter-than-n text → itself as the one
    * shingle — mirrors [[wordShingles]]' degenerate case). Code points,
    * not UTF-16 code units: DuckDB's len/substring count code points,
    * so UTF-16 windows would split surrogate pairs on any non-BMP
    * character (emoji, astral CJK) and the q67 oracle's shingle sets
    * would diverge (ADVICE r6). For pure-BMP text the two are
    * identical, and the all-ASCII fast path keeps the hot loop
    * substring-based. */
  def charShingles(text: String, n: Int): Array[String] = {
    val cpCount = text.codePointCount(0, text.length)
    if (cpCount < n) Array(text)
    else if (cpCount == text.length) // no surrogate pairs: offsets == indices
      Array.tabulate(text.length - n + 1)(i => text.substring(i, i + n))
    else {
      // code-point start offsets (cpCount + 1 entries incl. end)
      val offs = new Array[Int](cpCount + 1)
      var i = 0
      var c = 0
      while (c < cpCount) { offs(c) = i; i = text.offsetByCodePoints(i, 1); c += 1 }
      offs(cpCount) = text.length
      Array.tabulate(cpCount - n + 1)(j => text.substring(offs(j), offs(j + n)))
    }
  }

  /** Whitespace tokens (multiplicity preserved — SimHash weights repeat
    * tokens). */
  def tokens(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  final val MersennePrime: Long = (1L << 61) - 1

  /** Exact (a·x + b) mod (2^61 - 1) for 0 ≤ x < 2^61, 0 < a < p, 0 ≤ b < p.
    * The 128-bit product hi:lo is folded with 2^61 ≡ 1 (mod p): split into
    * 61-bit limbs whose sum is ≡ the product. */
  def mersenneHash(a: Long, b: Long, x: Long): Long = {
    val lo = a * x
    val hi = Math.multiplyHigh(a, x)
    val p = MersennePrime
    var r = (lo & p) + (((lo >>> 61) | (hi << 3)) & p) + (hi >>> 58) + b
    while (r >= p) r -= p
    r
  }

  /** Deterministic universal-hash family for MinHash: numPerm (a, b)
    * pairs derived from `seed`, a ∈ [1, p-1], b ∈ [0, p-1]. The same
    * constants are injected as literals into the DuckDB oracle SQL. */
  def permConstants(numPerm: Int, seed: Long): Array[(Long, Long)] =
    Array.tabulate(numPerm) { i =>
      val a = java.lang.Math.floorMod(splitmix64(seed + 2L * i), MersennePrime - 1) + 1
      val b = java.lang.Math.floorMod(splitmix64(seed + 2L * i + 1), MersennePrime)
      (a, b)
    }

  /** 61-bit shingle base hash: md5-lower >>> 3 (non-negative, < 2^61, so
    * signed and unsigned comparison orders agree in both engines). */
  def shingleBaseHash(shingle: String): Long = md5Lower64(shingle) >>> 3

  /** MinHash signature: for each permutation i, min over the shingle
    * base-hashes of h_i(x) = (a_i·x + b_i) mod (2^61-1). Duplicate
    * shingles cannot change a min, so callers may pass the multiset. */
  def minHashSignature(baseHashes: Array[Long], consts: Array[(Long, Long)]): Array[Long] = {
    val sig = new Array[Long](consts.length)
    var p = 0
    while (p < consts.length) {
      val (a, b) = consts(p)
      var mn = Long.MaxValue
      var i = 0
      while (i < baseHashes.length) {
        val v = mersenneHash(a, b, baseHashes(i))
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

  /** [[exactJaccard]] as half-up integer ten-thousandths. Compared
    * jaccard cells ship k/10⁴ (k from THIS integer arithmetic, mirrored
    * in the oracle SQL) instead of round(double, 4): an integer-ratio
    * double lands on decimal rounding ties where Spark and DuckDB
    * round() disagree a ULP apart — the q108 failure mode (see
    * [[graft.text.CorpusOps.tokenBudget]]'s FLOAT RULE). */
  def exactJaccardX10k(a: Array[String], b: Array[String]): Long = {
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size.toLong
    val union = sa.size + sb.size - inter
    if (union == 0L) 0L else (inter * 10000L + union / 2) / union
  }

  /** Same scaled-integer Jaccard over SORTED-DISTINCT long arrays — a
    * primitive merge loop, no per-pair Set allocation. For the q138
    * audit, whose cost is pairs × set-intersection: with ~1e6 sampled
    * pairs the string-Set version spends ~30 s re-hashing shingle
    * strings; merging pre-sorted base-hash arrays is ~20× cheaper. */
  def exactJaccardX10kSorted(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var j = 0; var inter = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length.toLong + b.length - inter
    if (union == 0L) 0L else (inter * 10000L + union / 2) / union
  }

  /** 64-bit SimHash over md5-lower token hashes: sign of the per-bit
    * weighted sum, strict `> 0` for a set bit (ties → 0). */
  def simHash64(tokens: Array[String]): Long = {
    val acc = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = md5Lower64(tokens(t))
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

  /** The 4 × 16-bit pigeonhole blocks of a SimHash (two fingerprints
    * within Hamming distance 3 must agree on ≥ 1 whole block). */
  def simHashBlocks(simhash: Long): Array[Int] =
    Array.tabulate(4)(k => ((simhash >>> (k * 16)) & 0xffffL).toInt)

  def hammingDistance64(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)
}
