package graft.dedup

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property tests (seeded random trials — the offline cache has no
  * scalatest↔scalacheck bridge) for the hash primitives the near-dup
  * operators and their DuckDB oracles depend on. */
class HashingSpec extends AnyFunSuite {

  private val p = Hashing.MersennePrime

  test("md5Lower64 matches DuckDB md5_number_lower on known digests") {
    // duckdb: select md5_number_lower('abc'), md5_number_lower('')
    assert(Hashing.md5Lower64("abc") === 8250560606382298838L)
    assert(Hashing.md5Lower64("") === 9098107892288553193L)
  }

  test("mersenneHash equals exact BigInt (a*x+b) mod (2^61-1)") {
    val rng = new Random(1)
    for (_ <- 1 to 5000) {
      val a = 1 + (rng.nextLong().abs % (p - 1))
      val b = rng.nextLong().abs % p
      val x = rng.nextLong() >>> 3 // [0, 2^61)
      val expect = ((BigInt(a) * BigInt(x) + BigInt(b)) mod BigInt(p)).toLong
      assert(Hashing.mersenneHash(a, b, x) === expect, s"a=$a b=$b x=$x")
    }
  }

  test("permConstants are in-range, distinct and deterministic") {
    val c1 = Hashing.permConstants(64, 42L)
    val c2 = Hashing.permConstants(64, 42L)
    assert(c1.toSeq == c2.toSeq)
    c1.foreach { case (a, b) =>
      assert(a >= 1 && a < p); assert(b >= 0 && b < p)
    }
    assert(c1.map(_._1).distinct.length === 64) // no colliding multipliers
  }

  test("minhash signature is set-semantic: order and duplicates don't matter") {
    val consts = Hashing.permConstants(64, 42L)
    val rng = new Random(2)
    for (_ <- 1 to 50) {
      val words = Array.fill(1 + rng.nextInt(40))(s"w${rng.nextInt(30)}")
      val shuffled = rng.shuffle(words.toSeq).toArray
      val withDups = words ++ words.take(rng.nextInt(words.length))
      val s1 = Hashing.minHashSignature(words.map(Hashing.shingleBaseHash), consts)
      val s2 = Hashing.minHashSignature(shuffled.map(Hashing.shingleBaseHash), consts)
      val s3 = Hashing.minHashSignature(withDups.map(Hashing.shingleBaseHash), consts)
      assert(s1.toSeq == s2.toSeq)
      assert(s1.toSeq == s3.toSeq)
    }
  }

  test("estimateJaccard converges to exactJaccard (256 perms, |err| < 0.15)") {
    val consts = Hashing.permConstants(256, 7L)
    val base = (0 until 200).map(i => s"tok$i")
    for (overlap <- Seq(0, 50, 100, 150, 200)) {
      val a = base.toArray
      val b = (base.take(overlap) ++ (0 until (200 - overlap)).map(i => s"other$i")).toArray
      val exact = Hashing.exactJaccard(a, b)
      val est = Hashing.estimateJaccard(
        Hashing.minHashSignature(a.map(Hashing.shingleBaseHash), consts),
        Hashing.minHashSignature(b.map(Hashing.shingleBaseHash), consts))
      assert(math.abs(est - exact) < 0.15, s"overlap=$overlap exact=$exact est=$est")
    }
  }

  test("exactJaccard hand-computed") {
    assert(Hashing.exactJaccard(Array("a", "b", "c"), Array("b", "c", "d")) === 0.5)
    assert(Hashing.exactJaccard(Array("a"), Array("a", "a")) === 1.0) // multiset → set
    assert(Hashing.exactJaccard(Array.empty[String], Array.empty[String]) === 0.0)
  }

  test("simHash determinism + hamming properties") {
    val rng = new Random(3)
    for (_ <- 1 to 100) {
      val toks = Array.fill(rng.nextInt(50))(s"t${rng.nextInt(40)}")
      assert(Hashing.simHash64(toks) === Hashing.simHash64(toks.clone()))
      val x = rng.nextLong(); val y = rng.nextLong()
      assert(Hashing.hammingDistance64(x, y) === Hashing.hammingDistance64(y, x))
      assert(Hashing.hammingDistance64(x, x) === 0)
      assert(Hashing.hammingDistance64(x, ~x) === 64)
    }
    assert(Hashing.simHash64(Array.empty) === 0L)
  }

  test("near-identical token lists give small hamming distance") {
    val base = (0 until 100).map(i => s"word$i").toArray
    val tweaked = base.updated(3, "changed")
    val d = Hashing.hammingDistance64(
      Hashing.simHash64(base), Hashing.simHash64(tweaked))
    assert(d <= 10, s"hamming=$d for a 1-token edit over 100 tokens")
  }

  test("simHashBlocks reassemble the fingerprint") {
    val rng = new Random(4)
    for (_ <- 1 to 200) {
      val fp = rng.nextLong()
      val blocks = Hashing.simHashBlocks(fp)
      assert(blocks.forall(b => b >= 0 && b <= 0xffff))
      val re = blocks.zipWithIndex.map { case (b, k) => b.toLong << (k * 16) }.reduce(_ | _)
      assert(re === fp)
    }
  }

  test("wordShingles: n-grams, short-text fallback, whitespace runs") {
    assert(Hashing.wordShingles("a b c d", 3).toSeq == Seq("a b c", "b c d"))
    assert(Hashing.wordShingles("a b", 3).toSeq == Seq("a b"))
    assert(Hashing.wordShingles("", 3).toSeq == Seq(""))
    assert(Hashing.wordShingles("  a   b  ", 3).toSeq == Seq("a b"))
  }

  test("charShingles windows over code points, not UTF-16 units") {
    // ASCII fast path
    assert(Hashing.charShingles("abcd", 3).toSeq == Seq("abc", "bcd"))
    assert(Hashing.charShingles("ab", 3).toSeq == Seq("ab"))
    // non-BMP: each emoji is one code point but two UTF-16 chars.
    // DuckDB's text[i:j] counts code points — shingles must match it
    // and never split a surrogate pair.
    val s = "a😀b😁" // a😀b😁 — 4 code points, 6 chars
    val got = Hashing.charShingles(s, 3).toSeq
    assert(got == Seq("a😀b", "😀b😁"))
    assert(got.forall(g => g.codePointCount(0, g.length) == 3))
    // degenerate: 2 code points < n=3 → whole text
    assert(Hashing.charShingles("😀😁", 3).toSeq ==
      Seq("😀😁"))
  }
}
