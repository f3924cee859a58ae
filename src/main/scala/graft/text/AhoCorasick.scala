package graft.text

/** Aho–Corasick multi-pattern string automaton, precompiled to a dense
  * DFA over the 7-bit-ASCII alphabet.
  *
  * This is the scale answer to "screen every document against a K-term
  * blocklist": one automaton pass per document — O(len + matches)
  * regardless of K — where the naive plan is K separate substring
  * scans (K regex passes at 100 TB is K full-corpus reads of CPU). The
  * automaton is built once on the driver from the (tiny) pattern list
  * and BROADCAST; matching is pure per-row compute, embarrassingly
  * parallel, no shuffle until the |sources|×K-bounded rollup.
  *
  * Counting semantics: every occurrence of every pattern is counted at
  * its end position, including patterns that are suffixes of other
  * patterns (via the dictionary-suffix links) and overlapping
  * occurrences of one pattern. For BORDER-FREE patterns (no proper
  * prefix = suffix) overlapping and non-overlapping counts coincide,
  * which is what lets the DuckDB oracle count via
  * `(len(t) - len(replace(t, p, ''))) / len(p)` — [[Scrub.Blocklist]]
  * is border-free by construction and the spec asserts it.
  *
  * Characters ≥ 128 cannot appear in any pattern and reset the state
  * machine to the root (they act as separators), exactly as the
  * substring semantics of the oracle require for ASCII patterns.
  */
final class AhoCorasick private (
    delta: Array[Int],       // states × 128, resolved goto+fail DFA
    outputs: Array[Array[Int]], // pattern ids ending at each state
    val nPatterns: Int) extends Serializable {

  /** All-occurrence counts per pattern id over `text`, one pass. */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](nPatterns)
    var st = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      st = if (c < 128) delta(st * 128 + c) else 0
      val out = outputs(st)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {
  /** Classic build: trie → BFS fail links → dictionary-suffix output
    * merge → dense DFA (delta(s,c) follows fail links at build time so
    * the match loop is one array read per char). */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(p => p.nonEmpty && p.forall(_ < 128)),
      "patterns must be non-empty 7-bit ASCII")
    // trie
    val goto = scala.collection.mutable.ArrayBuffer(new Array[Int](128).map(_ => -1))
    val own = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var st = 0
      p.foreach { c =>
        if (goto(st)(c) == -1) {
          goto += new Array[Int](128).map(_ => -1)
          own += Nil
          goto(st)(c) = goto.size - 1
        }
        st = goto(st)(c)
      }
      own(st) = pid :: own(st)
    }
    val n = goto.size
    val fail = new Array[Int](n)
    val out = new Array[List[Int]](n)
    val delta = new Array[Int](n * 128)
    val queue = scala.collection.mutable.Queue[Int]()
    // depth-1: fail to root
    var c = 0
    while (c < 128) {
      val t = goto(0)(c)
      if (t == -1) delta(c) = 0
      else { delta(c) = t; fail(t) = 0; queue += t }
      c += 1
    }
    out(0) = own(0)
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = own(s) ::: out(fail(s)) // dictionary-suffix outputs
      var c = 0
      while (c < 128) {
        val t = goto(s)(c)
        if (t == -1) delta(s * 128 + c) = delta(fail(s) * 128 + c)
        else {
          delta(s * 128 + c) = t
          fail(t) = delta(fail(s) * 128 + c)
          queue += t
        }
        c += 1
      }
    }
    new AhoCorasick(delta, out.map(_.toArray.sorted), patterns.size)
  }

  /** True iff `p` has a proper border (prefix = suffix), i.e. can
    * overlap itself — the property the oracle's replace-count CANNOT
    * handle; [[build]] callers feeding a replace-based oracle must
    * reject bordered patterns. KMP prefix function, O(len). */
  def hasBorder(p: String): Boolean = {
    val pi = new Array[Int](p.length)
    var k = 0
    for (i <- 1 until p.length) {
      while (k > 0 && p.charAt(i) != p.charAt(k)) k = pi(k - 1)
      if (p.charAt(i) == p.charAt(k)) k += 1
      pi(i) = k
    }
    p.length > 1 && pi(p.length - 1) > 0
  }
}
