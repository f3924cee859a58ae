package graft.tools

/** Scratch: verified near-dup pair mass at a given SF — the input
  * grain of the pair-graph family (q45/q64/q116/q121/q187), for the
  * sf3 ratio model in PERF_NOTES r18. */
object PairMass {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("scaledata/sf3")
    val s = graft.Sessions.local()
    println("PAIRS " + graft.dedup.DedupQueries.minHashJaccardPairs(s, d).count())
    s.stop()
  }
}
