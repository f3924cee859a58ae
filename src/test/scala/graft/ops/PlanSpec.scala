package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Plan-shape assertions: the scale properties the code comments claim
  * (pushdown, pruning, map-side partials, single exchanges) must
  * survive refactors — `.explain` by hand doesn't regress-test itself. */
class PlanSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private def plan(q: String): String = {
    val spark = SparkSpec.spark
    graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
  }

  test("q01 pushes filters and prunes columns into the parquet scan") {
    val p = plan("q01_scan_filter_project")
    // plan .toString truncates long field lists — assert on stable prefixes
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), IsNotNull(c_acctbal), " +
      "EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_acctbal:double,c_mktsegment:string"), p)
  }

  test("q37 aggregator runs a partial ObjectHashAggregate before the exchange") {
    val p = plan("q37_topk_agg")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(c_nationkey")
    assert(exchangeIdx > 0, p)
    // a partial aggregate must appear BELOW (after, in tree print) the exchange
    assert(p.indexOf("ObjectHashAggregate", exchangeIdx) > 0, p)
  }

  test("q02 group-agg: two exchanges (distinct-agg expansion), partials before each") {
    val p = plan("q02_group_agg")
    // countDistinct rewrites to a two-level aggregate: (key, distinct col)
    // partials → exchange → merge → exchange on key. More would mean the
    // partial aggregation broke.
    assert(p.linesIterator.count(_.contains("Exchange")) === 2, p)
    assert(p.contains("partial_count"), p)
  }

  test("q27 sessionize reuses one (user_id) exchange for both windows") {
    val p = plan("q27_sessionize")
    // two window fns + final agg over the same partitioning: exchanges
    // must not multiply per window
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2, p)
  }

  test("q59 inverted index: bounded aggregates, no Expand, no collect_set") {
    val p = plan("q59_inverted_index")
    // the r4 countDistinct+collect_set shape planned an Expand (distinct
    // rewrite) and an unbounded per-term set buffer; the r5 two-stage
    // plan must show neither — just hash aggregates + the MinK udaf
    assert(!p.contains("Expand"), p)
    assert(!p.contains("collect_set"), p)
    assert(p.contains("ObjectHashAggregate"), p) // MinK partial+merge
  }

  test("q11 autoencoder scoring plan is shuffle-free") {
    val p = plan("q11_autoencoder_score")
    assert(!p.contains("Exchange"), p)
  }
}
