package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q190 curation waterfall: the stage counts must PARTITION the corpus
  * and be consistent with q48's survivor list. */
class WaterfallSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("waterfall stages partition the corpus; 5_kept ≡ the q48 keep-list (sf0.01)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val rows = Scrub.curationWaterfall(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("stage")) ->
        r.getAs[Long]("n_docs")).toMap
    val perSourceTotals = graft.ops.Tables.documents(spark, dir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // stages partition: per source, Σ stage counts = total docs
    perSourceTotals.foreach { case (src, n) =>
      val got = rows.collect { case ((`src`, _), c) => c }.sum
      assert(got === n, s"source $src")
    }
    // first-failure attribution is consistent with the composed filter:
    // the 5_kept mass equals q48's survivors per source
    val kept = Scrub.curatedCorpus(spark, dir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSourceTotals.keys.foreach { src =>
      assert(rows.getOrElse((src, "5_kept"), 0L) === kept.getOrElse(src, 0L),
        s"source $src kept mass")
    }
    // stage labels are valid and the gates this corpus CAN trip all
    // fire (sf0.01 plants near-dups but no byte-exact dups, so the
    // 1_exact_dup cell is legitimately absent here — q16 agrees)
    val stages = rows.keys.map(_._2).toSet
    val all = Set("1_exact_dup", "2_benchmark_overlap",
      "3_low_quality", "4_contaminated", "5_kept")
    assert(stages.subsetOf(all))
    assert(Set("2_benchmark_overlap", "3_low_quality",
      "4_contaminated", "5_kept").subsetOf(stages))
  }
}
