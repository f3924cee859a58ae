package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The pre-aggregate-then-expand formulation must equal the direct
  * expand-on-scan GROUPING SETS over the fact table. */
class GroupingSetsSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("q147 distributive re-aggregation equals direct grouping sets on the fact") {
    val spark = SparkSpec.spark
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (Option(r.getAs[String]("lang")),
        Option(r.getAs[String]("source")), r.getAs[Long]("gid"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("chars_sum"))).sortBy(_.toString)
    val direct = Tables.documents(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")), Seq(col("source"))),
        col("lang"), col("source"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("chars_sum"))
      .select(col("lang"), col("source"), col("gid").cast("long").as("gid"),
        col("n_docs"), col("chars_sum"))
    assert(canon(RelationalQueries.groupingSetsAgg(spark, sfDir)) === canon(direct))
    // gid encodes first-column-high-bit: base grain 0, lang-only 1, source-only 2
    val gids = canon(direct).map(_._3).toSet
    assert(gids == Set(0L, 1L, 2L))
  }

  test("q151 melt(pivot(x)) covers the full source x lang grid and matches the direct count") {
    val spark = SparkSpec.spark
    val got = RelationalQueries.unpivotLangCounts(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = Tables.documents(spark, sfDir)
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sources = direct.keys.map(_._1).toSet
    val langs = Set("en", "de", "es", "fr", "zh")
    assert(got.keySet === (for (s <- sources; l <- langs) yield (s, l)))
    got.foreach { case (k, n) => assert(n === direct.getOrElse(k, 0L), s"$k") }
  }
}
