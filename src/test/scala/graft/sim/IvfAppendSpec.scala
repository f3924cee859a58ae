package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Tables

/** q174 — the registered IVF append arc: base index + frozen-codebook
  * delta append must hold exactly the rows a from-scratch re-assign
  * produces, the search must equal brute force (probe-all), and the
  * two-generation bucketed list read must stay exchange-free under
  * the worst case (forced SMJ, AQE off). */
class IvfAppendSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"

  private def emb(spark: org.apache.spark.sql.SparkSession): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  test("q174 appended lists equal a from-scratch full re-assign, row-for-row") {
    val spark = SparkSpec.spark
    val (centTbl, listTbl) = SimilarityQueries.ivfAppendedIndex(spark, sfDir)
    val got = spark.table(listTbl).select("cent_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = SimilarityQueries.ivfAssign(emb(spark), spark.table(centTbl))
      .select("cent_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect)
    // both generations are present: the delta batch landed
    val deltas = spark.table(listTbl)
      .where(col("vec_id") % SimilarityQueries.AppendMod === 0).count()
    assert(deltas > 0, "append batch missing from the persisted lists")
  }

  test("q174 search over the appended index equals brute-force top-k") {
    val spark = SparkSpec.spark
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue())).toSet
    assert(rows(SimilarityQueries.ivfAppendTopK(spark, sfDir)
        .select("qid", "neighbor_id", "rank")) ===
      rows(SimilarityQueries.cosineTopK(spark, sfDir)
        .select("qid", "neighbor_id", "rank")))
  }

  test("q174 list side is exchange-free across both file generations") {
    val spark = SparkSpec.spark
    val saved = Seq(
      "spark.sql.adaptive.enabled" -> spark.conf.get("spark.sql.adaptive.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SimilarityQueries.ivfAppendTopK(spark, sfDir)
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      def isListScan(p: SparkPlan): Boolean = p match {
        case sc: FileSourceScanExec =>
          sc.tableIdentifier.exists(_.table.startsWith("ivfapp_lists"))
        case _ => false
      }
      def paths(p: SparkPlan, acc: List[SparkPlan]): Seq[List[SparkPlan]] = {
        val here = p :: acc
        if (isListScan(p)) Seq(here) else p.children.flatMap(c => paths(c, here))
      }
      val scanPaths = paths(plan, Nil)
      assert(scanPaths.nonEmpty, "q174 plan reads no persisted list table")
      for (path <- scanPaths) {
        val toJoin = path.takeWhile(!_.isInstanceOf[BaseJoinExec])
        val shuffles = toJoin.filter(_.isInstanceOf[ShuffleExchangeExec])
        assert(shuffles.isEmpty,
          s"exchange between appended IVF list scan and its join:\n${path.head}")
      }
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
