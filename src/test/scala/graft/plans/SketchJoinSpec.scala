package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Both decision branches of the sketch-catalog join advisor, pinned
  * on constructed tables (VERDICT r12 next-round #4): with size-based
  * broadcast off, a catalogued small side flips the join to broadcast;
  * an over-budget estimate leaves the shuffle join alone. Results are
  * identical either way — only the strategy moves. */
class SketchJoinSpec extends AnyFunSuite {

  /** Flatten through AQE wrappers: AdaptiveSparkPlanExec and the
    * (leaf) QueryStageExec nodes both hide their subtree from a plain
    * `collect`. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val below = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: below.flatMap(flatten)
  }

  private def joins(p: SparkPlan): Seq[SparkPlan] = flatten(p).collect {
    case b: BroadcastHashJoinExec => b
    case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    case h: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => h
  }

  test("catalogued row estimate flips broadcast on; over-budget estimate leaves shuffle") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sketch_join").toString
    (0L until 20000L).map(i => (i % 500L, i)).toDF("f_k", "f_id")
      .write.parquet(s"$dir/fact")
    (0L until 500L).map(k => (k, s"d$k")).toDF("d_k", "d_name")
      .write.parquet(s"$dir/dim")
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold").getOrElse(""))
    try {
      // kill size-based broadcast: the sketch hint is the only path in
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.sketchJoin.broadcastRows", "1000")
      def planJoin() = {
        val f = spark.read.parquet(s"$dir/fact")
        val dd = spark.read.parquet(s"$dir/dim")
        f.join(dd, f("f_k") === dd("d_k"))
      }
      SketchCatalog.clear()

      // no catalog entry → no hint → shuffle join
      val cold = planJoin(); cold.collect()
      assert(joins(cold.queryExecution.executedPlan)
        .exists(!_.isInstanceOf[BroadcastHashJoinExec]))
      assert(!joins(cold.queryExecution.executedPlan)
        .exists(_.isInstanceOf[BroadcastHashJoinExec]))

      // analyze the dim (one scan: rows + KMV distinct) → fits budget →
      // the rule hints broadcast
      val sk = SketchCatalog.analyze(spark, s"$dir/dim", "d_k")
      assert(sk.rows == 500L)
      // KMV on 500 distinct keys with k=1024 is exact below k
      assert(sk.distinctKeys == 500L)
      val hinted = planJoin()
      val rows = hinted.collect()
      assert(joins(hinted.queryExecution.executedPlan)
        .exists(_.isInstanceOf[BroadcastHashJoinExec]))
      assert(rows.length == 20000)

      // over-budget estimate → rule declines, shuffle join stays
      SketchCatalog.register(s"$dir/dim", SketchCatalog.TableSketch(50000L, 50000L))
      val declined = planJoin()
      val rows2 = declined.collect()
      assert(!joins(declined.queryExecution.executedPlan)
        .exists(_.isInstanceOf[BroadcastHashJoinExec]))
      assert(rows2.length == 20000)
    } finally {
      spark.conf.unset("spark.graft.sketchJoin.broadcastRows")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved(0)._2)
      if (saved(1)._2.nonEmpty)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", saved(1)._2)
      else spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      SketchCatalog.clear()
    }
  }
}
