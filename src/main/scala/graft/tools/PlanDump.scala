package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev tool: print the executed plan of the named registry queries —
  * the `.explain("formatted")` loop the round process requires, kept
  * runnable (`sbt "runMain graft.tools.PlanDump q152_merge_upsert"`)
  * so plan iteration is one command, not an ad-hoc console session. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // SPARK_GRAFT_PLAN_FORMATTED=1 switches to `.explain("formatted")`
    // output (numbered operators + per-node details: PushedFilters,
    // ReadSchema, join build side) — the form the plans/ evidence files
    // require; default stays the compact executedPlan tree.
    val formatted = sys.env.get("SPARK_GRAFT_PLAN_FORMATTED").contains("1")
    args.foreach { q =>
      println(s"==== $q")
      val qe = SparkEntry.queries(q)(spark, d).queryExecution
      if (formatted)
        println(qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      else
        println(qe.executedPlan.toString)
    }
    spark.stop()
  }
}
