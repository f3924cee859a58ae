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
    args.foreach { q =>
      println(s"==== $q")
      println(SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
