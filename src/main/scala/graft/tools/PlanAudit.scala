package graft.tools


import graft.SparkEntry

/** Prints the formatted physical plan of selected registered queries —
  * the per-operator audit loop (pushdown reached the scan? codegen spans
  * wide? shuffles only where semantics demand?).
  *
  * Usage: runMain graft.tools.PlanAudit <sfDir> [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.Sessions.local()
    names.foreach { n =>
      println(s"\n=================== $n ===================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
