package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{FusedCosine, GraftFunctions, Md5LowerLong}
import graft.plans.{AsOfJoinStrategy, SketchJoinRule}

/** The single `spark.sql.extensions` entry point for the library:
  * `spark.sql.extensions=graft.GraftExtensions` registers every custom
  * Catalyst piece cluster-wide — the `fused_cosine` SQL function, the
  * native as-of-join planner strategy, and the sketch-catalog join
  * advisor (off until `spark.graft.sketchJoin.broadcastRows` is set).
  * Set automatically by `graft.Sessions.local`; on shared
  * infrastructure it goes in `spark-defaults.conf`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fused_cosine"),
      new ExpressionInfo(classOf[FusedCosine].getCanonicalName, "fused_cosine"),
      GraftFunctions.fusedCosineBuilder _))
    ext.injectFunction((
      FunctionIdentifier("md5_lower64"),
      new ExpressionInfo(classOf[Md5LowerLong].getCanonicalName, "md5_lower64"),
      GraftFunctions.md5LowerLongBuilder _))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(s => SketchJoinRule(s))
  }
}
