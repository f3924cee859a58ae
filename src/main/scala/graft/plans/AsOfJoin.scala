package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, NullsFirst,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Native AS-OF JOIN (both directions) — the custom-operator tier (c)
  * of the build plan: a whole-operator semantic Spark lacks, expressed
  * as its own `LogicalPlan` + `SparkStrategy` + `SparkPlan` and
  * registered through `SparkSessionExtensions`
  * (graft.GraftExtensions, wired in graft.Sessions).
  *
  * Semantics: for every left row, attach the single right row with the
  * SAME key and — backward (`forward = false`) — the GREATEST
  * right-time STRICTLY BELOW the left time (DuckDB `ASOF LEFT JOIN ...
  * ON l.k = r.k AND l.t > r.t`, the window-composed q32), or —
  * forward — the SMALLEST right-time STRICTLY ABOVE it (the
  * window-composed q139). Null-extended when none.
  *
  * Scale shape: `requiredChildDistribution` clusters both children on
  * the key (one hash exchange each — EnsureRequirements inserts them,
  * and AQE can re-plan them), `requiredChildOrdering` sorts by
  * (key, time), and the operator itself is a single-pass per-partition
  * merge holding O(1) state — backward keeps one lookahead row + one
  * candidate; forward only the lookahead, because the first right row
  * at/after the stop condition IS the match. No per-key buffering, no
  * range probe, no time-key explosion. The window-composed rewrites
  * need the same exchange but buffer whole key groups in the window
  * sort; this node streams them.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean = false)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of key types must match")
  require(leftTime.dataType == rightTime.dataType,
    "as-of time types must match")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Cluster both sides on the key; EnsureRequirements picks one
    * numPartitions and inserts compatible hash exchanges (same contract
    * as shuffled joins since SPARK-35703 removed HashClusteredDistribution). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def ordering(keys: Seq[Expression], time: Expression): Seq[SortOrder] =
    (keys :+ time).map(SortOrder(_, Ascending, NullsFirst, Seq.empty))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(ordering(leftKeys, leftTime), ordering(rightKeys, rightTime))

  /** Left rows pass through in order — preserve their partitioning and
    * (key, time) ordering so downstream ops skip re-exchange/re-sort. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = ordering(leftKeys, leftTime)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj  = UnsafeProjection.create(lk, lOut)
      val rKeyProj  = UnsafeProjection.create(rk, rOut)
      val mKeyProj  = UnsafeProjection.create(rk, rOut) // lastMatch's own buffer
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd  = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      val fwd = forward
      new Iterator[InternalRow] {
        // one-row lookahead into the sorted right side (copied: sorter
        // iterators reuse row buffers) + — backward only — the best
        // predecessor so far
        private var rHead: InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null
        private var lastMatch: InternalRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey  = lKeyProj(l)
          val lTime = lTimeProj(l)
          var advancing = rHead != null
          while (advancing) {
            val c = keyOrd.compare(rKeyProj(rHead), lKey)
            // forward stop: first right STRICTLY AFTER the left row —
            // that row is itself the candidate match. Rows skipped here
            // (rt ≤ lt) can never match a later left row either, since
            // left times only grow within the key group.
            // backward stop: first right at/after the left row; the
            // match is the last same-key row seen before it.
            val stop =
              if (fwd) c > 0 || (c == 0 && timeOrd.compare(rTimeProj(rHead), lTime) > 0)
              else     c > 0 || (c == 0 && timeOrd.compare(rTimeProj(rHead), lTime) >= 0)
            if (stop) advancing = false
            else {
              if (!fwd && c == 0) lastMatch = rHead // latest right strictly before lTime
              rHead = if (rIter.hasNext) rIter.next().copy() else null
              if (rHead == null) advancing = false
            }
          }
          val matchRow =
            if (fwd) {
              if (rHead != null && keyOrd.compare(rKeyProj(rHead), lKey) == 0) rHead
              else nullRight
            } else {
              // lastMatch may be left over from an earlier key group
              if (lastMatch != null && keyOrd.compare(mKeyProj(lastMatch), lKey) == 0) lastMatch
              else nullRight
            }
          joined(l, matchRow)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec (children planned lazily). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Column-name-level API over the native node. */
object AsOfJoin {

  /** Backward as-of left join: `left` rows pick up the latest `right`
    * row with equal key and `rightTimeCol` strictly before
    * `leftTimeCol`. Right-side column names must not collide with the
    * left's (alias them first — also what gives the right side fresh
    * attribute ids for self-as-of joins). NULL keys compare equal under
    * the natural row ordering (same as a window-over-partition rewrite,
    * unlike SQL equi-join semantics) — filter them out first if that
    * matters. */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTimeCol: String, rightTimeCol: String): DataFrame =
    join(left, right, leftKey, rightKey, leftTimeCol, rightTimeCol, forward = false)

  /** Forward as-of left join: `left` rows pick up the EARLIEST `right`
    * row with equal key and `rightTimeCol` strictly after
    * `leftTimeCol`. Same column-collision and null-key caveats as
    * [[backward]]. */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTimeCol: String, rightTimeCol: String): DataFrame =
    join(left, right, leftKey, rightKey, leftTimeCol, rightTimeCol, forward = true)

  private def join(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTimeCol: String, rightTimeCol: String,
                   forward: Boolean): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "as-of sides must not share column names — alias the right side")
    GraftSqlShim.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp,
        Seq(attr(lp, leftKey)), Seq(attr(rp, rightKey)),
        attr(lp, leftTimeCol), attr(rp, rightTimeCol), forward))
  }
}
