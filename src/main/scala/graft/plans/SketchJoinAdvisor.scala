package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, JoinHint, LogicalPlan, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Sketch-driven JOIN-STRATEGY advice (VERDICT r12 next-round #4): the
  * q133 lesson — per-table sketches can price a join without touching
  * data — graduated from a measurement query into ENGINE behavior. A
  * maintenance job `analyze`s tables it owns into [[SketchCatalog]]
  * (one scan each: exact row count + the q65 KMV distinct-key
  * estimate, the pair a cost model needs); [[SketchJoinRule]], wired
  * through [[graft.GraftExtensions]] like the as-of strategy, then
  * consults the catalog during optimization and hints BROADCAST for a
  * join side whose sketched row count fits the configured budget.
  *
  * The rule fires only where Spark's own information runs out, and
  * never un-breaks what Spark would do right:
  *  - only when the side's catalyst stats carry NO rowCount (file
  *    relations without ANALYZE — "stats absent", exactly the gap a
  *    sketch catalog exists to fill; if CBO stats are present they
  *    are better-scoped and the rule defers);
  *  - only when the join carries no user hint on either side;
  *  - only when `spark.graft.sketchJoin.broadcastRows` is set > 0
  *    (0 = off, the default — 142 registered queries keep their
  *    pinned plans unless a session opts in).
  *
  * At 100 TB the point is the NEGATIVE space of
  * autoBroadcastJoinThreshold: file size is a bad proxy for a wide
  * parquet table whose join side projects two columns (size-based
  * broadcast refuses; the sketch knows it is 10⁵ rows and hints it
  * in), and for an unpartitioned view over many small files the
  * listing-size estimate can under-read (size-based broadcast OOMs the
  * driver; the sketched row count refuses). Rows are what the hash
  * relation actually costs. SketchJoinSpec pins BOTH decision branches
  * on constructed tables. */
object SketchCatalog {

  /** What one `analyze` scan persists per table: exact cardinality and
    * the KMV distinct estimate of the declared join key. */
  final case class TableSketch(rows: Long, distinctKeys: Long)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, TableSketch]()

  /** Normalize "file:/x/y", "/x/y", and trailing-slash variants to one
    * key so registration and rule lookup agree. */
  private[plans] def norm(path: String): String = {
    val p = try {
      val u = new java.net.URI(path)
      if (u.getPath != null && u.getPath.nonEmpty) u.getPath else path
    } catch { case _: Exception => path }
    p.stripSuffix("/")
  }

  def register(path: String, sketch: TableSketch): Unit =
    entries.put(norm(path), sketch)

  def lookup(path: String): Option[TableSketch] =
    Option(entries.get(norm(path)))

  def clear(): Unit = entries.clear()

  /** Build a table's catalog entry with ONE scan: exact row count plus
    * the q65 bottom-k (KMV) distinct estimate of `keyCol` — the same
    * mergeable sketch, so at 100 TB the entry can equally be folded
    * from per-partition partials or maintained incrementally on
    * append. */
  def analyze(spark: SparkSession, path: String, keyCol: String): TableSketch = {
    import graft.ops.Sketches
    val df = spark.read.parquet(path)
    val kmv = udaf(new Sketches.MinKDistinct(Sketches.KmvK),
      org.apache.spark.sql.Encoders.scalaLong)
    val h63 = graft.functions.GraftFunctions
      .md5Lower64(col(keyCol).cast("string")).bitwiseAND(Long.MaxValue)
    val row = df.agg(count(lit(1)).as("n"), kmv(h63).as("ks")).head()
    val n = row.getLong(0)
    val ks = row.getSeq[Long](1)
    val distinct =
      if (ks.length < Sketches.KmvK) ks.length.toLong
      else math.round((Sketches.KmvK - 1).toDouble * math.pow(2, 63) / ks.max)
    val sk = TableSketch(n, distinct)
    register(path, sk)
    sk
  }
}

/** The optimizer rule: hint BROADCAST on a join side whose
  * sketch-cataloged row count fits `spark.graft.sketchJoin
  * .broadcastRows`, when Spark itself has no rowCount for that side
  * and the user left the join unhinted. */
case class SketchJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def confRows: Long =
    spark.conf.getOption("spark.graft.sketchJoin.broadcastRows")
      .map(_.toLong).getOrElse(0L)

  /** A side's sketched cardinality: every file-relation leaf must be
    * cataloged, else unknown (None) — a partial estimate could hint a
    * broadcast of an unbounded union. */
  private def sketchRows(p: LogicalPlan): Option[Long] = {
    val leaves = p.collectLeaves()
    val per = leaves.map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val roots = fs.location.rootPaths.map(_.toString)
          val hits = roots.flatMap(r => SketchCatalog.lookup(r).map(_.rows))
          if (hits.length == roots.length && roots.nonEmpty) Some(hits.sum) else None
        case _ => None
      }
      case _ => None
    }
    if (per.nonEmpty && per.forall(_.isDefined)) Some(per.flatMap(x => x).sum)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val limit = confRows
    if (limit <= 0L) plan
    else plan.transformUp {
      case j @ Join(left, right, _, _, JoinHint(None, None)) =>
        // defer to CBO stats when present; the sketch fills absence
        val leftKnown = left.stats.rowCount.isDefined
        val rightKnown = right.stats.rowCount.isDefined
        val rightFit = !rightKnown && sketchRows(right).exists(_ <= limit)
        val leftFit = !leftKnown && sketchRows(left).exists(_ <= limit)
        if (rightFit)
          j.copy(hint = JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
        else if (leftFit)
          j.copy(hint = JoinHint(Some(HintInfo(Some(BROADCAST))), None))
        else j
    }
  }
}
