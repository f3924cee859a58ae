package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) DATA LAYOUT planning — the write-side
  * clustering op behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave
  * the bits of two dimension keys so that rows close in BOTH
  * dimensions land in the same file, and every file's per-column
  * min/max footer stats become tight 2-D bounding boxes. A reader
  * with a rect predicate (user range × date range) then skips files
  * by stats alone — the linear (arrival-order) layout this replaces
  * gives every file a full-range min/max on at least one dimension,
  * so nothing prunes. LayoutSpec measures the difference on the same
  * rect query; the reference knows nothing of layout (pandas reads
  * one CSV), so this is pure scale-path extension.
  *
  * At 100 TB the op is a one-extra-column sort before the write
  * (`repartitionByRange(zval)` — one exchange the write was paying
  * anyway to size files), and the payoff compounds: every subsequent
  * scan with a 2-D predicate prunes, forever. No new shuffle shapes,
  * no state — the curve is pure per-row arithmetic, in whole-stage
  * codegen.
  */
object Layout {

  /** Bits per dimension; cells are 2^ZBits × 2^ZBits. */
  val ZBits = 5

  /** user_id quantization divisor: 0..149 → x cell 0..29 (< 2^ZBits). */
  val XDiv = 5

  /** Z-values per output file: 2^(2·ZBits) / 16 = 64 files, each a
    * 4×4 block of cells (a power-of-4 divisor keeps every file's
    * z-range an ALIGNED square — the property that makes the min/max
    * boxes tight). */
  val ZPerFile = 16

  /** Morton interleave as engine-portable integer arithmetic (no
    * shift operators — Spark spells integer division `div`, DuckDB
    * `//`, and both fold `(x div 2^i) % 2 · 2^j` into the same
    * codegen'd/vectorized form): bit i of x lands at even position
    * 2i, bit i of y at odd position 2i+1. */
  def mortonExpr(xe: String, ye: String, divOp: String): String =
    (0 until ZBits).map { i =>
      val p = 1L << i
      val px = 1L << (2 * i)
      val py = 1L << (2 * i + 1)
      s"(($xe $divOp $p) % 2) * $px + (($ye $divOp $p) % 2) * $py"
    }.mkString(" + ")

  /** q126 — the layout MANIFEST the z-order write would leave behind:
    * one row per target file with its row count and per-dimension
    * min/max (exactly the footer stats a reader prunes on). x is the
    * quantized user cell, y the 0-based January day; the spec drives
    * rect-query file-skipping against these boxes and against the
    * linear layout's. */
  def zorderLayout(s: SparkSession, d: String): DataFrame =
    zorderLayoutFrom(Tables.events(s, d))

  /** [[zorderLayout]] over an explicit events frame (needs user_id,
    * ts) — the unit LayoutSpec drives. */
  def zorderLayoutFrom(events: DataFrame): DataFrame =
    events
      .select(
        expr(s"CAST(user_id div $XDiv AS BIGINT)").as("x"),
        expr("CAST(day(ts) - 1 AS BIGINT)").as("y"))
      .withColumn("zval", expr(mortonExpr("x", "y", "div")))
      .select(col("x"), col("y"),
        expr(s"CAST(zval div $ZPerFile AS BIGINT)").as("file_id"))
      .groupBy("file_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))

  val zorderLayoutSql: String = {
    val z = mortonExpr("x", "y", "//")
    s"""WITH c AS (SELECT CAST(user_id // $XDiv AS BIGINT) AS x,
       |  CAST(date_part('day', ts) - 1 AS BIGINT) AS y FROM events),
       |z AS (SELECT x, y, $z AS zval FROM c)
       |SELECT CAST(zval // $ZPerFile AS BIGINT) AS file_id, count(*) AS n_events,
       |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
       |FROM z GROUP BY 1""".stripMargin.replace("\n", " ")
  }
}
