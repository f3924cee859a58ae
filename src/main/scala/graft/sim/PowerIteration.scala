package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** q175 — TOP PRINCIPAL DIRECTION of the embedding corpus by power
  * iteration over the q169 Gram matrix, and every vector's projection
  * onto it: the APPLY step the Gram op preps for (the write→read-loop
  * discipline of q126→q146: a stats op earns its keep when a second
  * op consumes the stats). The projection is the first component of a
  * PCA/whitening transform — the score a pipeline uses to drop
  * dominant-direction boilerplate embeddings or to seed a split
  * hyperplane.
  *
  * ENTIRELY in integer fixed point — the FLOAT RULE taken to a place
  * floats usually own. With q = ⌊e·2¹⁰⌋ (exact in every IEEE engine,
  * see [[GramMatrix]]):
  *
  *  - M[i][j] = Σ q_i·q_j — the q169 second-moment matrix, BIGINT;
  *  - prescale D = max(1, max|M| div 2²⁰), Mn = M ÷ D (sign-safe
  *    truncating ÷ — both engines floor the |·| then restore sign, so
  *    DuckDB's floor-// and Spark's truncate-div cannot disagree on
  *    negatives);
  *  - v⁰ = all-2¹⁶; EIGHT fixed rounds of w = Mn·v,
  *    v' = sign(w)·(|w|·2¹⁶ ÷ max|w|) — renormalized to |v|≤2¹⁶ each
  *    round, so every intermediate is bounded: |w| ≤ 64·2²¹·2¹⁶ < 2⁴³
  *    and |w|·2¹⁶ < 2⁵⁹, no BIGINT overflow at ANY corpus size
  *    (corpus scale only enters through M, which the prescale caps);
  *  - proj(vec) = Σ q_i·v_i ≤ 64·538·2¹⁶ < 2³² per row.
  *
  * Fixed iteration count (not convergence-tested) keeps the op a pure
  * deterministic function of the data — the oracle replays all eight
  * rounds unrolled in SQL from its own Gram CTE, exact to the last
  * bit. Sign is pinned by the all-ones start.
  *
  * Scale shape: ONE corpus scan folds the Gram (17 KB buffers,
  * exchange independent of N — q169's argument), the 64×64 eigensolve
  * is a driver loop over a d²-bounded collect (the q07/q10 scalar
  * threshold discipline, NOT a data collect), and the projection is a
  * second scan with a broadcast-literal v — embarrassingly parallel,
  * no shuffle after the Gram merge. PowerIterationSpec pins
  * partitioning-invariance and the two-scan/no-join plan. */
object PowerIteration {

  val Dim: Int = GramMatrix.GramDim
  val VScale = 1L << 16
  val PreScaleShift = 20
  val Iters = 8

  /** Sign-safe truncating division — both engines floor |x|/k then
    * restore the sign, so negative operands cannot split semantics. */
  private def idiv(x: Long, k: Long): Long = {
    val q = math.abs(x) / k
    if (x < 0) -q else q
  }

  /** The eight-round fixed-point power iteration on a full d×d matrix
    * (driver-side; exact mirror of the unrolled oracle SQL). */
  private[sim] def iterate(m: Array[Array[Long]]): Array[Long] = {
    var mx = 1L
    var i = 0
    while (i < Dim) { var j = 0; while (j < Dim) {
      mx = math.max(mx, math.abs(m(i)(j))); j += 1 }; i += 1 }
    val d = math.max(1L, mx >> PreScaleShift)
    val mn = m.map(_.map(idiv(_, d)))
    var v = Array.fill(Dim)(VScale)
    for (_ <- 1 to Iters) {
      val w = new Array[Long](Dim)
      i = 0
      while (i < Dim) {
        var acc = 0L; var j = 0
        while (j < Dim) { acc += mn(i)(j) * v(j); j += 1 }
        w(i) = acc; i += 1
      }
      val mw = math.max(1L, w.map(math.abs).max)
      v = w.map(x => idiv(x * VScale, mw))
    }
    v
  }

  /** The corpus's M from the q169 aggregator — one scan, d²-bounded
    * driver collect of the upper triangle, symmetrized. */
  private def gram(s: SparkSession, d: String): Array[Array[Long]] = {
    val m = Array.ofDim[Long](Dim, Dim)
    GramMatrix.gramMatrix(s, d).select("di", "dj", "dot").collect().foreach { r =>
      val (i, j, x) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))
      m(i)(j) = x; m(j)(i) = x
    }
    m
  }

  /** q175 registered query: (vec_id, proj) — every vector's exact
    * integer projection onto the iterated direction. */
  def topPcProjection(s: SparkSession, d: String): DataFrame = {
    val v = iterate(gram(s, d))
    val vArr: Column = array(v.map(lit): _*)
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .select(col("vec_id"),
        aggregate(
          zip_with(col("e"), vArr, (e, w) =>
            floor(e * lit(GramMatrix.GramScale)).cast("long") * w),
          lit(0L), (acc, x) => acc + x).as("proj"))
  }

  /** The unrolled oracle: Gram in SQL (the honest N·d² join — oracle
    * scale only), then the identical eight integer rounds as CTEs. */
  val topPcProjectionSql: String = {
    val sc = GramMatrix.GramScale
    def sdiv(x: String, k: String) =
      s"CASE WHEN $x < 0 THEN -((-($x)) // $k) ELSE ($x) // $k END"
    val rounds = (1 to Iters).map { t =>
      val pv = if (t == 1) "v0" else s"v${t - 1}"
      s"""w$t AS (SELECT gn.i, CAST(sum(gn.mn * $pv.v) AS BIGINT) AS w
         |  FROM gn JOIN $pv ON gn.j = $pv.i GROUP BY 1),
         |m$t AS (SELECT greatest(CAST(max(abs(w)) AS BIGINT), 1) AS mw FROM w$t),
         |v$t AS (SELECT i, CAST(${sdiv(s"w * $VScale", "mw")} AS BIGINT) AS v
         |  FROM w$t, m$t)""".stripMargin
    }.mkString(", ")
    (s"""WITH dims AS (SELECT unnest(generate_series(1, $Dim)) AS i),
        |q AS (SELECT e.vec_id, d.i,
        |  CAST(floor(e.embedding[d.i] * $sc) AS BIGINT) AS qe
        |  FROM embeddings e CROSS JOIN dims d),
        |g AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.qe * b.qe) AS BIGINT) AS m
        |  FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |mx AS (SELECT greatest(CAST(max(abs(m)) // ${1L << PreScaleShift} AS BIGINT), 1) AS dpre FROM g),
        |gn AS (SELECT i, j, CAST(${sdiv("m", "dpre")} AS BIGINT) AS mn FROM g, mx),
        |v0 AS (SELECT i, CAST($VScale AS BIGINT) AS v FROM dims),
        |$rounds
        |SELECT q.vec_id, CAST(sum(q.qe * v$Iters.v) AS BIGINT) AS proj
        |FROM q JOIN v$Iters ON q.i = v$Iters.i GROUP BY 1""").stripMargin
      .replace("\n", " ")
  }
}
