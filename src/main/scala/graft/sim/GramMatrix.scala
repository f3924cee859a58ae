package graft.sim

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** q169 — exact integer Gram/covariance statistics of the embedding
  * corpus: for every dimension pair i ≤ j, `n`, `Σqᵢ`, `Σqⱼ` and
  * `Σqᵢ·qⱼ` over all vectors, where `q = ⌊e · 1024⌋` per component.
  * This is the PCA/whitening prep of an embedding pipeline (covariance
  * = (n·dot − sumᵢ·sumⱼ)/n² recovers exactly from these integers) and
  * the second-moment audit behind semantic-dedup drift checks.
  *
  * FLOAT RULE, taken one step further than the ×10⁴ outputs elsewhere:
  * the quantizer multiplies by 2¹⁰ — a POWER OF TWO, so `e · 1024` is
  * exact in any IEEE width (it only shifts the exponent; float32,
  * float64 and DuckDB's promotion all agree bit-for-bit) and `floor`
  * of it is the same integer everywhere. From there every number in
  * the op is a BIGINT: sums of |q| ≤ 538 over any corpus Spark can
  * hold stay far inside 2⁶³, and the cross-engine compare is exact —
  * no float ever leaves the scan.
  *
  * Scale shape: the naive formulation — explode to (vec, dim) rows and
  * self-join on vec_id for dimension pairs — shuffles N·d(d+1)/2 rows
  * (the ORACLE does exactly that; at 100 TB it's a non-starter). This
  * Aggregator instead folds each partition into ONE flat
  * `Array[Long]` buffer of d(d+1)/2 + d + 1 slots (d = 64 → ~17 KB):
  * Spark's partial aggregation runs it map-side, the exchange moves
  * one buffer per task — #partitions × 17 KB, independent of N — and
  * the single final merge is elementwise adds. The one-group funnel
  * is a non-issue because the reduce input is tiny by construction
  * (same argument as the q65/q66 sketch merges). */
object GramMatrix {

  val GramDim = 64
  val GramScale = 1024L

  /** (di, dj, n, sum_i, sum_j, dot) for one dimension pair. */
  type GramRow = (Int, Int, Long, Long, Long, Long)

  private val triSize = GramDim * (GramDim + 1) / 2

  final class Gram extends Aggregator[Seq[Float], Array[Long], Seq[GramRow]] {
    // layout: [0] = n, [1..d] = component sums, [1+d ..] = upper-tri dots
    override def zero: Array[Long] = new Array[Long](1 + GramDim + triSize)

    override def reduce(b: Array[Long], e: Seq[Float]): Array[Long] = {
      val q = new Array[Long](GramDim)
      var i = 0
      while (i < GramDim) {
        q(i) = math.floor(e(i).toDouble * GramScale).toLong
        b(1 + i) += q(i)
        i += 1
      }
      b(0) += 1
      var t = 1 + GramDim
      i = 0
      while (i < GramDim) {
        var j = i
        while (j < GramDim) {
          b(t) += q(i) * q(j)
          t += 1; j += 1
        }
        i += 1
      }
      b
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def finish(b: Array[Long]): Seq[GramRow] = {
      val out = Seq.newBuilder[GramRow]
      var t = 1 + GramDim
      var i = 0
      while (i < GramDim) {
        var j = i
        while (j < GramDim) {
          out += ((i, j, b(0), b(1 + i), b(1 + j), b(t)))
          t += 1; j += 1
        }
        i += 1
      }
      out.result()
    }

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[GramRow]] = ExpressionEncoder()
  }

  def gramAgg = udaf(new Gram, ExpressionEncoder[Seq[Float]]())

  def gramMatrix(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .agg(gramAgg(col("embedding")).as("g"))
      .select(explode(col("g")).as("e"))
      .select(col("e._1").cast("long").as("di"), col("e._2").cast("long").as("dj"),
        col("e._3").as("n"), col("e._4").as("sum_i"),
        col("e._5").as("sum_j"), col("e._6").as("dot"))

  /** Honest oracle: the explode + self-join formulation this
    * Aggregator exists to avoid — constant `dims` series (no lateral),
    * N·d(d+1)/2 joined rows at oracle scale only. */
  val gramMatrixSql: String =
    s"""WITH dims AS (SELECT unnest(generate_series(1, $GramDim)) AS i),
       |q AS (SELECT e.vec_id, d.i,
       |  CAST(floor(e.embedding[d.i] * $GramScale) AS BIGINT) AS qe
       |  FROM embeddings e CROSS JOIN dims d)
       |SELECT CAST(a.i - 1 AS BIGINT) AS di, CAST(b.i - 1 AS BIGINT) AS dj,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(a.qe) AS BIGINT) AS sum_i, CAST(sum(b.qe) AS BIGINT) AS sum_j,
       |  CAST(sum(a.qe * b.qe) AS BIGINT) AS dot
       |FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
       |GROUP BY 1, 2""".stripMargin.replace("\n", " ")
}
