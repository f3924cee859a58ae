package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** ML feature/scoring operators phrased over the driver corpus for the
  * oracle harness (M1-M5 of SURVEY §2.6).
  */
object MLQueries {

  /** M1-M3 on testdata: lexicographic one-hot of c_mktsegment (all-zero
    * for unknowns by construction) + ddof=0 z-score of c_acctbal, emitted
    * as flat columns so the DuckDB oracle can hash them. */
  def featureEncode(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val cats = c.select("c_mktsegment").distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    val r: Row = c.agg(avg("c_acctbal"), stddev_pop("c_acctbal")).head()
    val (m, sd) = (r.getDouble(0), r.getDouble(1))
    val ohCols = cats.map(cat =>
      when(col("c_mktsegment") === cat, 1).otherwise(0)
        .as(s"oh_${cat.toLowerCase}"))
    c.select(
      (col("c_custkey") +: ohCols :+
        round((col("c_acctbal") - lit(m)) / lit(sd), 4).as("bal_z")): _*)
  }

  /** DuckDB twin of [[featureEncode]] — categories are data-derived but
    * deterministic for the fixed corpus. */
  val featureEncodeSql: String = {
    val cats = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val oh = cats.map(c =>
      s"CASE WHEN c_mktsegment = '$c' THEN 1 ELSE 0 END AS oh_${c.toLowerCase}")
      .mkString(", ")
    s"SELECT c_custkey, $oh, round((c_acctbal - (SELECT avg(c_acctbal) FROM customer)) / (SELECT stddev_pop(c_acctbal) FROM customer), 4) AS bal_z FROM customer"
  }

  // ------------------------------------------------- fixed-net scoring

  /** Fixed-formula autoencoder 64→8→64 for the oracle-checked forward
    * pass: every weight is a small rational from a closed-form integer
    * formula, so the DuckDB twin can expand the identical net as literal
    * arithmetic. 1-based (layer output j, input k) indices. */
  def fixedW1(j: Int, k: Int): Double = ((17 * j + 31 * k) % 19 - 9) / 20.0
  def fixedB1(j: Int): Double = ((7 * j) % 11 - 5) / 10.0
  def fixedW2(i: Int, j: Int): Double = ((13 * i + 23 * j) % 17 - 8) / 20.0
  def fixedB2(i: Int): Double = ((5 * i) % 9 - 4) / 10.0
  val FixedDim = 64
  val FixedHidden = 8

  /** The fixed net as an [[MLP]] (hidden ReLU, linear output — same
    * activation scheme as the fraud autoencoder). */
  lazy val fixedNet: MLP = MLP(Array(
    Layer(
      Array.tabulate(FixedHidden, FixedDim)((j, k) => fixedW1(j + 1, k + 1)),
      Array.tabulate(FixedHidden)(j => fixedB1(j + 1)), relu = true),
    Layer(
      Array.tabulate(FixedDim, FixedHidden)((i, j) => fixedW2(i + 1, j + 1)),
      Array.tabulate(FixedDim)(i => fixedB2(i + 1)), relu = false)))

  /** M4+M5 on testdata: forward pass + per-row reconstruction MSE of the
    * fixed net over the embedding vectors, via the broadcast net. The
    * DuckDB oracle replays the identical arithmetic (same term order →
    * bit-identical doubles), so this query exactly verifies
    * [[MLP.forward]] / [[MLP.reconstructionError]]; training is covered
    * by the MLPSpec gradient tests. */
  def autoencoderScore(s: SparkSession, d: String): DataFrame = {
    val bc = s.sparkContext.broadcast(fixedNet)
    val errUdf = udf { (v: Seq[Double]) => bc.value.reconstructionError(v.toArray) }
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .select(col("vec_id"), round(errUdf(col("e")), 6).as("recon_err"))
  }

  /** DuckDB twin of [[autoencoderScore]]: the net unrolled to literal
    * arithmetic, summed in the same ascending-index order as the UDF's
    * loops (bias first), with explicit (a-b)*(a-b) squares — giving
    * bit-identical IEEE doubles before the final round(…, 6). */
  val autoencoderScoreSql: String = {
    def lit(x: Double): String = java.lang.Double.toString(x)
    val hid = (1 to FixedHidden).map { j =>
      val terms = (1 to FixedDim).map(k => s"e[$k] * ${lit(fixedW1(j, k))}")
      s"greatest(0.0, ${(lit(fixedB1(j)) +: terms).mkString(" + ")}) AS h$j"
    }.mkString(", ")
    val rec = (1 to FixedDim).map { i =>
      val terms = (1 to FixedHidden).map(j => s"h$j * ${lit(fixedW2(i, j))}")
      s"${(lit(fixedB2(i)) +: terms).mkString(" + ")} AS r$i"
    }.mkString(", ")
    val sq = (1 to FixedDim)
      .map(i => s"(e[$i] - r$i) * (e[$i] - r$i)").mkString(" + ")
    s"WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
      s"hid AS (SELECT vec_id, e, $hid FROM v), " +
      s"rec AS (SELECT vec_id, e, $rec FROM hid) " +
      s"SELECT vec_id, round(($sq) / $FixedDim.0, 6) AS recon_err FROM rec"
  }
}
