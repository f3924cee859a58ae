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

  /** M4+M5 on testdata: deterministic seeded autoencoder over the
    * embedding vectors; per-row reconstruction error via the broadcast
    * net. Not SQL-expressible — rows-only oracle; exact-value tests live
    * in MLPSpec. */
  def autoencoderScore(s: SparkSession, d: String): DataFrame = {
    val net = MLP.init(MLP.autoencoderDims(64), seed = 42L)
    val bc = s.sparkContext.broadcast(net)
    val errUdf = udf { (v: Seq[Double]) => bc.value.reconstructionError(v.toArray) }
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .select(col("vec_id"), round(errUdf(col("e")), 6).as("recon_err"))
  }
}
