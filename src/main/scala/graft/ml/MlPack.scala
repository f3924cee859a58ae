package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

/** The graft.ml registration unit: each entry pairs a
  * registered query with its DuckDB oracle AT THE DECLARATION
  * SITE, so the two can never drift apart (VERDICT r16 item 8;
  * SparkEntry is the union of packs, OracleSqlSpec pins it). */
object MlPack extends QueryPack {
  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    // §2.6: feature encoding + autoencoder
    ("q10_feature_encode",
      (graft.ml.MLQueries.featureEncode _),
      graft.ml.MLQueries.featureEncodeSql),
    ("q11_autoencoder_score",
      (graft.ml.MLQueries.autoencoderScore _),
      graft.ml.MLQueries.autoencoderScoreSql),
    // round-15: exact Gini decision-stump search over labeled embeddings
    ("q209_gini_stump",
      (graft.ml.Stump.giniStump _),
      graft.ml.Stump.giniStumpSql),
  )
}
