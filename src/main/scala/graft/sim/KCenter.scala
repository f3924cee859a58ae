package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** K-CENTER CORESET SELECTION (farthest-first traversal / Gonzalez
  * 1985): greedily pick the vector farthest (min max-cosine) from the
  * centers chosen so far. The classic 2-approximation to the k-center
  * cover, and the data-pruning move behind diversity-first coreset
  * selection: k exemplars that SPAN the embedding space, where
  * k-means (q110) centers collapse into dense regions and random
  * samples oversample them. Run it before labeling budget is spent
  * or a seed set is curated.
  *
  * Determinism: the seed is the MIN vec_id (no RNG — the snapshot
  * rule); every greedy argmin orders by (round-6 max-cos asc, vec_id
  * asc) — the q20 tie discipline, so both engines pick identical
  * centers. Assignment ties break toward the smaller center id.
  *
  * Scale shape: exactly k−1 greedy rounds, each ONE corpus scan
  * against the ≤k broadcast centers (O(k) jobs by construction — the
  * q110 posture) with a TakeOrdered(1) argmin, never a global sort;
  * the final assignment is one more scan with a k-way max. At 100 TB
  * k stays small and each scan is embarrassingly parallel; the
  * driver state is k ids + k vectors. */
object KCenter {

  val KCenters = 8

  /** q235 — the k centers in pick order with their cluster sizes
    * under nearest-center assignment. */
  def kCenterCoreset(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .localCheckpoint(true) // k+1 scans read the same frozen corpus
    val first = emb.agg(min("vec_id")).head().getLong(0)
    var centers = Vector(first)
    for (_ <- 2 to KCenters) {
      val cents = emb.filter(col("vec_id").isin(centers: _*))
        .select(col("vec_id").as("cid"), col("e").as("ce"))
      val next = emb.crossJoin(broadcast(cents))
        .groupBy("vec_id")
        .agg(max(round(SimilarityQueries.cosineExpr("e", "ce"), 6)).as("mc"))
        .orderBy(col("mc"), col("vec_id"))
        .limit(1).head().getLong(0)
      centers = centers :+ next
    }
    val rankDf = centers.zipWithIndex
      .map { case (id, i) => (i + 1, id) }.toDF("rank", "cid")
    val cents = emb.filter(col("vec_id").isin(centers: _*))
      .select(col("vec_id").as("cid"), col("e").as("ce"))
      .join(broadcast(rankDf), "cid")
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("mc", round(SimilarityQueries.cosineExpr("e", "ce"), 6))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("mc").desc, col("cid"))))
      .filter(col("rn") === 1)
      .groupBy("cid").agg(count(lit(1)).as("n_assigned"))
    rankDf.join(assigned, "cid")
      .select(col("rank"), col("cid").as("center_id"), col("n_assigned"))
  }

  /** The oracle replays the same greedy walk as chained MATERIALIZED
    * CTEs (the q234 lesson: DuckDB inlines single-use CTEs, and a
    * k-deep nested expansion chokes its planner). */
  val kCenterCoresetSql: String = {
    val steps = (2 to KCenters).map { i =>
      s"""d$i AS MATERIALIZED (SELECT e.vec_id,
         |  max(round(list_cosine_similarity(e.emb, c.emb), 6)) AS mc
         |  FROM e CROSS JOIN (SELECT e2.emb FROM cen${i - 1} cc
         |    JOIN e e2 ON e2.vec_id = cc.cid) c
         |  GROUP BY 1),
         |p$i AS MATERIALIZED (SELECT vec_id AS cid, $i AS rk FROM d$i
         |  ORDER BY mc, vec_id LIMIT 1),
         |cen$i AS MATERIALIZED (SELECT cid, rk FROM cen${i - 1}
         |  UNION ALL SELECT cid, rk FROM p$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
       |  CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |cen1 AS MATERIALIZED (SELECT min(vec_id) AS cid, 1 AS rk FROM e),
       |$steps,
       |cc AS MATERIALIZED (SELECT cen.cid, cen.rk, e.emb
       |  FROM cen$KCenters cen JOIN e ON e.vec_id = cen.cid),
       |asg AS (SELECT vec_id, cid FROM (
       |  SELECT e.vec_id, cc.cid, row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY round(list_cosine_similarity(e.emb, cc.emb), 6) DESC,
       |      cc.cid) AS rn
       |  FROM e CROSS JOIN cc) WHERE rn = 1)
       |SELECT CAST(cc.rk AS INT) AS rank, cc.cid AS center_id,
       |  CAST(count(*) AS BIGINT) AS n_assigned
       |FROM asg JOIN cc ON cc.cid = asg.cid
       |GROUP BY 1, 2""".stripMargin.replace("\n", " ")
  }
}
