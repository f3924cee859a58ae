package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

import graft.ops.Tables

/** Similarity search over the embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the full table; one pass, no shuffle except the final per-query
  * top-k window on the tiny candidate output.
  *
  * Scale path: sign-random-projection LSH — per-row bucket id (no
  * shuffle), then candidate generation only within buckets. At 100 TB the
  * bucket table is bucketed/partitioned by `bucket` so probes touch one
  * partition.
  */
object SimilarityQueries {

  /** Cosine similarity between two double arrays as a single codegen'd
    * higher-order-function expression (no UDF in the hot path). */
  def cosineExpr(a: String, b: String): Column =
    expr(s"""aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
             / (sqrt(aggregate($a, 0D, (acc, v) -> acc + v * v))
                * sqrt(aggregate($b, 0D, (acc, v) -> acc + v * v)))""")

  /** Brute-force exact cosine top-k for a deterministic query subset
    * (vec_id % 100 = 0). Ranking ties broken on round(cos,6) then
    * neighbor id so results are engine-reproducible. */
  def cosineTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val w = Window.partitionBy("qid")
      .orderBy(round(col("cos"), 6).desc, col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineExpr("qe", "e"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  val cosineTopKSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
      "q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id % 100 = 0), " +
      "scored AS (SELECT q.qid, e.vec_id, list_cosine_similarity(q.qe, e.emb) AS cos FROM e CROSS JOIN q WHERE e.vec_id <> q.qid), " +
      "ranked AS (SELECT qid, vec_id, cos, row_number() OVER (PARTITION BY qid ORDER BY round(cos, 6) DESC, vec_id) AS rank FROM scored) " +
      "SELECT qid, vec_id AS neighbor_id, rank, round(cos, 4) AS cos FROM ranked WHERE rank <= 5"

  /** Deterministic random hyperplane component for (seed, plane, dim),
    * uniform in [-1, 1). */
  private def planeComponent(seed: Long, plane: Int, dim: Int): Double = {
    val h = Hashing.splitmix64(seed ^ (plane.toLong << 32) ^ dim.toLong)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Sign-random-projection LSH: `numPlanes`-bit bucket id per vector.
    * Hyperplanes are derived from the seed on the fly (nothing shipped). */
  def lshBucketUdf(numPlanes: Int, seed: Long) = udf { (v: Seq[Double]) =>
    var bucket = 0
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * planeComponent(seed, p, i); i += 1 }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** LSH-bucketed ANN: bucket every vector (8 planes → 256 buckets), then
    * exact cosine only for same-bucket pairs. Output is all candidate
    * pairs with their exact cosine — the verification stage of an ANN
    * dedup (`cos ≥ τ` is a trailing filter the caller picks). */
  def cosineLshPairs(s: SparkSession, d: String,
                     numPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val bucketed = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("bucket", lshBucketUdf(numPlanes, seed)(col("e")))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(cosineExpr("a.e", "b.e"), 4))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.bucket").as("bucket"), col("cos"))
  }

  /** Embedding-cosine near-dup pairs (the dedup flavor): LSH candidates
    * with cosine above the threshold. */
  def embeddingNearDup(s: SparkSession, d: String, minCos: Double = 0.3): DataFrame =
    cosineLshPairs(s, d).filter(col("cos") >= minCos).select("vec_a", "vec_b", "cos")
}
