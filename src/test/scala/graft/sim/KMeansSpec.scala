package graft.sim

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Properties of the Lloyd's k-means refinement behind q110. */
class KMeansSpec extends AnyFunSuite {

  private def meanOwnCos(emb: org.apache.spark.sql.DataFrame,
                         cents: org.apache.spark.sql.DataFrame): Double = {
    val assigned = SimilarityQueries.ivfAssign(emb, cents)
    assigned.join(cents, "cent_id")
      .select(SimilarityQueries.cosineExpr("e", "ce").as("c"))
      .agg(avg("c")).head().getDouble(0)
  }

  test("q110 partition sanity: every vector exactly once, sizes consistent, centroids ⊆ seeds") {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.001"
    val rows = KMeans.kmeansAssign(spark, dir).collect()
    val n = graft.ops.Tables.embeddings(spark, dir).count()
    assert(rows.length === n, "every vector must be assigned exactly once")
    assert(rows.map(_.getLong(0)).distinct.length === n)
    // cluster_size is consistent with the actual partition
    val bySize = rows.groupBy(r => r.getLong(1))
    bySize.foreach { case (cid, members) =>
      assert(members.forall(_.getLong(2) == members.length),
        s"cluster $cid: stored size disagrees with member count")
    }
    // centroid ids are seed ids (Lloyd relabels positions, not ids)
    val seedIds = graft.ops.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % SimilarityQueries.CentStride === SimilarityQueries.CentOffset)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(1)).toSet.subsetOf(seedIds))
  }

  test("q110 persist-and-probe: stored codebook reproduces the fresh-train assignment exactly") {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.001"
    // the registered query reads the durable centroid table; training
    // inline from the same snapshot must yield the identical partition
    // (round-9 components survive the parquet round-trip bit-exactly)
    val probe = KMeans.kmeansAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fresh = KMeans.kmeansAssignFrom(
      graft.ops.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe === fresh)
    // and the registered plan holds NO Lloyd loop: the only parquet
    // scans are the corpus + the stored centroids — the per-iteration
    // posexplode update aggregate must be absent
    val p = KMeans.kmeansAssign(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("posexplode"), p)
  }

  test("Lloyd iterations do not degrade mean cosine to the own centroid") {
    val spark = SparkSpec.spark
    val emb = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val seed = meanOwnCos(emb, SimilarityQueries.ivfCentroids(emb))
    val trained = meanOwnCos(emb, KMeans.codebookFrom(emb))
    info(f"mean own-centroid cosine: seed $seed%.4f -> trained $trained%.4f")
    // plain-mean update + cosine assignment is not the textbook L2
    // objective, so demand no degradation rather than strict ascent
    assert(trained >= seed - 1e-9,
      s"refined codebook degraded the assignment: $seed -> $trained")
  }

  test("q113: trained-codebook IVF at production nProbe — recall vs stride seed reported") {
    val spark = SparkSpec.spark
    val sfDir = "/root/testdata/sf0.01"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact   = pairs(SimilarityQueries.cosineTopK(spark, sfDir))
    val np      = SimilarityQueries.NProbe
    val stride  = pairs(SimilarityQueries.ivfTopK(spark, sfDir, nProbe = np))
    val trained = pairs(KMeans.ivfTopKTrained(spark, sfDir, nProbe = np))
    val rs = (exact intersect stride).size.toDouble / exact.size
    val rt = (exact intersect trained).size.toDouble / exact.size
    // Honest measurement, not a victory lap: on THIS corpus (random
    // gaussian-ish embeddings, no cluster structure) Lloyd rounds pull
    // centroids toward the global mean and recall at fixed nProbe is
    // measured WORSE than the data-point stride seed (0.48 vs 0.64) —
    // training a codebook on structureless data buys nothing, which is
    // itself the right thing to know. On clustered data (= every real
    // encoder's space; the planted-blob test below) the trained
    // centroids align with the clusters. The floor only guards against
    // collapse.
    info(f"recall@5 at nProbe=$np: stride $rs%.2f vs trained $rt%.2f")
    assert(rt >= 0.4, s"trained-codebook recall collapsed: $rt")
    // probe-all over the trained lists is exhaustive — must equal exact
    assert(pairs(KMeans.ivfTopKTrained(spark, sfDir)) === exact,
      "probe-all over the trained codebook must equal brute force")
  }

  test("planted blobs: k-means gathers each blob into one cluster") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val rng = new Random(31)
    val dim = SimilarityQueries.Dim
    // 3 well-separated unit centers; 37 members each with small jitter.
    // ids 0..110 make the stride seed (id % 37 == 1) pick EXACTLY one
    // member per blob (1, 38, 75) — k-means never merges centroids, so
    // one-seed-per-blob is the recoverable configuration; with two
    // seeds inside one blob Lloyd correctly keeps the blob split
    // (verified: that is what the first cut of this test planted).
    val centers = Array.fill(3)(Array.fill(dim)(rng.nextGaussian()))
    val rows = for (b <- 0 until 3; j <- 0 until 37) yield {
      val v = centers(b).map(x => x + 0.05 * rng.nextGaussian())
      ((b * 37 + j).toLong, v.toSeq, b)
    }
    val emb = rows.toDF("vec_id", "e", "blob")
    val out = KMeans.kmeansAssignFrom(emb.select("vec_id", "e"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val blobOf = rows.map { case (id, _, b) => id -> b }.toMap
    // every blob maps to exactly one cluster, and distinct blobs to
    // distinct clusters (separation >> jitter)
    val clustersPerBlob = out.groupBy { case (id, _) => blobOf(id) }
      .map { case (b, m) => b -> m.values.toSet }
    clustersPerBlob.foreach { case (b, cs) =>
      assert(cs.size === 1, s"blob $b split across clusters $cs")
    }
    assert(clustersPerBlob.values.flatten.toSet.size === 3,
      s"blobs collapsed onto shared centroids: $clustersPerBlob")
  }
}
