package graft.sim

import scala.util.Random

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Product quantization: code validity, compression-vs-recall teeth on
  * planted near-dups, and the IVF-PQ probe-all ≡ flat-PQ invariant that
  * puts q80 on q79's oracle. */
class PqSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"

  test("codes are NumSubs small ints, identical vectors encode identically") {
    val spark = SparkSpec.spark
    val emb = graft.ops.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val codes = ProductQuantization.pqCodes(emb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.nonEmpty)
    assert(codes.values.forall(_.length == ProductQuantization.NumSubs))
    assert(codes.values.forall(_.forall(c =>
      c >= 0 && c < ProductQuantization.NumCents)))
    // a codebook vector's nearest centroid in EVERY subspace is itself
    val cent0Id = ProductQuantization.PqCentOffset.toLong
    assert(codes(cent0Id).forall(_ == 0),
      s"codebook vector $cent0Id must encode to its own centroid: ${codes(cent0Id)}")
  }

  test("ADC finds a planted near-copy at rank 1") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val rng = new Random(5)
    def vec(): Seq[Double] = Seq.fill(ProductQuantization.Dim)(rng.nextDouble() * 2 - 1)
    val base = (0L until 260L).map(i => (i, vec()))
    // vec 200 is a query (id % 100 == 0); 259 is its tiny-jitter copy
    val planted = base.map {
      case (259L, _) => (259L, base(200)._2.map(_ + 1e-4 * rng.nextDouble()))
      case other     => other
    }
    val emb = planted.toDF("vec_id", "e")
    val got = ProductQuantization.adcSearchAll(
      SimilarityQueries.ivfQueries(emb), emb, k = 5)
      .collect().map(r => ((r.getLong(0), r.getInt(2)), r.getLong(1))).toMap
    assert(got((200L, 1)) === 259L,
      "the near-copy must win ADC rank 1 — its codes equal the query's codes")
  }

  test("IVF-PQ probe-all equals flat PQ; nProbe=4 recall vs flat PQ is reported") {
    val spark = SparkSpec.spark
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val flat = rows(ProductQuantization.pqTopK(spark, sfDir))
    assert(flat.nonEmpty)
    val all = rows(ProductQuantization.ivfPqTopK(spark, sfDir))
    assert(all === flat, "probe-all IVF-PQ must equal the flat PQ scan")
    val probed = rows(ProductQuantization.ivfPqTopK(spark, sfDir,
      nProbe = SimilarityQueries.NProbe))
    val pairs = (s: Set[(Long, Long, Int)]) => s.map(t => (t._1, t._2))
    val recall = (pairs(flat) intersect pairs(probed)).size.toDouble / flat.size
    info(f"IVF-PQ recall vs flat PQ at nProbe=${SimilarityQueries.NProbe}: $recall%.2f")
    // this corpus has NO true near neighbors (max candidate cos ≈ 0.43,
    // PERF_NOTES), so flat-PQ's "top-5" are arbitrary mid-distance
    // vectors spread uniformly over the ~14 lists and probing 4 keeps
    // ≈ nProbe/nlist ≈ 0.29 of them — the floor documents that regime;
    // the planted test below is where probing must NOT lose neighbors.
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("q81: persisted-index IVF-PQ equals the inline computation at every nProbe") {
    val spark = SparkSpec.spark
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    for (nProbe <- Seq(SimilarityQueries.NProbe, Int.MaxValue)) {
      assert(rows(ProductQuantization.ivfPqTopKIndexed(spark, sfDir, nProbe = nProbe)) ===
        rows(ProductQuantization.ivfPqTopK(spark, sfDir, nProbe = nProbe)),
        s"persisted IVF-PQ diverged from inline at nProbe=$nProbe")
    }
  }

  test("q81 plan never shuffles or recomputes the persisted code table") {
    val spark = SparkSpec.spark
    val saved = Seq(
      "spark.sql.adaptive.enabled" -> spark.conf.get("spark.sql.adaptive.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = ProductQuantization.ivfPqTopKIndexed(spark, sfDir)
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      def isCodeScan(p: SparkPlan): Boolean = p match {
        case sc: FileSourceScanExec =>
          sc.tableIdentifier.exists(_.table.startsWith("ivf_codes"))
        case _ => false
      }
      def paths(p: SparkPlan, acc: List[SparkPlan]): Seq[List[SparkPlan]] = {
        val here = p :: acc
        if (isCodeScan(p)) Seq(here) else p.children.flatMap(c => paths(c, here))
      }
      val scanPaths = paths(plan, Nil)
      assert(scanPaths.nonEmpty, "q81 plan reads no persisted code table")
      for (path <- scanPaths) {
        val toJoin = path.takeWhile(!_.isInstanceOf[BaseJoinExec])
        val shuffles = toJoin.filter(_.isInstanceOf[ShuffleExchangeExec])
        assert(shuffles.isEmpty,
          s"exchange between PQ code scan and its join:\n${path.head}")
      }
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("a planted near-copy survives IVF-PQ probing at nProbe=1") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val rng = new Random(5)
    def vec(): Seq[Double] = Seq.fill(ProductQuantization.Dim)(rng.nextDouble() * 2 - 1)
    val base = (0L until 260L).map(i => (i, vec()))
    val planted = base.map {
      case (259L, _) => (259L, base(200)._2.map(_ + 1e-4 * rng.nextDouble()))
      case other     => other
    }
    val emb = planted.toDF("vec_id", "e")
    // a true near neighbor shares the query's coarse cell, so even the
    // cheapest probe (1 list of ~14) must surface it at ADC rank 1
    val got = ProductQuantization.ivfPqFrom(emb, k = 5, nProbe = 1)
      .collect().map(r => ((r.getLong(0), r.getInt(2)), r.getLong(1))).toMap
    assert(got((200L, 1)) === 259L,
      "the near-copy must be in the query's own probed list and win rank 1")
  }
}
