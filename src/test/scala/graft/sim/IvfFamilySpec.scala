package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sim.SimilarityQueries.cosineExpr

/** Round-20 row-identity pins for the IVF family's shape rewrites:
  *
  *  - [[SimilarityQueries.ivfAssign]] now derives the argmax from
  *    [[SimilarityQueries.ivfAssignSlim]] and re-attaches the payload
  *    (+extras) with a vec_id join instead of sorting the N·nlist
  *    cross product WITH the payload through a rank-1 window. Same
  *    round-6-then-lowest-id contract (the slim encode's algebra);
  *    pinned here against the pre-r20 window form.
  *
  *  - [[SimilarityQueries.ivfSearch]] (a) runs the probe-selection
  *    window on slim (qid, cent_id, qcos) rows and re-attaches `qe`
  *    by a broadcast qid join, and (b) at nProbe = Int.MaxValue skips
  *    probe selection + the cent_id routing join outright (they are
  *    the identity when every assigned cent_id ∈ cents — true for
  *    every caller, which all assign against the cents they search).
  *    Both branches pinned against the pre-r20 form.
  */
class IvfFamilySpec extends AnyFunSuite {

  private def spark: SparkSession = SparkSpec.spark

  /** ivfAssign exactly as shipped r4–r19 (rank-1 window over the
    * payload-carrying cross product). */
  private def ivfAssignOld(emb: DataFrame, cents: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(round(col("ccos"), 6).desc, col("cent_id"))
    val extras = emb.columns.filterNot(Set("vec_id", "e"))
    emb.crossJoin(broadcast(cents))
      .withColumn("ccos", cosineExpr("e", "ce"))
      .withColumn("arank", row_number().over(wAssign))
      .filter(col("arank") === 1)
      .select((Seq("cent_id", "vec_id") ++ extras :+ "e").map(col): _*)
  }

  /** ivfSearch exactly as shipped r4–r19 (payload-carrying probe
    * window, unconditional probe join). */
  private def ivfSearchOld(queries: DataFrame, assigned: DataFrame,
                           cents: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val wProbe = Window.partitionBy("qid")
      .orderBy(round(col("qcos"), 6).desc, col("cent_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("qcos", cosineExpr("qe", "ce"))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nProbe)
      .select(col("qid"), col("qe"), col("cent_id"))
    probes.join(assigned, "cent_id")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineExpr("qe", "e"))
      .groupBy("qid")
      .agg(graft.ops.TopKAggregator.topKByScore(k)(
        round(col("cos"), 6), col("vec_id"), col("cos"), lit(0)).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("rk", "e")))
      .select(col("qid"), col("e._2").as("neighbor_id"),
        (col("rk") + 1).as("rank"), round(col("e._3"), 4).as("cos"))
  }

  private def emb(d: String): DataFrame =
    spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), expr("CAST(embedding AS ARRAY<DOUBLE>)").as("e"))

  private val dir = "/root/testdata/sf0.01"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("ivfAssign: slim-argmax + payload join is row-identical to the rank-1 window form") {
    val e = emb(dir)
    val cents = SimilarityQueries.ivfCentroids(e)
    val now = SimilarityQueries.ivfAssign(e, cents)
    val old = ivfAssignOld(e, cents)
    assert(now.columns.toSeq === old.columns.toSeq)
    assert(canon(now) === canon(old))
  }

  test("ivfAssign: extras columns (filtered-ANN label) ride along identically") {
    val e = emb(dir).withColumn("label", pmod(col("vec_id"), lit(3)))
      .select("vec_id", "label", "e")
    val cents = SimilarityQueries.ivfCentroids(emb(dir))
    val now = SimilarityQueries.ivfAssign(e, cents)
    val old = ivfAssignOld(e, cents)
    assert(now.columns.toSeq === old.columns.toSeq)
    assert(canon(now) === canon(old))
  }

  test("ivfSearch: slim probe window (finite nProbe) is row-identical to the payload-carrying form") {
    val e = emb(dir)
    val cents = SimilarityQueries.ivfCentroids(e)
    val assigned = SimilarityQueries.ivfAssign(e, cents)
    val q = SimilarityQueries.ivfQueries(e)
    val now = SimilarityQueries.ivfSearch(q, assigned, cents, 5, SimilarityQueries.NProbe)
    val old = ivfSearchOld(q, assigned, cents, 5, SimilarityQueries.NProbe)
    assert(canon(now) === canon(old))
  }

  test("ivfSearch: probe-all fast path is row-identical to probing every list") {
    val e = emb(dir)
    val cents = SimilarityQueries.ivfCentroids(e)
    val assigned = SimilarityQueries.ivfAssign(e, cents)
    val q = SimilarityQueries.ivfQueries(e)
    val now = SimilarityQueries.ivfSearch(q, assigned, cents, 5, Int.MaxValue)
    val old = ivfSearchOld(q, assigned, cents, 5, Int.MaxValue)
    assert(canon(now) === canon(old))
  }

  test("q109 restricted probe: slim probe window is row-identical to the payload-carrying form") {
    val e = emb(dir)
    // the pre-r20 q109 probe shape, restricted to NProbe, over the
    // SAME persisted index tables the shipped implementation reads
    val (centTbl, listTbl) = SimilarityQueries.ivfIndex(spark, dir)
    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("qe"))
    val cents = spark.table(centTbl)
    val wProbe = Window.partitionBy("qid")
      .orderBy(round(col("qcos"), 6).desc, col("cent_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("qcos", cosineExpr("qe", "ce"))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= SimilarityQueries.NProbe)
      .select(col("qid"), col("qlabel"), col("qe"), col("cent_id"))
    val old = probes.join(spark.table(listTbl), "cent_id")
      .filter(col("label") =!= col("qlabel"))
      .withColumn("cos", cosineExpr("qe", "e"))
      .groupBy("qid", "qlabel")
      .agg(graft.ops.TopKAggregator.topKByScore(5)(
        round(col("cos"), 6), col("vec_id"), col("cos"), col("label")).as("top"))
      .select(col("qid"), col("qlabel"), posexplode(col("top")).as(Seq("rk", "e")))
      .select(col("qid"), col("qlabel"), col("e._2").as("neg_id"),
        col("e._4").as("neg_label"), (col("rk") + 1).as("rank"),
        round(col("e._3"), 4).as("cos"))
    val now = SimilarityQueries
      .hardNegativesIvf(spark, dir, nProbe = SimilarityQueries.NProbe)
    assert(canon(now) === canon(old))
  }

  test("ivfSearch: probe-all plan has no window and no probe exchange") {
    val e = emb(dir)
    val cents = SimilarityQueries.ivfCentroids(e)
    val assigned = SimilarityQueries.ivfAssign(e, cents)
    val plan = SimilarityQueries
      .ivfSearch(SimilarityQueries.ivfQueries(e), assigned, cents, 5, Int.MaxValue)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "probe-all must not plan a probe-selection window")
  }
}
