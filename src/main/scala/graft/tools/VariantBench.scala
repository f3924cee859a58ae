package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Tables
import graft.sim.SimilarityQueries

/** Head-to-head timings of alternative formulations of the same
  * operator (the measurements PERF_NOTES.md cites). Each variant is
  * warmed once at a smaller SF, then timed to full materialization at
  * the target SF — same protocol as Bench.
  *
  * Usage: runMain graft.tools.VariantBench <variant...>
  * Variants: ivf_struct_max | ivf_window | <none = all>
  */
object VariantBench {

  /** The r4 IVF assignment experiment: nearest centroid via a
    * lexicographic struct-max AGGREGATE over the (vec × centroid) cross
    * product instead of the rank-1 window. Measured consistently ~40%
    * SLOWER than the window (sf0.1: ~1.2 vs ~0.8 s; 3×-inflated input:
    * ~4.7 vs ~2.8 s) — the ObjectHashAggregate struct buffers +
    * any_value array copies cost more than one codegen'd shuffle+sort.
    * Kept here, out of the registered query, for the A/B record. */
  def ivfStructMaxFrom(emb: DataFrame, k: Int = 5,
                       nProbe: Int = SimilarityQueries.NProbe): DataFrame = {
    import SimilarityQueries._
    val cents = emb.filter(col("vec_id") % CentStride === CentOffset)
      .select(col("vec_id").as("cent_id"), col("e").as("ce"))
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("ccos", cosineExpr("e", "ce"))
      .groupBy("vec_id")
      .agg(
        max(struct(round(col("ccos"), 6).as("c"), (-col("cent_id")).as("nc"))).as("m"),
        any_value(col("e")).as("e"))
      .select(col("vec_id"), (-col("m.nc")).as("cent_id"), col("e"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val wProbe = Window.partitionBy("qid")
      .orderBy(round(col("qcos"), 6).desc, col("cent_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("qcos", cosineExpr("qe", "ce"))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nProbe)
      .select(col("qid"), col("qe"), col("cent_id"))
    val wTop = Window.partitionBy("qid")
      .orderBy(round(col("cos"), 6).desc, col("vec_id"))
    probes.join(assigned, "cent_id")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineExpr("qe", "e"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** The sf0.1 embeddings table is only 2k vectors — overhead-scale for
    * an ANN A/B. Inflate by `times` with id-shifted copies (same dim,
    * same centroid stride semantics) so the cross-product shuffle the
    * two assignment variants differ on actually has volume. */
  def inflatedEmb(s: SparkSession, d: String, times: Int): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .select(explode(expr(s"sequence(0, ${times - 1})")).as("cp"),
        col("vec_id"), col("e"))
      .select((col("vec_id") + col("cp") * lit(1000000L)).as("vec_id"), col("e"))

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  /** The r9 q20-family experiment: per-anchor top-k via the unbounded
    * row_number WINDOW (what q20 shipped with through r8) vs the
    * bounded [[graft.ops.TopKAggregator.TopKByScore]] buffer the
    * registered query now uses. Same output, different state bound:
    * the window sorts |corpus| rows per anchor, the buffer holds ≤ k
    * per anchor per task. Timed at 1× and 3× volume for the record. */
  def topKWindowFrom(embd: DataFrame, k: Int = 5): DataFrame = {
    val queries = embd.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val w = Window.partitionBy("qid")
      .orderBy(round(col("cos"), 6).desc, col("vec_id"))
    embd.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", SimilarityQueries.cosineExpr("qe", "e"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** The bounded-aggregate formulation over an explicit frame (the
    * registered q20 body, parameterized for the inflated input). */
  def topKAggFrom(embd: DataFrame, k: Int = 5): DataFrame = {
    val queries = embd.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    embd.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", SimilarityQueries.cosineExpr("qe", "e"))
      .groupBy("qid")
      .agg(graft.ops.TopKAggregator.topKByScore(k)(
        round(col("cos"), 6), col("vec_id"), col("cos"), lit(0)).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("rk", "e")))
      .select(col("qid"), col("e._2").as("neighbor_id"),
        (col("rk") + 1).as("rank"), round(col("e._3"), 4).as("cos"))
  }

  /** Planted skew graph for the q121 orientation A/B: one hub of
    * degree `hubDeg` with the LOWEST id (the id-orientation's worst
    * case — every star edge points out of the hub, so the naive wedge
    * join enumerates C(hubDeg, 2) pairs), plus `nCliques` disjoint
    * 6-cliques so the triangle-bearing part of the work is identical
    * in both variants. */
  def hubGraph(s: SparkSession, hubDeg: Int, nCliques: Int): DataFrame = {
    import s.implicits._
    val star = (1 to hubDeg).map(i => (0L, i.toLong))
    val cliques = (0 until nCliques).flatMap { c =>
      val base = 1000000L + c * 6
      for (a <- 0 until 6; b <- (a + 1) until 6)
        yield (base + a, base + b)
    }
    (star ++ cliques).toDF("doc_a", "doc_b").repartition(32)
  }

  /** The naive id-oriented wedge join q121 deliberately avoids: edges
    * stay a<b, wedges enumerate at the lowest ID — a low-id hub
    * contributes C(deg, 2) wedge rows. Same output as
    * [[graft.dedup.DedupQueries.triangleCountsFromPairs]]. */
  def triIdOriented(pairs: DataFrame): DataFrame = {
    val w1 = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
    val w2 = pairs.select(col("doc_a").as("u"), col("doc_b").as("w"))
    val wedges = w1.join(w2, "u").filter(col("v") < col("w"))
    wedges
      .join(pairs.select(col("doc_a").as("v"), col("doc_b").as("w")),
        Seq("v", "w"))
      .select(explode(array(col("u"), col("v"), col("w"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
  }

  /** q117's register build with the per-token digest bound ONCE via
    * the transform-lambda (vs the plain hex-parse column, where
    * projection collapse inlines md5 into all 14 nibble references). */
  def hllDistinctBound(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Sketches._
    val regs = Tables.documents(s, d)
      .select(col("lang"),
        explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("w"))
      .select(col("lang"), graft.functions.Md5Cols.lower53Bound("w").as("h"))
      .select(col("lang"), (col("h") % HllM).as("reg"), shiftright(col("h"), HllP).as("v"))
      .select(col("lang"), col("reg"),
        when(col("v") === 0L, lit(HllW + 1))
          .otherwise(lit(HllW + 1) - length(bin(col("v")))).as("rank"))
      .groupBy("lang", "reg").agg(max("rank").as("mrank"))
    regs.groupBy("lang").agg(
      count(lit(1)).as("m_used"),
      sum("mrank").as("sum_rank"),
      (sum(expr(s"shiftright(${HllScale}L, cast(mrank AS INT))")) +
        (lit(HllM) - count(lit(1))) * HllScale).as("denom_x2p50"))
  }

  /** The historic Scala-UDF register build, kept for the measurement
    * record (PERF_NOTES r9/r10). */
  def hllDistinctUdf(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Sketches._
    val h53 = udf { (w: String) => graft.dedup.Hashing.md5Lower64(w) >>> 11 }
    val regs = Tables.documents(s, d)
      .select(col("lang"),
        explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("w"))
      .select(col("lang"), h53(col("w")).as("h"))
      .select(col("lang"), (col("h") % HllM).as("reg"), shiftright(col("h"), HllP).as("v"))
      .select(col("lang"), col("reg"),
        when(col("v") === 0L, lit(HllW + 1))
          .otherwise(lit(HllW + 1) - length(bin(col("v")))).as("rank"))
      .groupBy("lang", "reg").agg(max("rank").as("mrank"))
    regs.groupBy("lang").agg(
      count(lit(1)).as("m_used"),
      sum("mrank").as("sum_rank"),
      (sum(expr(s"shiftright(${HllScale}L, cast(mrank AS INT))")) +
        (lit(HllM) - count(lit(1))) * HllScale).as("denom_x2p50"))
  }

  /** Exact per-language distinct tokens — the shape q117's register
    * sketch replaces: the distinct shuffles every (lang, token) pair. */
  def exactDistinctTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"),
        explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("w"))
      .groupBy("lang").agg(countDistinct("w").as("n"))

  /** q123 A/B (sf0.1: window 1.09 s, checkpoint 1.42, rescan 1.98 —
    * the window shape is the registered one): the agg+join shape
    * consumes the gram frame twice (dup-count aggregate + join
    * probe), so Catalyst re-runs the tokenize+md5 lineage per
    * consumer (2 parquet scans); `span_checkpoint` materializes the
    * grams once but still pays TWO gh exchanges; the count-over-gh
    * window pays ONE scan and ONE gh exchange, no join. */
  private def spanGrams(s: SparkSession, d: String) =
    graft.text.Scrub.gramHashRows(Tables.documents(s, d),
      graft.text.Scrub.SpanGramN).select("doc_id", "tpos", "gh")

  def spanRescanFrom(grams: DataFrame): DataFrame = {
    val dup = grams.groupBy("gh").agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1).select("gh")
    graft.text.Scrub.spanIslands(grams.join(dup, "gh").select("doc_id", "tpos"))
  }

  // ---- r13 A/B: doc-grain signature pipelines, Scala UDF (the
  // ---- pre-r13 registered formulation, kept for the measurement
  // ---- record) vs the native codegen expressions that replaced them
  // ---- (graft.functions.ShingleBands).
  import graft.dedup.{DedupQueries, Hashing}

  private lazy val benchPerms =
    Hashing.permConstants(DedupQueries.MinHashPerms, DedupQueries.MinHashSeed)

  private def bandStrings(sig: Array[Long], bands: Int, rows: Int): Array[String] =
    Array.tabulate(bands) { b =>
      (0 until rows).map(r => sig(b * rows + r)).mkString(":")
    }

  private lazy val wordBandsUdf = udf { (text: String) =>
    val base = Hashing.wordShingles(text, DedupQueries.ShingleN)
      .map(Hashing.shingleBaseHash)
    bandStrings(Hashing.minHashSignature(base, benchPerms),
      DedupQueries.MinHashBands, DedupQueries.BandRows)
  }
  private lazy val charBandsUdf = udf { (text: String) =>
    val base = Hashing.charShingles(text, DedupQueries.CharGramN)
      .map(Hashing.shingleBaseHash)
    bandStrings(Hashing.minHashSignature(base, benchPerms),
      DedupQueries.CharBands, DedupQueries.CharBandRows)
  }
  private lazy val simBlocksUdf = udf { (text: String) =>
    Hashing.simHashBlocks(Hashing.simHash64(Hashing.tokens(text)))
  }

  private def docText(s: SparkSession, d: String) =
    Tables.documents(s, d).select(col("doc_id"), col("text"))

  def wordBandsNative(s: SparkSession, d: String): DataFrame =
    docText(s, d).select(col("doc_id"), posexplode(
      graft.functions.GraftFunctions.minHashBandVals(col("text"),
        DedupQueries.ShingleN, DedupQueries.MinHashBands,
        DedupQueries.BandRows, DedupQueries.MinHashSeed, charGrain = false))
      .as(Seq("band", "band_val")))

  def charBandsNative(s: SparkSession, d: String): DataFrame =
    docText(s, d).select(col("doc_id"), posexplode(
      graft.functions.GraftFunctions.minHashBandVals(col("text"),
        DedupQueries.CharGramN, DedupQueries.CharBands,
        DedupQueries.CharBandRows, DedupQueries.MinHashSeed, charGrain = true))
      .as(Seq("band", "band_val")))

  /** Workload-constant ANN scaling probes (r13). The registered ANN
    * queries define BOTH the query set (vec_id % 100) and the codebook
    * (vec_id % CentStride) as corpus FRACTIONS, so their benchmark cost
    * has an N²/constant term and the sf1 run showed 25–81× for 10×
    * data — by definition, not plan pathology. These variants hold the
    * workload constant the way a production deployment does: the SAME
    * 20 query vectors at every SF (vec_id % 100 = 0 AND vec_id < 2000)
    * and a codebook that is either FIXED (54 lists — sf0.1's size) or
    * the √N posture the IVF docs prescribe. Under const-nlist every
    * stage is linear in N (assign N·nlist, probe |Q|·nlist, search
    * |Q|·nProbe·N/nlist) → expect ≈10× for 10× data; under √N the
    * build grows N^1.5 while per-query search grows only √N — the
    * standard IVF build/query tradeoff, measured. */
  def annWorkloadConst(s: SparkSession, d: String, sqrtNlist: Boolean): DataFrame = {
    import SimilarityQueries._
    val e = emb(s, d)
    val n = e.count()
    val nlist = if (sqrtNlist) math.max(1L, math.round(math.sqrt(n.toDouble))) else 54L
    val stride = math.max(1L, (n + nlist - 1) / nlist)
    val cents = e.filter(col("vec_id") % stride === lit(CentOffset.toLong))
      .select(col("vec_id").as("cent_id"), col("e").as("ce"))
    val queries = e.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    ivfSearch(queries, ivfAssign(e, cents), cents, k = 5, nProbe = NProbe)
  }

  /** Brute-force q20 shape with the constant 20-query workload: cost is
    * |Q|·N exactly — the linear-scaling control for the ANN probes. */
  def bruteWorkloadConst(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val queries = e.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", SimilarityQueries.cosineExpr("qe", "e"))
      .groupBy("qid")
      .agg(graft.ops.TopKAggregator.topKByScore(5)(
        round(col("cos"), 6), col("vec_id"), col("cos"), lit(0)).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("rk", "e")))
  }

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bands_udf"         -> ((s, d) => docText(s, d).select(col("doc_id"),
      posexplode(wordBandsUdf(col("text"))).as(Seq("band", "band_val")))),
    "bands_native"      -> (wordBandsNative _),
    "charbands_udf"     -> ((s, d) => docText(s, d).select(col("doc_id"),
      posexplode(charBandsUdf(col("text"))).as(Seq("band", "band_val")))),
    "charbands_native"  -> (charBandsNative _),
    "simhash_udf"       -> ((s, d) => docText(s, d)
      .select(col("doc_id"), simBlocksUdf(col("text")).as("blk"))
      .select(col("doc_id"), col("blk")(0).as("b0"), col("blk")(1).as("b1"),
        col("blk")(2).as("b2"), col("blk")(3).as("b3"))),
    "simhash_native"    -> ((s, d) => graft.dedup.DedupQueries.simHash(s, d)),
    "span_rescan"       -> ((s, d) => spanRescanFrom(spanGrams(s, d))),
    "span_checkpoint"   -> ((s, d) => spanRescanFrom(spanGrams(s, d).localCheckpoint(true))),
    "span_window"       -> ((s, d) => graft.text.Scrub.substringSpans(s, d)),
    "ivf_window"        -> ((s, d) => SimilarityQueries.ivfTopK(s, d)),
    "ivf_struct_max"    -> ((s, d) => ivfStructMaxFrom(emb(s, d))),
    "ivf_window_3x"     -> ((s, d) => SimilarityQueries.ivfTopKFrom(inflatedEmb(s, d, 3))),
    "ivf_struct_max_3x" -> ((s, d) => ivfStructMaxFrom(inflatedEmb(s, d, 3))),
    "topk_window"       -> ((s, d) => topKWindowFrom(emb(s, d))),
    "topk_agg"          -> ((s, d) => topKAggFrom(emb(s, d))),
    "topk_window_3x"    -> ((s, d) => topKWindowFrom(inflatedEmb(s, d, 3))),
    "topk_agg_3x"       -> ((s, d) => topKAggFrom(inflatedEmb(s, d, 3))),
    "tri_id_hub"        -> ((s, _) => triIdOriented(hubGraph(s, 5000, 200))),
    "tri_degree_hub"    -> ((s, _) =>
      graft.dedup.DedupQueries.triangleCountsFromPairs(hubGraph(s, 5000, 200))),
    "hll_registers"     -> ((s, d) => graft.ops.Sketches.hllDistinct(s, d)),
    "hll_reg_bind"      -> ((s, d) => hllDistinctBound(s, d)),
    "hll_reg_udf"       -> ((s, d) => hllDistinctUdf(s, d)),
    "exact_distinct"    -> ((s, d) => exactDistinctTokens(s, d)),
    "ann_qconst_ivf54"  -> ((s, d) => annWorkloadConst(s, d, sqrtNlist = false)),
    "ann_qconst_sqrtn"  -> ((s, d) => annWorkloadConst(s, d, sqrtNlist = true)),
    "ann_qconst_brute"  -> (bruteWorkloadConst _),
    // r14: workload-constant probes for the r13 additions — q149 SQ8
    // and q143 MMR define |Q| ∝ N like the rest of the ANN family, so
    // their registered-bench ratios (31×/26× for 10× data at sf1)
    // carry an N²/100 definition term. Same fixed-20-query contract as
    // ann_qconst_*: expect ≈ linear (train/encode/scan all ∝ N; the
    // MMR re-rank is k·m sims per query, constant).
    "sq8_qconst"        -> ((s, d) => {
      import graft.sim.ScalarQuantization._
      val e = emb(s, d)
      val bounds = sqBounds(e)
      sqTopKFrom(e.filter(col("vec_id") < 2000), sqEncode(e, bounds), bounds)
    }),
    "mmr_qconst"        -> ((s, d) =>
      SimilarityQueries.mmrRerank(s, d, queryCap = 2000L)),
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.01")
    val spark = graft.Sessions.local()
    val sel = if (args.isEmpty) variants.keys.toSeq.sorted else args.toSeq
    def materialize(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(bit_xor(col("h"))).head()
      spark.catalog.clearCache()
    }
    sel.foreach { name =>
      val fn = variants(name)
      materialize(fn(spark, warmDir)) // warm JIT/codegen off the clock
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        materialize(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[variant] $name%-16s ${times.map(t => f"$t%.2f").mkString(" ")} s (3 runs, $sfDir)")
    }
    spark.stop()
  }
}
