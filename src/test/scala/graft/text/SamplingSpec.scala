package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded top-K sampling aggregates (q60/q73) must emit exactly
  * what the row_number-window formulation emits — the aggregate is a
  * pure execution-strategy swap — while keeping every per-lang sort
  * out of single tasks (no WindowExec anywhere in the plan). */
class SamplingSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private def windowWeightedSample(docs: DataFrame, k: Int): DataFrame = {
    val hashUdf = udf { (text: String) =>
      graft.dedup.Hashing.md5Lower64(text) >>> 11
    }
    val w = Window.partitionBy("lang").orderBy(col("skey"), col("doc_id"))
    docs
      .withColumn("skey", hashUdf(col("text")).cast("double") / col("n_chars"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("skey"), col("rnk"))
  }

  test("q60 bounded aggregate equals the window formulation (sf0.001)") {
    val spark = SparkSpec.spark
    val expect = windowWeightedSample(
      graft.ops.Tables.documents(spark, sfDir), CorpusOps.SampleK)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    val got = CorpusOps.weightedSample(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    assert(got === expect)
  }

  test("q60/q73 plans contain no window operator") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.execution.window.WindowExec
    Seq(CorpusOps.weightedSample(spark, sfDir),
        CorpusOps.mixtureSample(spark, sfDir)).foreach { df =>
      val windows = df.queryExecution.executedPlan.collect { case w: WindowExec => w }
      assert(windows.isEmpty, s"window sort in plan: $windows")
    }
  }

  test("q60 aggregate survives planted skew (one lang = 90% of docs)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // 9000 docs in 'en', ~1000 spread over 4 other langs
    val docs = (1L to 10000L).map { i =>
      val lang = if (i % 10 != 0) "en" else Seq("de", "es", "fr", "zh")((i / 10 % 4).toInt)
      (i, s"synthetic text $i ${"x" * (i % 97).toInt}", lang, "t", 10L + i % 131)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val k = CorpusOps.SampleK
    val expect = windowWeightedSample(docs, k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(4))).toSet
    val hashUdf = udf { (text: String) =>
      graft.dedup.Hashing.md5Lower64(text) >>> 11
    }
    val got = docs
      .withColumn("skey", hashUdf(col("text")).cast("double") / col("n_chars"))
      .groupBy("lang")
      .agg(graft.ops.TopKAggregator.minKBy(k)(
        col("skey"), col("doc_id"), col("n_chars")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("e._2").as("doc_id"), col("lang"), (col("pos") + 1).cast("int").as("rnk"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got === expect)
  }

  test("q77 threshold filter admits exactly each language's quota (sf0.001)") {
    val spark = SparkSpec.spark
    val docs = graft.ops.Tables.documents(spark, sfDir)
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = CorpusOps.MixTargets.filter { case (l, _, _) => nl.contains(l) }
    val t = present.map { case (l, num, den) => nl(l) * den / num }.min
    val quota = present.map { case (l, num, den) => (l, t * num / den) }
      .filter(_._2 >= 1L).toMap
    val gotCounts = CorpusOps.quotaSampleThreshold(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCounts === quota,
      s"per-language admitted counts must equal the quotas: got $gotCounts want $quota")
  }

  test("q77 equals the rank-window formulation row-for-row (sf0.001)") {
    val spark = SparkSpec.spark
    val docs = graft.ops.Tables.documents(spark, sfDir)
    val hashUdf = udf { (sid: String) => graft.dedup.Hashing.md5Lower64(sid) >>> 11 }
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = CorpusOps.MixTargets.filter { case (l, _, _) => nl.contains(l) }
    val t = present.map { case (l, num, den) => nl(l) * den / num }.min
    val quota = present.map { case (l, num, den) => (l, t * num / den) }
      .filter(_._2 >= 1L)
    val kCase = quota.foldLeft(lit(0L)) { case (acc, (l, k)) =>
      when(col("lang") === l, lit(k)).otherwise(acc)
    }
    val w = Window.partitionBy("lang").orderBy(col("skey"), col("doc_id"))
    val expect = docs
      .withColumn("skey", hashUdf(col("doc_id").cast("string")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kCase)
      .select(col("doc_id"), col("lang"), col("skey"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = CorpusOps.quotaSampleThreshold(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expect)
  }

  test("q89 temperature quotas: exact isqrt weights, per-lang counts match (sf0.001)") {
    val spark = SparkSpec.spark
    val docs = graft.ops.Tables.documents(spark, sfDir)
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // recompute the integer quota math independently
    def isqrt(n: Long): Long = {
      var x = math.sqrt(n.toDouble).toLong
      while (x > 0 && x * x > n) x -= 1
      while ((x + 1) * (x + 1) <= n) x += 1
      x
    }
    val w = nl.map { case (l, n) => l -> isqrt(n) }
    val sw = w.values.sum
    val budget = nl.values.sum / CorpusOps.TempBudgetFrac
    val quota = nl.map { case (l, n) => l -> math.min(n, budget * w(l) / sw) }
      .filter(_._2 >= 1L)
    val gotCounts = CorpusOps.temperatureMixture(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCounts === quota,
      s"per-language admitted counts must equal the α=1/2 quotas: got $gotCounts want $quota")
    // temperature property: kept FRACTION is non-increasing in corpus
    // share. The isqrt staircase (w jumps by 1 at square boundaries) can
    // invert the fraction for NEAR-EQUAL sizes (n=80 → w=8 vs n=82 → w=9),
    // so the clean property only binds for well-separated sizes: nHi ≥
    // 2·nLo keeps the ±1 weight discretization from flipping the ratio.
    val fracs = quota.toSeq.map { case (l, k) => (nl(l), k.toDouble / nl(l)) }
      .sortBy(_._1)
    for {
      (nLo, fLo) <- fracs
      (nHi, fHi) <- fracs
      if nHi >= 2 * nLo && nLo >= 16
    } assert(fLo >= fHi - 1e-9,
      s"much-smaller language must keep a >= fraction: n=$nLo f=$fLo vs n=$nHi f=$fHi")
  }

  test("q106 upsampling: per-lang totals hit the capped target, epochs bounded") {
    val spark = SparkSpec.spark
    val docs = graft.ops.Tables.documents(spark, sfDir)
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val share = nl.values.sum / nl.size
    val rows = CorpusOps.upsampledMixture(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byLang = rows.groupBy(_._2)
    nl.foreach { case (l, n) =>
      val target = math.min(CorpusOps.MaxUpsampleEpochs * n, share)
      val got = byLang.get(l).map(_.length.toLong).getOrElse(0L)
      assert(got === target, s"lang=$l emitted $got rows, target $target")
      val maxEpoch = byLang.get(l).map(_.map(_._3).max).getOrElse(0)
      val base = target / n
      assert(maxEpoch === (base + (if (target % n > 0) 1 else 0)).toInt,
        s"lang=$l max epoch $maxEpoch vs base $base extra ${target % n}")
    }
    // no document repeats beyond the UniMax cap
    rows.groupBy(r => (r._1, r._2)).values.foreach { copies =>
      assert(copies.length <= CorpusOps.MaxUpsampleEpochs,
        s"doc repeated ${copies.length}x > cap")
      // repeats are dense epochs 1..k, not arbitrary indices
      assert(copies.map(_._3).sorted === (1 to copies.length),
        s"epochs not dense: ${copies.map(_._3).sorted.mkString(",")}")
    }
  }

  test("q73 bounded aggregate equals the window formulation (sf0.001)") {
    val spark = SparkSpec.spark
    val docs = graft.ops.Tables.documents(spark, sfDir)
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = CorpusOps.MixTargets.filter { case (l, _, _) => nl.contains(l) }
    val t = present.map { case (l, num, den) => nl(l) * den / num }.min
    val quota = present.map { case (l, num, den) => (l, t * num / den) }
    val kCase = quota.foldLeft(lit(0L)) { case (acc, (l, k)) =>
      when(col("lang") === l, lit(k)).otherwise(acc)
    }
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val expect = docs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kCase)
      .select(col("doc_id"), col("lang"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val got = CorpusOps.mixtureSample(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got === expect)
  }

  test("q119 importance scores equal a driver-side replica exactly (sf0.001)") {
    val spark = SparkSpec.spark
    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bigrams(t: String): Seq[String] = {
      val toks = "[a-z0-9]+".r.findAllIn(t).toSeq
      toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucket(g: String): Long =
      (graft.dedup.Hashing.md5Lower64(g) >>> 11) % CorpusOps.ImpBuckets
    val all = docs.flatMap { case (id, lang, t) =>
      bigrams(t).map(g => (id, lang, bucket(g)))
    }
    val cr = all.groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
    val ct = all.filter(_._2 == CorpusOps.ImpTargetLang)
      .groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
    val expect = docs.map { case (id, lang, t) =>
      val bs = bigrams(t).map(bucket)
      val score = bs.map { b =>
        ((ct.getOrElse(b, 0L) + 1) * CorpusOps.ImpScale) / (cr(b) + 1)
      }.sum
      id -> ((lang, bs.length.toLong, score))
    }.toMap
    val got = CorpusOps.importanceScore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expect)
    // the scorer's purpose: target-domain docs rank above the rest on
    // the per-bigram mean (sum/n normalizes away length)
    val mean = (p: ((String, Long, Long)) => Boolean) => {
      val xs = got.values.filter(v => p(v) && v._2 > 0)
      xs.map(v => v._3.toDouble / v._2).sum / xs.size
    }
    val en = mean(v => v._1 == CorpusOps.ImpTargetLang)
    val rest = mean(v => v._1 != CorpusOps.ImpTargetLang)
    assert(en > rest,
      s"target-domain mean $en must exceed off-domain mean $rest")
  }

  test("q120 selection equals the rank-window formulation, with no window in the plan") {
    val spark = SparkSpec.spark
    val w = Window.partitionBy("lang")
      .orderBy(col("score_x2p20").desc, col("doc_id"))
    val expect = CorpusOps.importanceScore(spark, sfDir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= CorpusOps.DsirSelectK)
      .select(col("lang"), col("rnk"), col("doc_id"), col("score_x2p20"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val got = CorpusOps.dsirSelect(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
    val plan = CorpusOps.dsirSelect(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}
