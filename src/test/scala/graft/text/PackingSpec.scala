package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q167 global pack spans and q168 overlapping RAG chunks.
  *
  * The q167 property that matters: the two-phase prefix sum
  * (range-partition → per-partition totals → broadcast offsets →
  * pid-local window) must equal the naive GLOBAL single-partition
  * window formulation row-for-row — the rewrite is pure execution
  * strategy, the semantics are the textbook concat-and-chunk. */
class PackingSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("q167 two-phase pack equals the naive global-window formulation (sf0.001)") {
    val spark = SparkSpec.spark
    val c = CorpusOps.PackChunkTokens
    val nTok = size(expr(
      "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")).cast("long")
    val naive = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), nTok.as("n_tok"))
      .where(col("n_tok") > 0)
      .withColumn("gend", sum("n_tok").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("gstart", col("gend") - col("n_tok"))
      .withColumn("chunk_id",
        explode(sequence(expr(s"gstart div $c"), expr(s"(gend - 1) div $c"))))
      .select(col("chunk_id"), col("doc_id"),
        (greatest(col("gstart"), col("chunk_id") * c) - col("chunk_id") * c)
          .as("off_in_chunk"),
        (least(col("gend"), (col("chunk_id") + 1) * c) -
          greatest(col("gstart"), col("chunk_id") * c)).as("span_len"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = CorpusOps.packChunkSpans(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("q167 chunks are exactly full except the last; spans tile each chunk") {
    val spark = SparkSpec.spark
    val c = CorpusOps.PackChunkTokens
    val rows = CorpusOps.packChunkSpans(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byChunk = rows.groupBy(_._1)
    val lastChunk = byChunk.keys.max
    byChunk.foreach { case (k, ss) =>
      val tot = ss.map(_._4).sum
      if (k < lastChunk) assert(tot === c, s"chunk $k holds $tot tokens")
      else assert(tot > 0 && tot <= c)
      // spans tile the chunk contiguously from offset 0, no overlap, no gap
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 === 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 === b._3, s"gap in chunk $k")
        case _           => ()
      }
    }
    // every doc's spans across chunks sum to its token count
    val nTok = size(expr(
      "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")).cast("long")
    val toks = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), nTok.as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (doc, ss) =>
      assert(ss.map(_._4).sum === toks(doc), s"doc $doc spans != n_tok")
    }
  }

  test("q167 plan has no global-order window (every Window is pid-partitioned)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = CorpusOps.packChunkSpans(spark, sfDir).queryExecution.executedPlan
    val windows = plan.collect { case w: WindowExec => w }
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned (single-task) window in q167 plan: $w")
    }
  }

  test("q168 chunk layout: count formula, stride starts, window overlap, full cover") {
    val spark = SparkSpec.spark
    val (w, st) = (CorpusOps.RagWindow, CorpusOps.RagStride)
    val rows = CorpusOps.ragChunkSpans(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val nTok = size(expr(
      "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")).cast("long")
    val toks = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), nTok.as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (doc, ss) =>
      val n = toks(doc)
      val expectChunks = if (n <= w) 1L else 1L + (n - w + st - 1) / st
      assert(ss.length.toLong === expectChunks, s"doc $doc chunk count")
      ss.sortBy(_._2).zipWithIndex.foreach { case ((_, idx, start, len), i) =>
        assert(idx === i.toLong)
        assert(start === idx * st)
        assert(len === math.min(w, n - start))
        assert(len > 0)
      }
      // last chunk reaches the doc end ⟹ the windows cover [0, n)
      val last = ss.maxBy(_._2)
      assert(last._3 + last._4 === n, s"doc $doc not covered to the end")
    }
  }

  test("q170 two-phase rank equals the naive global window; no single-task window") {
    val spark = SparkSpec.spark
    val naive = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("rnk", row_number().over(
        Window.orderBy("n_chars", "doc_id")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = CorpusOps.globalRank(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === naive)
    import org.apache.spark.sql.execution.window.WindowExec
    val windows = CorpusOps.globalRank(spark, sfDir)
      .queryExecution.executedPlan.collect { case w: WindowExec => w }
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned (single-task) window in q170 plan: $w"))
    // percentile endpoints: min rank → 0, max rank → 10000
    val pct = CorpusOps.globalRank(spark, sfDir)
      .select("rnk", "pct_x10k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pct(1L) === 0L)
    assert(pct(pct.keys.max) === 10000L)
  }

  test("q171 PPS sample: equals naive global window; hits telescope to total div T") {
    val spark = SparkSpec.spark
    val t = CorpusOps.PpsStride
    val nTok = size(expr(
      "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")).cast("long")
    val base = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), nTok.as("n_tok")).where(col("n_tok") > 0)
    val naive = base
      .withColumn("gend", sum("n_tok").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("doc_id"), col("n_tok"),
        (expr(s"gend div $t") - expr(s"(gend - n_tok) div $t")).as("hits"))
      .where(col("hits") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = CorpusOps.ppsSample(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === naive)
    // the per-doc hit counts telescope: Σ hits == ⌊total tokens / T⌋ exactly
    val total = base.agg(sum("n_tok")).head().getLong(0)
    assert(got.toSeq.map(_._3).sum === total / t)
  }

  test("q181 nfdPack equals the driver-side next-fit-decreasing replay (sf0.01)") {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.01"
    val base = graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(0) % CorpusOps.NfdGroups,
        r.getString(1).trim.split("\\s+").length.toLong))
    val truth = base.groupBy(_._2).flatMap { case (g, docs) =>
      var bin = 0L; var fill = 0L; var first = true
      docs.toSeq.sortBy(x => (-x._3, x._1)).map { case (id, _, n) =>
        if (first) { first = false; fill = n }
        else if (fill + n <= CorpusOps.NfdCapacity) fill += n
        else { bin += 1; fill = n }
        (id, g, n, bin)
      }
    }.toSet
    val got = CorpusOps.nfdPack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === truth)
    // no bin exceeds capacity unless it holds a single oversize doc
    got.groupBy(x => (x._2, x._4)).foreach { case (_, docs) =>
      val mass = docs.toSeq.map(_._3).sum
      assert(mass <= CorpusOps.NfdCapacity || docs.size == 1, docs.toString)
    }
  }

  test("q181 plan: ONE exchange (group repartition), fold rides its sort") {
    val spark = SparkSpec.spark
    // string-count, not collect: the exchange sits inside the
    // AdaptiveSparkPlan wrapper that collect() doesn't traverse
    val plan = CorpusOps.nfdPack(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n == 1, s"expected exactly one exchange:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("q168 plan is shuffle-free (pure map + explode)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = CorpusOps.ragChunkSpans(spark, sfDir).queryExecution.executedPlan
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"unexpected shuffle in q168 plan: $shuffles")
  }
}
