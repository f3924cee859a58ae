package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q123 exact substring-span dedup: planted-repeat unit cases plus a
  * brute-force equivalence sweep over the real sf0.001 corpus. */
class SubstringSpansSpec extends AnyFunSuite {
  private val N = Scrub.SpanGramN

  private def spans(rows: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] = {
    val spark = SparkSpec.spark
    import spark.implicits._
    Scrub.substringSpansFrom(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  // distinct filler words (w0 w1 w2 ...) so nothing repeats by accident
  private def filler(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("a shared run at different offsets is found at its own offset in each doc") {
    val shared = filler("dup", 12) // 12 tokens => one maximal span of 12
    val a = (filler("a", 5) ++ shared ++ filler("b", 7)).mkString(" ")
    val b = (filler("c", 9) ++ shared ++ filler("d", 3)).mkString(" ")
    val got = spans(Seq(1L -> a, 2L -> b, 3L -> filler("e", 30).mkString(" ")))
    assert(got === Set(
      (1L, 5L, 16L, 12L),  // doc 1: tokens 5..16
      (2L, 9L, 20L, 12L))) // doc 2: tokens 9..20
  }

  test("a repeat WITHIN one doc is found twice; doc with no repeats yields nothing") {
    val run = filler("r", N) // exactly one gram long
    val text = (run ++ filler("x", 6) ++ run).mkString(" ")
    val got = spans(Seq(1L -> text))
    assert(got === Set((1L, 0L, N - 1L, N.toLong), (1L, N + 6L, 2L * N + 5L, N.toLong)))
  }

  test("overlapping duplicated grams merge into one maximal span") {
    // a 10-token shared run has 3 duplicated 8-grams with overlapping
    // coverage — they must merge to ONE [off, off+9] span, not three
    val shared = filler("m", 10)
    val a = (shared ++ filler("p", 20)).mkString(" ")
    val b = (filler("q", 20) ++ shared).mkString(" ")
    val got = spans(Seq(1L -> a, 2L -> b))
    assert(got === Set((1L, 0L, 9L, 10L), (2L, 20L, 29L, 10L)))
  }

  test("two runs separated by more than one gram length stay separate spans") {
    val r1 = filler("s", N)
    val r2 = filler("t", N)
    val gap = filler("g", N + 1) // starts differ by > N => no merge
    val a = (r1 ++ gap ++ r2).mkString(" ")
    val b = (r2 ++ filler("u", 3) ++ r1).mkString(" ")
    val got = spans(Seq(1L -> a, 2L -> b))
    assert(got((1L, 0L, N - 1L, N.toLong)) && got((1L, 2L * N + 1L, 3L * N, N.toLong)))
    assert(got.count(_._1 == 1L) == 2)
  }

  test("incremental spans flag batch-vs-corpus repeats only, at batch offsets") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import graft.dedup.DedupQueries.{IncBatchMod, IncBatchRem}
    val shared = filler("dup", 10)
    val batchOnly = filler("bo", N)
    // ids 4, 9 are batch (doc_id % 5 == 4); 1, 2 corpus
    assert(IncBatchMod == 5 && IncBatchRem == 4, "update planted ids if the split changes")
    val docs = Seq(
      1L -> (filler("c", 6) ++ shared).mkString(" "),               // corpus holds the run
      2L -> filler("d", 30).mkString(" "),                          // unrelated corpus
      4L -> (filler("a", 3) ++ shared ++ batchOnly).mkString(" "),  // batch: corpus run at 3..12
      9L -> (batchOnly ++ filler("e", 9)).mkString(" "))            // batch: repeat exists ONLY in batch
    val got = Scrub.incrementalSpansFrom(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // doc 4's shared run flagged at ITS offsets; the batch-internal
    // repeat (docs 4 and 9 both contain batchOnly) is NOT flagged, and
    // corpus docs never appear in the output
    assert(got === Set((4L, 3L, 12L, 10L)))
  }

  test("indexed incremental spans (q130) emit exactly q128's rows at 2 SFs") {
    val spark = SparkSpec.spark
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val inline = rows(Scrub.incrementalSpans(spark, dir))
      val indexed = rows(Scrub.incrementalSpansIndexedQuery(spark, dir))
      assert(indexed === inline, s"dir=$dir")
    }
  }

  test("q130 probe never shuffles the persisted span-gram index") {
    val spark = SparkSpec.spark
    val saved = Seq(
      "spark.sql.adaptive.enabled" -> spark.conf.get("spark.sql.adaptive.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Scrub.incrementalSpansIndexedQuery(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      def isIndexScan(p: SparkPlan) = p match {
        case sc: FileSourceScanExec =>
          sc.tableIdentifier.exists(_.table.startsWith("span_corpus_grams"))
        case _ => false
      }
      def paths(p: SparkPlan, acc: List[SparkPlan]): Seq[List[SparkPlan]] = {
        val here = p :: acc
        if (isIndexScan(p)) Seq(here) else p.children.flatMap(c => paths(c, here))
      }
      val scanPaths = paths(plan, Nil)
      assert(scanPaths.nonEmpty, "expected a scan of the bucketed span-gram index")
      scanPaths.foreach { path =>
        val belowJoin = path.takeWhile(!_.isInstanceOf[BaseJoinExec])
        val shuffles = belowJoin.filter(_.isInstanceOf[ShuffleExchangeExec])
        assert(shuffles.isEmpty,
          s"index side shuffled before the semi-join: ${shuffles.map(_.nodeName)}")
      }
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("matches brute-force coverage islands on the sf0.001 corpus") {
    val spark = SparkSpec.spark
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").filter(_.nonEmpty))
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for ((_, w) <- docs; i <- 0 to w.length - N)
      counts.updateWith(w.slice(i, i + N).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    val truth = (for ((id, w) <- docs.toSeq) yield {
      val covered = (for {
        i <- 0 to w.length - N if counts(w.slice(i, i + N).mkString(" ")) > 1
        p <- i until i + N
      } yield p).distinct.sorted
      // islands over covered positions
      val grouped = covered.foldLeft(List.empty[List[Int]]) {
        case (acc @ (h :: t), p) if h.head == p - 1 => (p :: h) :: t
        case (acc, p)                               => List(p) :: acc
      }
      grouped.map(g => (id, g.last.toLong, g.head.toLong, g.size.toLong))
    }).flatten.toSet
    val spark2 = SparkSpec.spark
    val got = Scrub.substringSpans(spark2, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === truth)
    assert(got.nonEmpty, "sf0.001 must contain real near-dup substring spans")
  }
}
