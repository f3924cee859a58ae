package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q258/q259/q260 invariants: the banding planner's constants and
  * argmax against a driver replay; RFM quintile structure; the
  * compaction scheduler's greedy-prefix and budget contracts. */
class SchedulerSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("bandingPlanner: scores replay from the q19 histogram, chosen = argmax") {
    val spark = SparkSpec.spark
    // replicate the op's own sampled histogram (q138 posture)
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    val sampled = Tables.documents(spark, dir).select("doc_id", "text")
      .filter(graft.functions.GraftFunctions.md5Lower64(
          concat_ws("|", lit("plan:"), col("doc_id")))
        .bitwiseAND(Long.MaxValue) %
          graft.dedup.DedupQueries.plannerSampleMod(
            Tables.documents(spark, dir).count()) === 0L)
    val hist = graft.dedup.DedupQueries.minHashJaccardPairsFromBands(
        graft.dedup.DedupQueries.minHashBandsOf(sampled), sampled)
      .collect()
      .map(r => math.round(r.getAs[Double]("jaccard") * 10000) / 500)
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val tauBin = graft.dedup.DedupQueries.PlannerTauX10k / 500
    val rows = graft.dedup.DedupQueries.bandingPlanner(spark, dir).collect()
      .map(r => (r.getAs[Int]("b"), r.getAs[Int]("r"),
        r.getAs[Long]("keep_recall_ppm"), r.getAs[Long]("shed_catch_ppm"),
        r.getAs[Long]("score"), r.getAs[Long]("chosen")))
    assert(rows.length === graft.dedup.DedupQueries.PlannerConfigs.length)
    rows.foreach { case (b, r, keep, shed, score, _) =>
      def pPpm(bin: Long): Long = {
        val s = if (bin >= 20) 1.0 else (bin * 500 + 250).toDouble / 10000.0
        val p = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
        BigDecimal(p * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      def avg(pred: Long => Boolean): Long = {
        val sel = hist.filter { case (bin, _) => pred(bin) }
        val mass = sel.map { case (bin, w) => w * pPpm(bin) }.sum
        mass / math.max(sel.values.sum, 1L)
      }
      assert(keep === avg(_ >= tauBin), s"keep for ($b,$r)")
      assert(shed === avg(_ < tauBin), s"shed for ($b,$r)")
      assert(score === keep - shed)
    }
    val best = rows.sortBy(t => (-t._5, t._1)).head
    assert(rows.forall(t => (t._6 == 1L) == (t == best)), "chosen = argmax")
    // more rows per band (higher r) must tighten the low-J catch rate
    val shedByR = rows.sortBy(_._2).map(_._4)
    assert(shedByR.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "shed rate monotone non-increasing in r")
  }

  test("rfmSegments: quintiles are balanced, segment composes digits, cents exact") {
    val spark = SparkSpec.spark
    val rows = RelationalQueries.rfmSegments(spark, dir).collect()
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(rows.length.toLong === users)
    Seq("r_q", "f_q", "m_q").foreach { c =>
      val counts = rows.groupBy(_.getAs[Long](c)).view.mapValues(_.size)
      assert(counts.keySet === Set(1L, 2L, 3L, 4L, 5L))
      // ntile balance: sizes differ by at most 1
      assert(counts.values.max - counts.values.min <= 1, s"$c balance")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("segment") ===
        r.getAs[Long]("r_q") * 100 + r.getAs[Long]("f_q") * 10 +
          r.getAs[Long]("m_q"))
    }
  }

  test("compactionScheduler: ROI-ordered greedy prefix within budget") {
    val spark = SparkSpec.spark
    val rows = Layout.compactionScheduler(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bin_id"),
        r.getAs[Long]("n_files"), r.getAs[Long]("bytes"),
        r.getAs[Long]("roi_x1e9"), r.getAs[Long]("cum_bytes"),
        r.getAs[Long]("selected")))
      .sortBy(t => (-t._5, t._1, t._2))
    val total = rows.map(_._4).sum
    // cum_bytes is the running sum in ROI order
    var run = 0L
    rows.foreach { case (lang, bin, nf, bytes, roi, cum, sel) =>
      run += bytes
      assert(cum === run, s"cum at ($lang,$bin)")
      assert(roi === (nf - 1) * 1000000000L / bytes)
      assert(sel === (if (cum * 10000 <= total * Layout.CompactBudgetX10k) 1L
                      else 0L))
    }
    // selection is a PREFIX of the ROI order and spends within budget
    val selFlags = rows.map(_._7)
    assert(!selFlags.dropWhile(_ == 1L).contains(1L), "selected is a prefix")
    val spent = rows.filter(_._7 == 1L).map(_._4).sum
    assert(spent * 10000 <= total * Layout.CompactBudgetX10k)
    assert(spent > 0, "budget admits at least one bin on this corpus")
  }
}
